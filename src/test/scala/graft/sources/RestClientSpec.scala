package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-replay reliability tests — zero egress, scripted transport,
  * injected sleeper so backoff is assertable and instant.
  */
class RestClientSpec extends AnyFunSuite {

  /** Transport returning a scripted sequence of responses/throws. */
  private final class ScriptedTransport(script: Seq[() => RestResponse]) extends Transport {
    var calls = 0
    override def get(url: String, params: Map[String, String]): RestResponse = {
      val r = script(math.min(calls, script.size - 1))
      calls += 1
      r()
    }
  }

  private def client(script: Seq[() => RestResponse],
                     policy: RetryPolicy = RetryPolicy()): (RestClient, ScriptedTransport, ArrayBuffer[Long]) = {
    val t = new ScriptedTransport(script)
    val sleeps = ArrayBuffer.empty[Long]
    (new RestClient(t, policy, sleeps += _), t, sleeps)
  }

  test("success passes body through") {
    val (c, t, _) = client(Seq(() => RestResponse(200, """[{"a":1}]""")))
    assert(c.fetch("http://x/e") == Right("""[{"a":1}]"""))
    assert(t.calls == 1)
  }

  test("retries 500s with exponential backoff then succeeds") {
    val (c, t, sleeps) = client(Seq(
      () => RestResponse(500, ""),
      () => RestResponse(502, ""),
      () => RestResponse(200, "ok")))
    assert(c.fetch("http://x/e") == Right("ok"))
    assert(t.calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // backoff_factor=1 → 1s, 2s
  }

  test("gives up after maxRetries retryable failures") {
    val (c, t, _) = client(Seq(() => RestResponse(503, "")))
    val r = c.fetch("http://x/e")
    assert(r == Left(FetchError.HttpError(503, "http://x/e: HTTP 503")))
    assert(t.calls == 4) // initial + 3 retries
  }

  test("429 pauses the rate-limit interval and retries, bounded") {
    val (c, t, sleeps) = client(
      Seq(() => RestResponse(429, "")),
      RetryPolicy(rateLimitPauseMillis = 60000L, maxRateLimitRetries = 2))
    val r = c.fetch("http://x/e")
    assert(r == Left(FetchError.RateLimited("http://x/e: gave up after 2 pauses")))
    assert(t.calls == 3)
    assert(sleeps.count(_ == 60000L) == 2) // unlike the reference, bounded
  }

  test("429 then success recovers") {
    val (c, _, sleeps) = client(Seq(
      () => RestResponse(429, ""),
      () => RestResponse(200, "ok")))
    assert(c.fetch("http://x/e") == Right("ok"))
    assert(sleeps.toSeq == Seq(60000L))
  }

  test("404 is a typed error, not a retry") {
    val (c, t, _) = client(Seq(() => RestResponse(404, "")))
    assert(c.fetch("http://x/e") == Left(FetchError.HttpError(404, "http://x/e: not found")))
    assert(t.calls == 1)
  }

  test("empty body degrades to typed error") {
    val (c, _, _) = client(Seq(() => RestResponse(200, "  ")))
    assert(c.fetch("http://x/e") == Left(FetchError.EmptyBody("http://x/e")))
  }

  test("transport exceptions retry then degrade") {
    val (c, t, _) = client(Seq(() => throw new RuntimeException("conn reset")))
    val r = c.fetch("http://x/e")
    assert(r == Left(FetchError.TransportError("http://x/e: conn reset")))
    assert(t.calls == 4)
  }

  test("token bucket enforces min interval between calls") {
    val t = new ScriptedTransport(Seq(() => RestResponse(200, "ok")))
    val sleeps = ArrayBuffer.empty[Long]
    val c = new RestClient(t, RetryPolicy(minIntervalMillis = 50L), sleeps += _)
    c.fetch("http://x/1")
    c.fetch("http://x/2") // immediately after — must throttle
    assert(sleeps.exists(s => s > 0 && s <= 50L))
  }
}
