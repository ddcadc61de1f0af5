package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** URL canonicalization rules, one assertion per rule, plus the
  * dedup/domain aggregates over hand-built crawl variants.
  */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(url: String): String = {
    import org.apache.spark.sql.functions.col
    Seq((1L, url)).toDF("doc_id", "url")
      .select(UrlOps.normalizeUrl(col("url"))).head.getString(0)
  }

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTPS://ExAmple.COM/CaseSensitive/Path") ==
      "https://example.com/CaseSensitive/Path")
  }

  test("default ports stripped per scheme; non-default kept") {
    assert(norm("https://example.com:443/a") == "https://example.com/a")
    assert(norm("http://example.com:80/a") == "http://example.com/a")
    assert(norm("http://example.com:8080/a") == "http://example.com:8080/a")
    // 443 is NOT http's default — kept
    assert(norm("http://example.com:443/a") == "http://example.com:443/a")
  }

  test("www prefix, fragment, trailing slashes stripped") {
    assert(norm("https://www.example.com/a/b//#section-2") ==
      "https://example.com/a/b")
    assert(norm("https://www.example.com/") == "https://example.com")
  }

  test("tracking params dropped, real params kept in original order") {
    assert(norm("https://example.com/a?utm_source=x&id=7&ref=abc&page=2&fbclid=zz") ==
      "https://example.com/a?id=7&page=2")
    // all-tracking query collapses entirely (no dangling '?')
    assert(norm("https://example.com/a?utm_source=x&gclid=1") ==
      "https://example.com/a")
  }

  test("non-absolute inputs pass through instead of collapsing to '://…'") {
    assert(norm("not a url at all ") == "not a url at all")
    assert(norm("/relative/path?x=1") == "/relative/path?x=1")
    assert(norm("mailto:someone@example.com") == "mailto:someone@example.com")
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, "garbage")).toDF("doc_id", "url")
      .select(UrlOps.urlDomain(col("url"))).head.getString(0)
    assert(d == "")
  }

  test("urlDomain is the registrable-domain approximation") {
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, "https://news.sub.Example.co/x")).toDF("doc_id", "url")
      .select(UrlOps.urlDomain(col("url"))).head.getString(0)
    assert(d == "example.co")
    // a KEPT non-default port must not defeat the domain match
    val dp = Seq((1L, "http://api.example.com:8080/x")).toDF("doc_id", "url")
      .select(UrlOps.urlDomain(col("url"))).head.getString(0)
    assert(dp == "example.com")
  }

  test("leading/trailing whitespace does not skip canonicalization") {
    assert(norm("  HTTPS://WWW.Example.COM/a/  ") == "https://example.com/a")
    assert(norm(" https://example.com/a") == norm("https://example.com/a"))
  }

  test("urlDedup canonicalizes crawl variants of one URL to min doc_id") {
    val crawls = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/a/?utm_source=feed"),
      (2L, "https://example.com/a"),
      (3L, "https://example.com/a?id=9") // different canonical URL
    ).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(crawls).collect()
    assert(out.toSeq == Seq(
      Row(1L, "https://example.com/a", "example.com", 1L, false),
      Row(2L, "https://example.com/a", "example.com", 1L, true),
      Row(3L, "https://example.com/a?id=9", "example.com", 3L, false)))
  }

  test("domainStats counts docs vs unique canonical URLs per domain") {
    val crawls = Seq(
      (1L, "https://a.example.com/x"),
      (2L, "https://WWW.example.com/x"), // same domain, same canonical as 3
      (3L, "https://example.com/x"),
      (4L, "https://other.net/y")
    ).toDF("doc_id", "url")
    val out = UrlOps.domainStats(crawls).collect()
    assert(out.toSeq == Seq(
      Row("example.com", 3L, 2L), // a.example.com/x distinct from example.com/x
      Row("other.net", 1L, 1L)))
  }

  test("plantUrls yields 5 crawls per canonical URL on a mod-100-uniform corpus") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 500L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val out = UrlOps.urlDedup(UrlOps.plantUrls(docs))
    val groups = out.groupBy("url_norm").count()
    assert(groups.count() == 100)
    assert(groups.filter(col("count") =!= 5).isEmpty)
  }

  test("domainQualityReport: junk domains block, substantive domains pass") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the data pipeline processes many diverse records with careful validation logic"),
      (2L, "a scheduler coordinates distributed tasks across worker nodes efficiently"),
      (3L, "a a a a the the the of of a a the of a the"),  // junk: stopwords + repeats
      (4L, "the the a a of of the a the a of the a of")
    ).toDF("doc_id", "text")
    val urls = Seq(
      (1L, "https://good.site/p1"), (2L, "https://good.site/p2"),
      (3L, "https://spam.farm/x1"), (4L, "https://spam.farm/x2")
    ).toDF("doc_id", "url")
    val out = UrlOps.domainQualityReport(docs, urls).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(4))).toSeq
    assert(out.map(_._1) == Seq("good.site", "spam.farm"))
    val (good, spam) = (out(0), out(1))
    assert(good._2 == 2 && spam._2 == 2)
    assert(good._3 > spam._3, s"substantive text must outscore junk: $out")
    assert(!good._4 && spam._4, s"only the junk domain blocks at 0.7: $out")
  }

  test("crawlSchedule: dense per-domain slots, one URL per slot, refetches collapse") {
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      (1L, "https://a.com/x"), (2L, "https://a.com/y"),
      (3L, "https://WWW.A.com/x"),           // refetch of 1 → same slot set
      (4L, "https://b.com/only")
    ).toDF("doc_id", "url")
    val out = UrlOps.crawlSchedule(urls).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("a.com", "https://a.com/x", 1L), ("a.com", "https://a.com/y", 2L),
      ("b.com", "https://b.com/only", 1L)), out.toString)
    // invariant: slots are dense 1..n per domain
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }
}
