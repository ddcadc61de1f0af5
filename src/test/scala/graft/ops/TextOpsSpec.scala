package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint is invariant under case/punctuation/whitespace noise") {
    import org.apache.spark.sql.functions.col
    val fps = Seq("Hello,   World!", "hello world", "  HELLO?? world\t")
      .toDF("text").select(TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("predictLang picks the language with most marker hits, ties by precedence") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("the cat is on the mat and a dog", "en"),
      ("el perro que corre de la casa a los campos", "es"),
      ("der hund und die katze das ist gut", "de"),
      ("le chat et les chiens des villes est la", "fr"),
      ("xyzzy plugh quux", "unknown"),
      ("the la", "en")) // 1-1 tie → declared precedence order wins
    val out = cases.map(_._1).toDF("text")
      .select(col("text"), TextOps.predictLang(col("text")).as("pred"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (text, want) => assert(out(text) == want, text) }
  }

  test("qualityScores golden values on a known document") {
    // 10 tokens: the(stop) quick brown fox the(stop) lazy dog a(stop) b c
    val out = TextOps.qualityScores(
      Seq((1L, "the quick brown fox the lazy dog a b c")).toDF("doc_id", "text"))
      .collect()(0)
    // tokens=10 uniq=9 (the ×2), sum_len=29, stops: the,the,a → 3
    assert(out.getLong(1) == 10L && out.getLong(2) == 9L)
    assert(out.getDouble(3) == 2.9)    // avg_token_len
    assert(out.getDouble(4) == 0.9)    // uniq_ratio
    assert(out.getDouble(5) == 0.3)    // stop_ratio
    // 0.9*0.5 + min(10/100,1)*0.3 + (1-0.3)*0.2 = 0.45+0.03+0.14 = 0.62
    assert(out.getDouble(6) == 0.62)
  }

  test("tokenCounts aggregates per source") {
    val out = TextOps.tokenCounts(Seq(
      (1L, "one two three", "web"),
      (2L, "four five", "web"),
      (3L, "six", "books")).toDF("doc_id", "text", "source")).collect()
    assert(out.toSeq == Seq(
      Row("books", 1L, 1.0, 1L),
      Row("web", 5L, 2.5, 2L)))
  }
}
