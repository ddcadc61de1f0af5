package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzyMatchMultiBlock: a block-key typo is invisible to its own block " +
      "and found only by the complementary pass; shared pairs verify once") {
    import org.apache.spark.sql.functions.{col, expr}
    val named = Seq(
      (1L, "alphabet"),  // base
      (2L, "xlphabet"),  // first-char typo: escapes the prefix block
      (3L, "alphabex"),  // last-char typo: escapes the suffix block
      (4L, "zzzzzzzz")   // unrelated
    ).toDF("key", "name")
    val prefix = expr("substr(name, 1, length(name)-1)")
    val suffix = expr("substr(name, 2)")
    def pairs(blocks: Seq[org.apache.spark.sql.Column]) =
      TextOps.fuzzyMatchMultiBlock(named, blocks, maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each single block is blind to the typo INSIDE its key region
    assert(pairs(Seq(suffix)) == Set((1L, 2L)))
    assert(pairs(Seq(prefix)) == Set((1L, 3L)))
    // the union finds both (1,2)-(1,3); (2,3) differs at both ends so
    // NEITHER block surfaces it — candidate recall, not all-pairs
    assert(pairs(Seq(suffix, prefix)) == Set((1L, 2L), (1L, 3L)))
    // distances are the exact DP values
    val d = TextOps.fuzzyMatchMultiBlock(named, Seq(suffix, prefix), 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(d == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L))
  }

  test("entityIds: a 3-member typo cluster resolves to ONE deterministic id; " +
      "unmatched keys get themselves") {
    import org.apache.spark.sql.functions.expr
    val named = Seq(
      (5L, "alphabet"), (2L, "xlphabet"), (9L, "alphabex"), // one entity
      (7L, "qqqqqqqq")                                      // singleton
    ).toDF("key", "name")
    val pairs = TextOps.fuzzyMatchMultiBlock(named,
      Seq(expr("substr(name, 2)"), expr("substr(name, 1, length(name)-1)")), 2)
    val got = TextOps.entityIds(named, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // min key 2 is the canonical representative of the whole cluster —
    // including key 9, connected only THROUGH key 5 (no direct 2-9 pair)
    assert(got == Seq((2L, 2L, true), (5L, 2L, false), (7L, 7L, true),
      (9L, 2L, false)), got.toString)
  }

  test("fingerprint is invariant under case/punctuation/whitespace noise") {
    import org.apache.spark.sql.functions.col
    val fps = Seq("Hello,   World!", "hello world", "  HELLO?? world\t")
      .toDF("text").select(TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("normalizeUnicode: accents fold, typography folds, case and whitespace " +
      "collapse (golden)") {
    val out = TextOps.normalizeTexts(
        Seq((1L, "  Déjà Vu – “Naïve”\n\nCAFÉ  "),
          (2L, "plain ascii stays")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "deja vu - \"naive\" cafe", ("deja vu - \"naive\" cafe").length.toLong),
      (2L, "plain ascii stays", 17L)), out.toString)
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

  test("repetitionScores: max shingle multiplicity on a known document") {
    // tokens a b a b a b c → 3-shingles (a b a),(b a b),(a b a),(b a b),(a b c)
    val out = TextOps.repetitionScores(
      Seq((1L, "a b a b a b c")).toDF("doc_id", "text")).collect()(0)
    assert(out.getLong(1) == 2L)      // top_count: "a b a" twice
    assert(out.getLong(2) == 5L)      // n_shingles with multiplicity
    assert(out.getDouble(3) == 0.4)   // 2/5
    // documents under n tokens produce no shingles and drop
    assert(TextOps.repetitionScores(
      Seq((1L, "one two")).toDF("doc_id", "text")).count() == 0)
  }

  test("graft_max_sorted_run native expression: golden values") {
    import org.apache.spark.sql.functions.{call_function, col}
    val df = Seq(
      (1L, Seq("a", "a", "b", "b", "b", "c")),
      (2L, Seq.empty[String]),
      (3L, Seq("x"))).toDF("id", "sh")
    val got = df.select(col("id"), call_function("graft_max_sorted_run", col("sh")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("graft_window_min native expression: golden values and fallback parity") {
    import org.apache.spark.sql.functions.{array_min, call_function, col, lit, sequence, size, slice, transform, when, array}
    val df = Seq(
      (1L, Seq(5L, 3L, 8L, 1L, 9L, 2L)), // m=6, w=3 → [3,1,1,1]
      (2L, Seq(7L, 4L)),                 // shorter than a window → [4]
      (3L, Seq.empty[Long])              // empty → []
    ).toDF("id", "hs")
    val got = df.select(col("id"), call_function("graft_window_min", col("hs"), lit(3)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == Map(1L -> Seq(3L, 1L, 1L, 1L), 2L -> Seq(4L), 3L -> Seq.empty))
    // parity with the composable slice-per-window form on non-empty input
    val hs = col("hs")
    val fallback = when(size(hs) >= 3,
      transform(sequence(lit(1), size(hs) - 2), i => array_min(slice(hs, i, lit(3)))))
      .otherwise(array(array_min(hs)))
    val fb = df.filter(size(col("hs")) > 0).select(col("id"), fallback)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fb == got.filter(_._2.nonEmpty))
  }

  test("splitAssign is content-deterministic: duplicate docs share a split") {
    val docs = Seq(
      (1L, "same text here", "web", 14L),
      (2L, "same text here", "web", 14L),
      (3L, "other doc entirely", "web", 18L)).toDF("doc_id", "text", "source", "n_chars")
    val counts = TextOps.splitAssign(docs).collect().map(_.getLong(2)).sorted.toSeq
    // the two identical docs hash to one split: groups are {2,1} or {3}
    assert(counts == Seq(1L, 2L) || counts == Seq(3L), counts.toString)
    // and the assignment is stable across runs
    val again = TextOps.splitAssign(docs).collect().map(_.getLong(2)).sorted.toSeq
    assert(again == counts)
  }

  test("winnowing guarantees shared fingerprints for long shared substrings") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"prefix words here $shared"),
      (2L, s"$shared trailing other words"),
      (3L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val sets = TextOps.winnowSets(docs, k = 3, w = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    // the guarantee: any shared token run of length >= w+k-1 = 6
    // forces at least one common selected fingerprint (the shared
    // run here is 8 tokens)
    assert(sets(1L).intersect(sets(2L)).nonEmpty)
    // the unrelated doc shares nothing with either
    assert(sets(3L).intersect(sets(1L)).isEmpty)
    assert(sets(3L).intersect(sets(2L)).isEmpty)
    // summary op agrees with the sets
    val out = TextOps.winnowFingerprints(docs, k = 3, w = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._2 == sets(1L).size)
    assert(out(1L)._3 == sets(1L).min && out(1L)._4 == sets(1L).max)
    assert(out.values.forall { case (ns, nf, _, _) => nf >= 1 && nf <= ns })
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

  test("chunkTexts: overlapping windows, short tail, empty docs dropped") {
    val docs = Seq(
      (1L, "abcdefghij"), // len 10: width 4, overlap 1 -> starts 1,4,7,10
      (2L, "xy"),         // single short chunk
      (3L, "")            // dropped
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTexts(docs, width = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, "abcd"), (1L, 1L, 4L, "defg"),
      (1L, 2L, 7L, "ghij"), (1L, 3L, 10L, "j"),
      (2L, 0L, 1L, "xy")))
    // consecutive chunks overlap by exactly `overlap` characters
    assert(out(0)._4.takeRight(1) == out(1)._4.take(1))
  }

  test("redactPii: email, phone, IP in order; dotted phones never count as IPs") {
    val docs = Seq(
      (1L, "mail a.b@x.io and c@y.org, call 555-123-4567, host 10.0.0.1"),
      (2L, "dotted phone 555.123.4567 is claimed before the IP pass"),
      (3L, "clean text, no secrets")).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((2L, 1L, 1L,
      "mail [EMAIL] and [EMAIL], call [PHONE], host [IP]")))
    // the 4-octet-shaped dotted phone is redacted as a PHONE: zero IPs
    assert(out(2L) == ((0L, 1L, 0L,
      "dotted phone [PHONE] is claimed before the IP pass")))
    assert(out(3L) == ((0L, 0L, 0L, "clean text, no secrets")))
  }

  test("classifierScores: table-served scores equal the inline weight formula; " +
      "keep tracks the sign; empty docs drop") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the the the the"),
      (3L, "!!!")).toDF("doc_id", "text") // no tokens → drops
    val served = TextOps.classifierScores(docs, TextOps.hashedWeightTable(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(served.map(_._1).toSeq == Seq(1L, 2L))
    // inline twin: same hash, same weight formula, no join
    val inline = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % 4096).as("b"))
      .select(col("doc_id"),
        ((col("b") * TextOps.ClassifierA + TextOps.ClassifierB) % TextOps.ClassifierP).as("w"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("w").as("s"))
      .select(col("doc_id"),
        Exact.quant4(col("s").cast("double") / col("n") / TextOps.ClassifierP.toDouble - 0.5)
          .as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    served.foreach { case (id, n, score, keep) =>
      assert(score == inline(id), s"doc $id served $score != inline ${inline(id)}")
      assert(keep == (score > 0.0))
      assert(score >= -0.5 && score <= 0.5)
      assert(n > 0)
    }
    // 4 identical tokens = 1 distinct bucket counted 4 times → the
    // score equals the single token's weight
    val oneTok = Seq((9L, "the")).toDF("doc_id", "text")
    val one = TextOps.classifierScores(oneTok, TextOps.hashedWeightTable(spark))
      .collect()(0).getDouble(2)
    assert(served.find(_._1 == 2L).get._3 == one)
  }
}
