package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    // 90% of the big side lands on key 1 — the salted shape must not
    // change the result set
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "tag")

    val plain = big.join(small, "k").select("k", "payload", "tag")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .select("k", "payload", "tag").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salts actually spread the hot key across distinct values") {
    val big = (1 to 512).map(_ => (1L, "x")).toDF("k", "v")
    val salts = big.withColumn("_salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(big.columns.map(org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.lit(8)))
      .select("_salt").distinct().count()
    // identical rows hash identically; rows differ in practice — use
    // the realistic shape instead
    val big2 = (1 to 512).map(i => (1L, i)).toDF("k", "v")
    val salts2 = big2.withColumn("_salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(big2.columns.map(org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.lit(8)))
      .select("_salt").distinct().count()
    assert(salts2 == 8, s"expected all 8 salts used, got $salts2 (uniform rows: $salts)")
  }

  test("dedup prefix filter: a stop-word-grade token generates zero candidates") {
    import org.apache.spark.sql.functions._
    // adversarial corpus: EVERY set shares token "omni" (df = 302) —
    // the naive token join would fan out 302²/2 ≈ 45k candidate rows
    // through that single join key, all landing in one partition. The
    // df-ranked prefix must exclude it, leaving exactly the one pair
    // that shares RARE tokens.
    val uniq = (1L to 300L).map(i =>
      (i, ("omni" +: (1 to 10).map(j => s"u${i}_$j")).toSeq))
    val nearDup = Seq(
      (1001L, ("omni" +: (1 to 9).map(j => s"s$j")).toSeq :+ "x1"),
      (1002L, ("omni" +: (1 to 9).map(j => s"s$j")).toSeq :+ "x2"))
    val sets = (uniq ++ nearDup).toDF("doc_id", "toks")
      .withColumn("n", size(col("toks")).cast("long"))
    val cand = Dedup.prefixCandidates(sets, threshold = 0.6)
    assert(cand.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1001L, 1002L)),
      "only the rare-token pair may be a candidate; omni must stay out of every prefix")
    // partition-row bound: no candidate partition carries even 1% of
    // the 45k-row blowup the unranked join would produce
    val maxPart = cand.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPart < 450, s"candidate partition blew up: $maxPart rows")
  }

  test("dedup tail: a 10x mega-cluster corpus clusters correctly and stays set-granular") {
    import org.apache.spark.sql.functions._
    // 100 identical docs (one token set!) + 50 unique + a near-dup
    // pair; every doc also shares the stop-word. Canonicalization
    // collapses the mega-cluster to ONE set node, so propagation sees
    // ~52 nodes, never the 100×99/2 doc-pair expansion.
    val mega = (1L to 100L).map(i => (i, "omni copy pasta boiler plate text"))
    val uniqs = (201L to 250L).map(i => (i, s"omni unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e"))
    val pair = Seq(
      (301L, "omni shared1 shared2 shared3 shared4 only301"),
      (302L, "omni shared1 shared2 shared3 shared4 only302"))
    val docs = (mega ++ uniqs ++ pair).toDF("doc_id", "text")
    val out = Dedup.jaccardClusters(docs, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byDoc = out.map(t => t._1 -> t._2).toMap
    // the mega-cluster keeps one canonical label (its min doc id)
    assert((1L to 100L).forall(byDoc(_) == 1L))
    assert(out.count(t => t._2 == 1L && t._3) == 1)
    // near-dup pair clusters together (jac 5/7 ≈ 0.714)
    assert(byDoc(302L) == 301L && byDoc(301L) == 301L)
    // unique docs never join any cluster (absent from the output —
    // clustering only covers paired docs): the stop-word alone is jac
    // 1/11 and, more importantly, generated no candidates at all
    assert((201L to 250L).forall(i => !byDoc.contains(i)))
    Dedup.releaseCaches()
  }
}
