package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.LakeWriter

/** Incremental dedup: a new shard probes a persisted minhash index —
  * the daily 100 TB workflow where re-canonicalizing history is not an
  * option. Three claims, each its own test:
  *
  *  1. semantics — output equals the full recompute RESTRICTED to
  *     pairs with ≥1 new side, and old×old dups never surface;
  *  2. plan: the indexed band table is scanned exactly once and never
  *     sits under a shuffle (bucketed by bkey, the probe join reads
  *     its buckets in place);
  *  3. plan: the verification semi-join reads history token sets
  *     bucket-locally (bucketed by doc_id) — only the small candidate
  *     id frame shuffles.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"), // old×old dup — must NOT surface
    (3L, "red orange yellow green blue indigo"),
    (4L, "one two three four five six seven"),
    (6L, "lorem ipsum dolor sit amet"),
    (10L, "red orange yellow green blue indigo"), // new, dup of old 3
    (15L, "spark catalyst tungsten codegen shuffle"),
    (20L, "spark catalyst tungsten codegen shuffle") // new×new dup
  ).toDF("doc_id", "text")

  private def newShard = corpus.filter($"doc_id" % 5 === 0)
  private def history = corpus.filter($"doc_id" % 5 =!= 0)

  test("incremental output == full recompute restricted to new-involving pairs") {
    val idx = Dedup.minhashIndexFrames(history)
    val inc = Dedup.incrementalMinhashPairs(newShard, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val newIds = Set(10L, 15L, 20L)
    val full = Dedup.minhashLshPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => newIds(p._1) || newIds(p._2)).toSet
    assert(inc == full)
    assert(inc.contains((3L, 10L, 1.0)), "old-new dup must surface")
    assert(inc.contains((15L, 20L, 1.0)), "new-new dup must surface")
    assert(!inc.exists(p => p._1 == 1L && p._2 == 2L),
      "old-old dup must be unrepresentable, not merely filtered")
    Dedup.releaseCaches()
  }

  private def scansOf(plan: SparkPlan, table: String): Seq[FileSourceScanExec] =
    plan.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) => f
    }

  /** Shuffles whose subtree contains a scan of `table` — i.e. places
    * where that table's rows cross the wire before first being
    * reduced by a join.
    */
  private def shufflesOver(plan: SparkPlan, table: String): Seq[SparkPlan] =
    plan.collect {
      case e: ShuffleExchangeExec if scansOf(e, table).nonEmpty => e
    }

  /** No shuffle BETWEEN the table's scan and its first join ancestor —
    * the bucket-local-probe claim. (Shuffles of the small RESULT
    * downstream of the join, e.g. a final orderBy, are fine.)
    */
  private def probeIsBucketLocal(plan: SparkPlan, table: String): Boolean = {
    def path(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == table) =>
        Some(List(p))
      case _ => p.children.iterator.flatMap(c => path(c)).nextOption().map(p :: _)
    }
    path(plan).exists { nodes =>
      nodes.reverse // scan .. root
        .takeWhile(!_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        .forall(!_.isInstanceOf[ShuffleExchangeExec])
    }
  }

  private def withStaticPlans[A](body: => A): A = {
    // AQE re-plans at runtime and hides the join subtree inside query
    // stages; broadcast would sidestep the bucket join entirely. Both
    // off ⇒ the executedPlan IS the plan we ship at scale (a 100 TB
    // index is never broadcast, and AQE only narrows from here).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("bucketed index bands: scanned once, never shuffled") {
    val root = Files.createTempDirectory("mhidx").toString
    Dedup.writeMinhashIndex(
      Dedup.minhashIndexFrames(history), new LakeWriter(root), "mhidx", buckets = 4)
    try withStaticPlans {
      val idx = Dedup.readMinhashIndex(spark, "mhidx")
      val cand = Dedup.incrementalCandidates(
        Dedup.minhashIndexFrames(newShard).bands, idx.bands)
      val plan = cand.queryExecution.executedPlan
      assert(scansOf(plan, "mhidx_bands").size == 1,
        s"indexed bands must feed exactly one join (no old-by-old recompute):\n$plan")
      assert(shufflesOver(plan, "mhidx_bands").isEmpty,
        s"indexed bands must join bucket-locally, not shuffle:\n$plan")
      // the candidate values survive the bucketed path unchanged
      val got = cand.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 10L), (15L, 20L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mhidx_bands")
      spark.sql("DROP TABLE IF EXISTS mhidx_toks")
    }
  }

  test("bucketed index toks: candidate semi-join is bucket-local on the history side") {
    val root = Files.createTempDirectory("mhidx2").toString
    Dedup.writeMinhashIndex(
      Dedup.minhashIndexFrames(history), new LakeWriter(root), "mhidx2", buckets = 4)
    try withStaticPlans {
      val idx = Dedup.readMinhashIndex(spark, "mhidx2")
      val candIds = Seq(1L, 3L).toDF("doc_id")
      val needed = idx.toks.join(candIds, Seq("doc_id"), "left_semi")
      val plan = needed.queryExecution.executedPlan
      assert(scansOf(plan, "mhidx2_toks").size == 1)
      assert(shufflesOver(plan, "mhidx2_toks").isEmpty,
        s"history toks must filter in place; only candidate ids may shuffle:\n$plan")
      assert(needed.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mhidx2_bands")
      spark.sql("DROP TABLE IF EXISTS mhidx2_toks")
    }
  }

  test("incrementalExactDedup == full exactDedup restricted to the new shard") {
    val inc = Dedup.incrementalExactDedup(newShard, Dedup.exactDedupIndex(history))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val newIds = Set(10L, 15L, 20L)
    val full = Dedup.exactDedup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .filter(t => newIds(t._1)).toSet
    assert(inc == full)
    // the canonical for new doc 10 is OLD doc 3 — history resolution,
    // not shard-local; 15 stays canonical for the new-new pair
    assert(inc == Set((10L, 3L, true), (15L, 15L, false), (20L, 15L, true)))
  }

  test("exact fingerprint index: bucketed probe is exchange-free and append-mode grows it") {
    val root = Files.createTempDirectory("fpidx").toString
    new LakeWriter(root).writeBucketed(
      Dedup.exactDedupIndex(history), "fpidx", buckets = 4, bucketCols = Seq("fp"))
    try {
      withStaticPlans {
        val idx = spark.table("fpidx")
        val probe = Dedup.incrementalExactDedup(newShard, idx)
        val plan = probe.queryExecution.executedPlan
        assert(scansOf(plan, "fpidx").size == 1)
        assert(probeIsBucketLocal(plan, "fpidx"),
          s"fingerprint history must join bucket-locally:\n$plan")
        assert(probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          == Set((10L, 3L), (15L, 15L), (20L, 15L)))
      }
      // the daily loop: append today's NOVEL fingerprints (anti-join —
      // an fp already indexed keeps its older canonical), tomorrow
      // sees the shard as history
      val novel = Dedup.exactDedupIndex(newShard)
        .join(spark.table("fpidx"), Seq("fp"), "left_anti")
      new LakeWriter(root, mode = "append").writeBucketed(
        novel, "fpidx", buckets = 4, bucketCols = Seq("fp"))
      val grown = spark.table("fpidx")
      // one row per distinct text across both shards, min ids kept
      assert(grown.count() == Dedup.exactDedupIndex(corpus).count())
      assert(grown.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        == Dedup.exactDedupIndex(corpus).collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap)
    } finally spark.sql("DROP TABLE IF EXISTS fpidx")
  }

  test("end-to-end over a persisted index matches the in-memory path") {
    val root = Files.createTempDirectory("mhidx3").toString
    Dedup.writeMinhashIndex(
      Dedup.minhashIndexFrames(history), new LakeWriter(root), "mhidx3", buckets = 4)
    try {
      val idx = Dedup.readMinhashIndex(spark, "mhidx3")
      val viaTable = Dedup.incrementalMinhashPairs(newShard, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaTable == Set((3L, 10L, 1.0), (15L, 20L, 1.0)))
    } finally {
      Dedup.releaseCaches()
      spark.sql("DROP TABLE IF EXISTS mhidx3_bands")
      spark.sql("DROP TABLE IF EXISTS mhidx3_toks")
    }
  }
}
