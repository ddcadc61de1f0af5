package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The manifested BUCKETED table protocol — snapshot isolation for
  * the persisted index tables WITHOUT losing the zero-exchange
  * bucketed probe plans.
  */
class ManifestedBucketedSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def dropT(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  /** Build a legacy (pre-manifest) plain bucketed table the way the
    * retired writeBucketed did — the read-compat fixtures these specs
    * exercise; no production writer emits this layout anymore.
    */
  private def writeLegacyBucketed(
      df: org.apache.spark.sql.DataFrame, root: String, table: String,
      buckets: Int, cols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .option("path", s"$root/$table").saveAsTable(table)

  test("commitBucketed: append commits accumulate, replace supersedes, pinned " +
      "versions time-travel, and the probe plan stays bucketed + exchange-free") {
    val root = Files.createTempDirectory("mbk").toString
    val lw = new LakeWriter(root)
    try {
      val s1 = (1 to 1000).map(i => (i.toLong % 50, s"a$i")).toDF("k", "v")
      val s2 = (1 to 200).map(i => (i.toLong % 50, s"b$i")).toDF("k", "v")
      assert(lw.commitBucketed(s1, "mbk_t", 8, Seq("k")) == 1)
      assert(lw.commitBucketed(s2, "mbk_t", 8, Seq("k")) == 2)
      assert(LakeWriter.readBucketedTable(spark, "mbk_t").count() == 1200)
      assert(LakeWriter.readBucketedTable(spark, "mbk_t", version = 1).count() == 1000,
        "a pinned old version reads its own snapshot")

      // probe join: indexed side must stay Bucketed: true with no
      // exchange above its scan, exactly like the legacy path
      val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probe = Seq((3L, "x"), (7L, "y")).toDF("k", "p").repartition(8, col("k"))
        val joined = LakeWriter.readBucketedTable(spark, "mbk_t").join(probe, Seq("k"))
        val plan = joined.queryExecution.executedPlan
        assert(plan.toString.contains("Bucketed: true"),
          s"bucketed scan must survive the manifest partition filter:\n$plan")
        val offenders = plan.collect {
          case e: ShuffleExchangeExec if e.collect {
            case s: FileSourceScanExec if s.toString.contains("mbk_t") => s
          }.nonEmpty => e
        }
        assert(offenders.isEmpty, s"indexed side must be exchange-free:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)

      // replacement commit supersedes both appends
      assert(lw.commitBucketed(
        Seq((99L, "z")).toDF("k", "v"), "mbk_t", 8, Seq("k"), replace = true) == 3)
      assert(LakeWriter.readBucketedTable(spark, "mbk_t").count() == 1)
      assert(LakeWriter.readBucketedTable(spark, "mbk_t", version = 2).count() == 1200,
        "replacement must not disturb the pinned prior snapshot")

      // vacuum to 1 version: superseded commit partitions reclaimed
      val dropped = lw.vacuumBucketed(spark, "mbk_t", keepVersions = 1)
      assert(dropped == 2, s"both superseded commit partitions reclaimed, got $dropped")
      assert(LakeWriter.readBucketedTable(spark, "mbk_t").count() == 1)
    } finally dropT("mbk_t")
  }

  test("commitBucketed: compaction collapses commits to one file per bucket " +
      "invisibly; a reader loop racing append+compact+vacuum only ever sees " +
      "committed snapshots and never throws") {
    val root = Files.createTempDirectory("mbkrace").toString
    val lw = new LakeWriter(root)
    try {
      val base = (1 to 100).map(i => (i.toLong % 8, i.toLong)).toDF("k", "n")
      lw.commitBucketed(base, "mbk_r", 4, Seq("k"))
      val legal = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      legal.add(100L)
      @volatile var writerDone = false
      val writer = new Thread(() => {
        var next = 101L
        for (_ <- 1 to 4) {
          val shard = (next to next + 49L).map(i => (i % 8, i)).toDF("k", "n")
          legal.add(next + 49L) // total count after this append commits
          lw.commitBucketed(shard, "mbk_r", 4, Seq("k"))
          next += 50
          lw.compactBucketedManifested(spark, "mbk_r")
          lw.vacuumBucketed(spark, "mbk_r", keepVersions = 2)
        }
        writerDone = true
      }, "mbk-writer")
      writer.start()
      var reads = 0
      var failures = List.empty[String]
      while (!writerDone && reads < 1000) {
        val c = LakeWriter.readBucketedTable(spark, "mbk_r").count()
        if (!legal.contains(c)) failures ::= s"saw count $c"
        reads += 1
      }
      writer.join(180000)
      assert(failures.isEmpty, s"readers saw uncommitted states: ${failures.take(5)}")
      assert(reads > 0 && LakeWriter.readBucketedTable(spark, "mbk_r").count() == 300)
      // vacuum to the current snapshot only: one commit partition
      // remains, holding one file per bucket (the compaction shape)
      lw.vacuumBucketed(spark, "mbk_r", keepVersions = 1)
      val live = new java.io.File(s"$root/mbk_r").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"${LakeWriter.CvCol}="))
      assert(live.length == 1,
        s"one live commit partition after vacuum(1): ${live.map(_.getName).toSeq}")
      // one file per NON-EMPTY bucket (a bucket the hash misses
      // writes no file): every parquet file carries a distinct
      // bucket id suffix
      val files = live.head.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
      val bucketIds = files.map(_.split("-")(1).take(5)).toSet
      assert(files.length <= 4 && files.length == bucketIds.size,
        s"one file per non-empty bucket after compaction: ${files.toSeq}")
    } finally dropT("mbk_r")
  }

  test("delta commits: a batch touching ONE key writes O(1 key) of files, " +
      "merged read supersedes per key without an exchange, and compaction " +
      "through the merged view bakes the right rows") {
    val root = Files.createTempDirectory("mbkd").toString
    val lw = new LakeWriter(root)
    try {
      // base state: 40 keys across 8 buckets, one version row each
      val base = (1L to 40L).map(k => (k, s"v1-$k")).toDF("k", "v")
      lw.commitBucketed(base, "mbk_d", 8, Seq("k"), replace = true)
      val v1Files = new java.io.File(s"$root/mbk_d/${LakeWriter.CvCol}=1")
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
      // delta: key 3 only (its complete current row set — two rows now)
      val delta = Seq((3L, "v2-3a"), (3L, "v2-3b")).toDF("k", "v").coalesce(1)
      lw.commitBucketed(delta, "mbk_d", 8, Seq("k"))
      // O(affected) physical I/O: the delta commit's partition holds
      // files for ONE bucket (one writing task), and the base commit's
      // files are untouched
      val v2Dir = new java.io.File(s"$root/mbk_d/${LakeWriter.CvCol}=2")
      val v2Files = v2Dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(v2Files.length == 1,
        s"one-key delta must write one bucket file: ${v2Files.map(_.getName).toSeq}")
      val v1After = new java.io.File(s"$root/mbk_d/${LakeWriter.CvCol}=1")
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
      assert(v1After == v1Files, "a delta commit must not touch prior commits' files")
      // merged view: key 3 superseded (2 rows from v2), others from v1
      val merged = LakeWriter.readBucketedTableMerged(spark, "mbk_d", Seq("k"))
      val k3 = merged.filter(col("k") === 3L).collect().map(_.getString(1)).sorted
      assert(k3.toSeq == Seq("v2-3a", "v2-3b"), k3.toSeq.toString)
      assert(merged.count() == 41 && merged.filter(col("v").startsWith("v1-"))
        .count() == 39, "untouched keys keep their v1 rows")
      // the per-key max-cv window must ride the bucketed scan: no
      // exchange anywhere in the merged-read plan
      val plan = merged.queryExecution.executedPlan
      assert(plan.toString.contains("Bucketed: true"), s"$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"merge-on-read must add no exchange over the bucketed scan:\n$plan")
      // compaction must go through the merged view — superseded v1
      // rows of key 3 must NOT be baked into the replacement
      lw.compactBucketedManifested(spark, "mbk_d", mergeKeys = Seq("k"))
      lw.vacuumBucketed(spark, "mbk_d", keepVersions = 1)
      val after = LakeWriter.readBucketedTable(spark, "mbk_d")
      assert(after.count() == 41 &&
        after.filter(col("k") === 3L).count() == 2,
        "merged compaction keeps exactly the superseding rows")
    } finally dropT("mbk_d")
  }

  test("bucketedTableStats: live commits / files / max-per-bucket track " +
      "appends, compaction, and vacuum") {
    val root = Files.createTempDirectory("mbks").toString
    val lw = new LakeWriter(root)
    try {
      assert(lw.bucketedTableStats(spark, "mbk_s") == ((0, 0, 0L, 0)),
        "no manifest yet → all zeros")
      (1 to 3).foreach { i =>
        lw.commitBucketed((1L to 64L).map(k => (k, i)).toDF("k", "n"),
          "mbk_s", 4, Seq("k"))
      }
      val (live, files, bytes, maxPb) = lw.bucketedTableStats(spark, "mbk_s")
      assert(live == 3 && files >= 4 && bytes > 0L && maxPb >= 3,
        s"three appends: ($live, $files, $bytes, $maxPb)")
      lw.compactBucketedManifested(spark, "mbk_s")
      lw.vacuumBucketed(spark, "mbk_s", keepVersions = 1)
      val (live2, files2, _, maxPb2) = lw.bucketedTableStats(spark, "mbk_s")
      assert(live2 == 1 && files2 <= 4 && maxPb2 == 1,
        s"compact+vacuum: ($live2, $files2, $maxPb2)")
    } finally dropT("mbk_s")
  }

  test("commit-time expectations: a violating commit is refused atomically " +
      "(no manifest version published), a clean commit lands — both protocols") {
    val root = Files.createTempDirectory("mbke").toString
    val lw = new LakeWriter(root)
    val rules = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.Relational.expectationsReport(df,
        rowRules = Seq("k_positive" -> (col("k") > 0L)),
        uniqueKeys = Seq("k_unique" -> Seq("k")))
    try {
      // plain manifested table
      assert(lw.commitManifested((1L to 5L).toDF("k"), "mbk_em",
        expectations = Some(rules)) == 1)
      val e1 = intercept[CommitRejectedException] {
        lw.commitManifested(Seq(-1L, 7L).toDF("k"), "mbk_em",
          expectations = Some(rules))
      }
      assert(e1.violations == Seq(("k_positive", 1L)), e1.getMessage)
      assert(lw.readManifested(spark, "mbk_em").count() == 5,
        "the refused commit must not be visible")
      assert(lw.commitManifested(Seq(6L).toDF("k"), "mbk_em",
        expectations = Some(rules)) == 2, "version numbering stays dense")
      assert(lw.readManifested(spark, "mbk_em").count() == 6)
      // the refused data dir is an orphan; vacuum reclaims it
      assert(lw.vacuumManifested(spark, "mbk_em", keepVersions = 1) >= 1)

      // manifested bucketed table
      assert(lw.commitBucketed((1L to 5L).map(k => (k, s"v$k")).toDF("k", "v"),
        "mbk_eb", 4, Seq("k"), expectations = Some(rules)) == 1)
      intercept[CommitRejectedException] {
        lw.commitBucketed(Seq((9L, "a"), (9L, "b")).toDF("k", "v"),
          "mbk_eb", 4, Seq("k"), expectations = Some(rules)) // k not unique
      }
      assert(LakeWriter.readBucketedTable(spark, "mbk_eb").count() == 5,
        "the refused bucketed commit must not be visible")
      // the retried clean commit recomputes v=2: the crashed-commit
      // recovery replaces the refused partition instead of appending
      // beside its torn rows
      assert(lw.commitBucketed(Seq((6L, "c")).toDF("k", "v"),
        "mbk_eb", 4, Seq("k"), expectations = Some(rules)) == 2)
      assert(LakeWriter.readBucketedTable(spark, "mbk_eb").count() == 6,
        "the refused rows must not resurface under the retried version")
      // a ZERO-row commit writes no partition directory — the rules
      // evaluate vacuously clean instead of crashing on a missing path
      assert(lw.commitBucketed(
        Seq.empty[(Long, String)].toDF("k", "v"), "mbk_eb", 4, Seq("k"),
        expectations = Some(rules)) == 3)
      assert(LakeWriter.readBucketedTable(spark, "mbk_eb").count() == 6)
    } finally dropT("mbk_eb")
  }

  test("commitBucketed: a crashed commit (partition dir, no manifest) is " +
      "invisible to readers and reclaimed by vacuum") {
    val root = Files.createTempDirectory("mbkorph").toString
    val lw = new LakeWriter(root)
    try {
      lw.commitBucketed((1L to 5L).map(i => (i, i)).toDF("k", "n"), "mbk_o", 2, Seq("k"))
      // simulate a crash between the partition write and the manifest
      // rename: write a graft_cv=2 partition with no manifest-2
      (6L to 9L).map(i => (i, i)).toDF("k", "n")
        .withColumn(LakeWriter.CvCol, lit(2))
        .write.mode("append").partitionBy(LakeWriter.CvCol)
        .bucketBy(2, "k").sortBy("k")
        .option("path", s"$root/mbk_o").saveAsTable("mbk_o")
      spark.catalog.refreshTable("mbk_o")
      assert(LakeWriter.readBucketedTable(spark, "mbk_o").count() == 5,
        "an unmanifested commit partition must be invisible")
      val dropped = lw.vacuumBucketed(spark, "mbk_o", keepVersions = 1)
      assert(dropped == 1, "vacuum must reclaim exactly the orphan partition")
      assert(LakeWriter.readBucketedTable(spark, "mbk_o").count() == 5)
    } finally dropT("mbk_o")
  }

  test("a LATER commit (prev >= 1) that crashed before its manifest is " +
      "overwritten by the retry — torn rows never publish as duplicates") {
    val root = Files.createTempDirectory("mbkrt").toString
    val lw = new LakeWriter(root)
    try {
      lw.commitBucketed((1L to 5L).map(i => (i, i)).toDF("k", "n"), "mbk_rt", 2, Seq("k"))
      // simulate a crash between the v=2 partition write and the
      // manifest rename: populated graft_cv=2, manifest still at 1
      (6L to 9L).map(i => (i, i)).toDF("k", "n")
        .withColumn(LakeWriter.CvCol, lit(2))
        .write.mode("append").partitionBy(LakeWriter.CvCol)
        .bucketBy(2, "k").sortBy("k")
        .option("path", s"$root/mbk_rt").saveAsTable("mbk_rt")
      spark.catalog.refreshTable("mbk_rt")
      // the retry (e.g. a replayed streaming micro-batch) recomputes
      // v=2; it must REPLACE the torn partition, not append beside it
      assert(lw.commitBucketed((6L to 9L).map(i => (i, i)).toDF("k", "n"),
        "mbk_rt", 2, Seq("k")) == 2)
      assert(LakeWriter.readBucketedTable(spark, "mbk_rt")
        .collect().map(_.getLong(0)).sorted.toSeq == (1L to 9L),
        "torn v2 rows must not surface as duplicates after the retry")
      // same hole for REPLACE commits: torn v3, then a replace retry
      (20L to 21L).map(i => (i, i)).toDF("k", "n")
        .withColumn(LakeWriter.CvCol, lit(3))
        .write.mode("append").partitionBy(LakeWriter.CvCol)
        .bucketBy(2, "k").sortBy("k")
        .option("path", s"$root/mbk_rt").saveAsTable("mbk_rt")
      spark.catalog.refreshTable("mbk_rt")
      assert(lw.commitBucketed((20L to 21L).map(i => (i, i)).toDF("k", "n"),
        "mbk_rt", 2, Seq("k"), replace = true) == 3)
      assert(LakeWriter.readBucketedTable(spark, "mbk_rt")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 21L))
    } finally dropT("mbk_rt")
  }

  test("vacuumBucketed on a table with no data directory is a no-op") {
    val root = Files.createTempDirectory("mbkvn").toString
    val lw = new LakeWriter(root)
    assert(lw.vacuumBucketed(spark, "mbk_nodata") == 0)
  }

  test("a FIRST commit that crashed before its manifest reads as an EMPTY " +
      "snapshot and the retried commit overwrites the torn partition") {
    val root = Files.createTempDirectory("mbkfc").toString
    val lw = new LakeWriter(root)
    try {
      // simulate the crash: partitioned+bucketed table written, no
      // manifest dir at all
      (1L to 5L).map(i => (i, i)).toDF("k", "n")
        .withColumn(LakeWriter.CvCol, lit(1))
        .write.mode("overwrite").partitionBy(LakeWriter.CvCol)
        .bucketBy(2, "k").sortBy("k")
        .option("path", s"$root/mbk_fc").saveAsTable("mbk_fc")
      val r = LakeWriter.readBucketedTable(spark, "mbk_fc")
      assert(r.columns.toSeq == Seq("k", "n"),
        "torn first commit must read with schema, without graft_cv")
      assert(r.count() == 0, "the torn partition must be invisible")
      // the retried commit replaces the torn rows instead of doubling
      assert(lw.commitBucketed((10L to 12L).map(i => (i, i)).toDF("k", "n"),
        "mbk_fc", 2, Seq("k")) == 1)
      assert(LakeWriter.readBucketedTable(spark, "mbk_fc")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L, 12L))
    } finally dropT("mbk_fc")
  }

  test("commitBucketed refuses a legacy plain-bucketed table with the " +
      "migration story instead of an opaque partitioning mismatch") {
    val root = Files.createTempDirectory("mbklg").toString
    val lw = new LakeWriter(root)
    try {
      writeLegacyBucketed((1 to 10).map(i => (i.toLong, i)).toDF("k", "n"),
        root, "mbk_lgw", 2, Seq("k"))
      val e = intercept[IllegalArgumentException] {
        lw.commitBucketed((11L to 12L).map(i => (i, i.toInt)).toDF("k", "n"),
          "mbk_lgw", 2, Seq("k"))
      }
      assert(e.getMessage.contains("legacy"), e.getMessage)
      // ...and the advertised migration actually works: a REPLACE
      // commit redefines the table manifested, and appends flow after
      assert(lw.commitBucketed((11L to 12L).map(i => (i, i.toInt)).toDF("k", "n"),
        "mbk_lgw", 2, Seq("k"), replace = true) == 1)
      lw.commitBucketed((13L to 13L).map(i => (i, i.toInt)).toDF("k", "n"),
        "mbk_lgw", 2, Seq("k"))
      assert(LakeWriter.readBucketedTable(spark, "mbk_lgw")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 12L, 13L))
    } finally dropT("mbk_lgw")
  }

  test("readBucketedTable falls back to a plain table read for a legacy " +
      "(unmanifested) bucketed table") {
    val root = Files.createTempDirectory("mbkleg").toString
    val lw = new LakeWriter(root)
    try {
      writeLegacyBucketed((1 to 10).map(i => (i.toLong, i)).toDF("k", "n"),
        root, "mbk_leg", 2, Seq("k"))
      assert(LakeWriter.readBucketedTable(spark, "mbk_leg").count() == 10)
    } finally dropT("mbk_leg")
  }

  test("commitBucketed re-roots when a stale catalog entry from a previous " +
      "run points elsewhere, instead of appending into the old location") {
    val root1 = Files.createTempDirectory("mbkr1").toString
    val root2 = Files.createTempDirectory("mbkr2").toString
    try {
      new LakeWriter(root1).commitBucketed(
        (1L to 5L).map(i => (i, i)).toDF("k", "n"), "mbk_two", 2, Seq("k"))
      new LakeWriter(root2).commitBucketed(
        (6L to 7L).map(i => (i, i)).toDF("k", "n"), "mbk_two", 2, Seq("k"))
      assert(LakeWriter.readBucketedTable(spark, "mbk_two").count() == 2,
        "the fresh root starts a fresh snapshot history")
    } finally dropT("mbk_two")
  }
}
