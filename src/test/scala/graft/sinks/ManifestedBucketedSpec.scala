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

  test("commitBucketed refuses a legacy writeBucketed table with the " +
      "migration story instead of an opaque partitioning mismatch") {
    val root = Files.createTempDirectory("mbklg").toString
    val lw = new LakeWriter(root)
    try {
      lw.writeBucketed((1 to 10).map(i => (i.toLong, i)).toDF("k", "n"),
        "mbk_lgw", 2, Seq("k"))
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
      lw.writeBucketed((1 to 10).map(i => (i.toLong, i)).toDF("k", "n"),
        "mbk_leg", 2, Seq("k"))
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
