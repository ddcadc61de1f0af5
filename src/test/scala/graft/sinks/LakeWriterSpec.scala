package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakeWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join with zero exchanges (co-located by write)") {
    val root = Files.createTempDirectory("bucketed").toString
    val lw = new LakeWriter(root)
    val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
    val dims = (1 to 5000).map(i => (i.toLong % 500, s"d$i")).toDF("k", "d")
    lw.writeBucketed(facts, "bk_facts", buckets = 8, bucketCols = Seq("k"))
    lw.writeBucketed(dims, "bk_dims", buckets = 8, bucketCols = Seq("k"))
    try {
      // disable broadcast so the join would otherwise SHUFFLE both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_facts").join(spark.table("bk_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
      assert(joined.count() == 10000L * 10) // each k has 10 dim rows
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS bk_facts")
      spark.sql("DROP TABLE IF EXISTS bk_dims")
    }
  }

  test("partitioned write round-trips and exposes load_date for pruning") {
    val root = Files.createTempDirectory("lake2").toString
    val lw = new LakeWriter(root)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    lw.write(df, "ent", "2026-08-12")
    val back = lw.read(spark, "ent")
    assert(back.count() == 2)
    // partition inference types the directory value as DATE — which is
    // what makes load_date range predicates prune partitions
    assert(back.select("load_date").distinct().collect()(0).get(0).toString == "2026-08-12")
  }
}
