package graft.tools

import org.apache.spark.sql.DataFrame

/** Dev-time stage profiler (test scope — not part of the library):
  * `sbt "Test/runMain graft.tools.ProfileMain <sfDir> <stage>[,stage...]"`.
  * Times each named stage fully materialized via the noop sink, twice
  * (cold + warm-JIT), with caches released between runs.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val stages = if (args.length > 1) args(1).split(",").toSeq else Seq("signatures", "t25")
    val spark = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def frame(stage: String): DataFrame = stage match {
      case "signatures" => graft.ops.Dedup.minhashSignatures(docs)
      case "t25" => graft.ops.Dedup.minhashLshPairs(docs)
      case "t24" => graft.ops.Dedup.jaccardPairs(docs)
      case "t49" => graft.ops.Dedup.jaccardClusters(docs)
      case other => sys.error(s"unknown stage $other")
    }
    stages.foreach { s =>
      (1 to 2).foreach { i =>
        graft.core.GraftCaches.release(spark)
        graft.ops.Dedup.releaseCaches()
        val t0 = System.nanoTime()
        frame(s).write.format("noop").mode("overwrite").save()
        println(f"PROFILE $s run$i: ${(System.nanoTime() - t0) / 1e9}%.2f sec")
      }
    }
    spark.stop()
  }
}
