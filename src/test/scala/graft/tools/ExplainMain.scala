package graft.tools

/** Dev-time plan dump (test scope — not part of the library):
  * `sbt "Test/runMain graft.tools.ExplainMain <sfDir> <query>[,query...]"`.
  * Prints the formatted physical plan of named `SparkEntry.queries`
  * entries — the loop for checking that a new operator's plan is the
  * one you'd want (broadcasts where expected, filters pushed, no
  * stray exchanges) rather than the first one that passed.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q01_pricing_summary")
    val spark = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
