package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM — suites
  * must not stop() it.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
