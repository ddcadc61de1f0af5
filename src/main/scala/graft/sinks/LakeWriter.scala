package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned Parquet lake sink.
  *
  * The reference encodes the load date into the FILENAME
  * (`YYYY-MM-DD-dadosprincipal.parquet`, `opendotaapi.py:114-118`) and
  * pushes bytes to S3 through an in-memory Arrow buffer + boto3
  * (`extract-data-dota.py:55-83`). Both are replaced by the idiomatic
  * Spark shape: `partitionBy("load_date")` directories — which make
  * the date a REAL partition column Catalyst can prune on — and the
  * Hadoop s3a committer, which writes distributed (no driver-side
  * buffering of the whole dataset, which at 100 TB is not optional).
  */
final class LakeWriter(root: String, mode: String = "overwrite") {

  /** Write an entity snapshot under `root/<entity>/load_date=<d>/`.
    * `partitionOverwriteMode=dynamic` scoped to this write: a re-run
    * replaces only the partitions it produces — monthly full loads
    * don't clobber history.
    */
  def write(df: DataFrame, entity: String, loadDate: String): Unit =
    df.withColumn("load_date", lit(loadDate))
      .write
      .mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("load_date")
      .parquet(s"$root/$entity")

  def read(spark: SparkSession, entity: String): DataFrame =
    spark.read.parquet(s"$root/$entity")

  /** Bucketed managed table: co-locates join keys at WRITE time so
    * repeated joins/aggregations on `bucketCols` run with NO shuffle
    * at all — the 100 TB answer for fact-to-fact joins that recur
    * (lineitem⋈orders on the order key every day). Bucketing requires
    * the table catalog (bucket metadata lives there), hence
    * saveAsTable rather than a bare path.
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", s"$root/$table")
      .saveAsTable(table)
}

object LakeWriter {

  /** s3a credential/endpoint bootstrap — the engine-side counterpart
    * of the reference's env-var → boto3 client dance
    * (`extract-data-dota.py:14-32`). With these set, `root` may be an
    * `s3a://bucket/prefix` URI and every write above goes distributed
    * through the Hadoop committer; no client library in our code.
    */
  def configureS3a(
      spark: SparkSession,
      accessKey: String,
      secretKey: String,
      endpoint: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
    endpoint.foreach(conf.set("fs.s3a.endpoint", _))
  }
}
