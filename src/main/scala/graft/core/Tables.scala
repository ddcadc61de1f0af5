package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed handles to the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. At 100 TB these would be
  * date-partitioned parquet/iceberg directories; everything downstream
  * takes a [[DataFrame]] so the swap is purely a change of path here.
  */
final case class Tables(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame
)

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String): Tables = {
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    Tables(
      region = t("region"), nation = t("nation"), customer = t("customer"),
      supplier = t("supplier"), part = t("part"), orders = t("orders"),
      lineitem = t("lineitem"), events = t("events"),
      documents = t("documents"), embeddings = t("embeddings"))
  }
}

/** Session factory with the scale-oriented defaults every entry point
  * shares: AQE (runtime re-plan, skew-join splitting, broadcast
  * demotion), partition counts sized for the local harness (on a real
  * cluster these come from spark-defaults / dynamic allocation).
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
}
