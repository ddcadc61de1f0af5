package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{JavaHttpTransport, RestClient, RestSource, RetryPolicy, Transport}

/** DataSource V2 `TableProvider` for REST payloads:
  *
  *   spark.read.format("graft-rest").option("url", …).load()
  *
  * Schema is one STRING column `value`, one row per JSON document
  * (top-level arrays are split) — downstream does
  * `from_json(value, schema)` / dot-paths, which keeps the connector
  * orthogonal to every payload shape the endpoint catalog covers.
  *
  * Rate-limit-correct by construction: ALL fetching happens on the
  * DRIVER at scan-planning time, serially through one retrying
  * token-bucketed client (API limits are global — per-executor
  * fetch loops would multiply pressure; SURVEY §7.4). Each URL's
  * payload rides to executors INSIDE its `InputPartition`, so
  * parallelism over multiple URLs/pages (`urls` option) costs zero
  * extra calls. REST payloads are small; at true bulk-data scale the
  * lake, not the API, is the distributed source.
  *
  * Options: `url` or `urls` (comma-separated) or `body` (inline
  * payload — fixture/test path, zero egress); `maxRetries`,
  * `backoffMillis`, `minIntervalMillis` tune the client.
  */
class RestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestTableProvider.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties.asScala.toMap)
}

object RestTableProvider {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Test seam: specs install a scripted transport here; `None` means
    * the real HTTP transport.
    */
  @volatile var transportOverride: Option[Transport] = None
}

final class RestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    props.get("url").orElse(props.get("urls")).getOrElse("inline-body")
  override def schema(): StructType = RestTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new RestScan(props ++ options.asScala)
    }
}

final case class RestPartition(docs: Array[String]) extends InputPartition

final class RestScan(opts: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = RestTableProvider.schema
  override def toBatch: Batch = this

  /** Memoized: Spark calls planInputPartitions during planning AND
    * execution — one fetch set per scan, not per call. (A new action
    * on the same DataFrame builds a new scan and re-fetches, exactly
    * like re-reading files; cache the DataFrame to pin a snapshot.)
    */
  private lazy val partitions: Array[InputPartition] = fetchPartitions()

  override def planInputPartitions(): Array[InputPartition] = partitions

  private def fetchPartitions(): Array[InputPartition] = {
    opts.get("body") match {
      case Some(body) =>
        Array(RestPartition(RestSource.normalizeBody(body).toArray))
      case None =>
        val urls = opts.get("urls").map(_.split(',').toSeq)
          .orElse(opts.get("url").map(Seq(_)))
          .getOrElse(throw new IllegalArgumentException(
            "graft-rest requires one of: url, urls, body"))
        val policy = RetryPolicy(
          maxRetries = opts.get("maxRetries").map(_.toInt).getOrElse(3),
          backoffMillis = opts.get("backoffMillis").map(_.toLong).getOrElse(1000L),
          minIntervalMillis = opts.get("minIntervalMillis").map(_.toLong).getOrElse(0L))
        val client = new RestClient(
          RestTableProvider.transportOverride.getOrElse(new JavaHttpTransport()), policy)
        // driver-side, serial, one token bucket — by design
        urls.map { u =>
          client.fetch(u) match {
            case Right(body) => RestPartition(RestSource.normalizeBody(body).toArray)
            case Left(err) => throw new RuntimeException(s"graft-rest fetch failed: ${err.message}")
          }
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = RestReaderFactory
}

object RestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val docs = partition.asInstanceOf[RestPartition].docs
      private var i = -1
      override def next(): Boolean = { i += 1; i < docs.length }
      override def get(): InternalRow = InternalRow(UTF8String.fromString(docs(i)))
      override def close(): Unit = ()
    }
}
