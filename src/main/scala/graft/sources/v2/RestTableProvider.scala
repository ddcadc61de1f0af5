package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => sstreaming}
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
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
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

  override def toMicroBatchStream(checkpointLocation: String): sstreaming.MicroBatchStream =
    new RestMicroBatchStream(opts)
}

/** Polled REST micro-batch source: each trigger's `latestOffset()`
  * fetches the endpoint ONCE on the driver (same serial token-bucket
  * discipline as the batch scan) and advances a monotonically
  * increasing poll counter; the batch (start, end] replays exactly
  * the bodies captured for those polls. Committed polls are dropped
  * from the driver-side buffer, so state is bounded by
  * (uncommitted triggers × payload size).
  */
final class RestMicroBatchStream(opts: Map[String, String])
    extends sstreaming.MicroBatchStream {

  private case class PollOffset(n: Long) extends sstreaming.Offset {
    override def json(): String = n.toString
  }

  private val url = opts.getOrElse("url",
    throw new IllegalArgumentException("graft-rest streaming requires url"))
  private lazy val client = new RestClient(
    RestTableProvider.transportOverride.getOrElse(new JavaHttpTransport()),
    RetryPolicy(
      maxRetries = opts.get("maxRetries").map(_.toInt).getOrElse(3),
      backoffMillis = opts.get("backoffMillis").map(_.toLong).getOrElse(1000L),
      minIntervalMillis = opts.get("minIntervalMillis").map(_.toLong).getOrElse(0L)))

  private var polls = 0L
  private val bodies = scala.collection.mutable.Map.empty[Long, Array[String]]

  override def initialOffset(): sstreaming.Offset = PollOffset(0L)
  override def deserializeOffset(json: String): sstreaming.Offset = PollOffset(json.toLong)

  override def latestOffset(): sstreaming.Offset = synchronized {
    client.fetch(url) match {
      case Right(body) =>
        polls += 1
        bodies(polls) = RestSource.normalizeBody(body).toArray
      case Left(err) =>
        // a failed poll advances nothing; the next trigger retries
        System.err.println(s"[graft-rest] poll failed: ${err.message}")
    }
    PollOffset(polls)
  }

  override def planInputPartitions(
      start: sstreaming.Offset, end: sstreaming.Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[PollOffset].n
    val e = end.asInstanceOf[PollOffset].n
    ((s + 1) to e).flatMap(bodies.get).map(RestPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = RestReaderFactory

  override def commit(end: sstreaming.Offset): Unit = synchronized {
    val e = end.asInstanceOf[PollOffset].n
    bodies.keys.filter(_ <= e).toSeq.foreach(bodies.remove)
  }

  override def stop(): Unit = ()
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
