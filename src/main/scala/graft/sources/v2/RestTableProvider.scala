package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonFactory, JsonParser => JJsonParser}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => sstreaming}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{JavaHttpTransport, RestClient, RestSource, RetryPolicy, Transport}

/** DataSource V2 `TableProvider` for REST payloads:
  *
  *   spark.read.format("graft-rest").option("url", …).load()
  *   spark.read.format("graft-rest").schema(s).option("url", …).load()
  *   spark.readStream.format("graft-rest").option("url", …).load()
  *
  * Without a user schema, rows are one STRING column `value` (one row
  * per JSON document; top-level arrays split) for downstream
  * `from_json`. WITH a user schema, documents are parsed to typed
  * rows in the readers (Catalyst's JacksonParser — the same engine
  * behind `spark.read.json`), which unlocks real optimizer
  * integration:
  *
  *  - column pruning: only the projected fields are parsed
  *    (`SupportsPushDownRequiredColumns`),
  *  - filter pushdown INTO THE ENDPOINT: comparison predicates on
  *    columns mapped via `pushdown.<col>.<op>=<queryParam>` options
  *    (op ∈ eq,lt,lte,gt,gte) become request query parameters — e.g.
  *    `pushdown.match_id.lt=less_than_match_id` turns
  *    `WHERE match_id < X` into `?less_than_match_id=X`, the paging
  *    idiom of the reference's API. Pushed filters are still
  *    re-evaluated by Spark (endpoints are untrusted about their own
  *    filtering) — pushdown cuts bytes fetched, correctness never
  *    depends on it.
  *
  * Rate-limit-correct by construction: ALL fetching happens on the
  * DRIVER at scan-planning time, serially through one retrying
  * token-bucketed client (API limits are global — per-executor fetch
  * loops would multiply pressure; SURVEY §7.4). Each URL's payload
  * rides to executors INSIDE its `InputPartition`. Static request
  * parameters come from `param.<name>` options.
  *
  * Cursor paging (`page.param`, `page.cursorField`, optional
  * `page.dir`=desc|asc and `page.maxPages`): the scan iterates
  * cursor-advanced requests — each page one InputPartition — until an
  * empty page, a stuck cursor, or the page bound. E.g.
  * `page.param=less_than_match_id`, `page.cursorField=match_id` walks
  * the reference API's descending match pages.
  */
class RestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestTableProvider.rawSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(schema, properties.asScala.toMap)
}

object RestTableProvider {
  val rawSchema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Test seam: specs install a scripted transport here; `None` means
    * the real HTTP transport.
    */
  @volatile var transportOverride: Option[Transport] = None

  private[v2] def clientFrom(opts: Map[String, String]): RestClient =
    new RestClient(
      transportOverride.getOrElse(new JavaHttpTransport()),
      RetryPolicy(
        maxRetries = opts.get("maxRetries").map(_.toInt).getOrElse(3),
        backoffMillis = opts.get("backoffMillis").map(_.toLong).getOrElse(1000L),
        minIntervalMillis = opts.get("minIntervalMillis").map(_.toLong).getOrElse(0L)))

  private[v2] def staticParams(opts: Map[String, String]): Map[String, String] =
    opts.collect { case (k, v) if k.startsWith("param.") => k.stripPrefix("param.") -> v }
}

final class RestTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    props.get("url").orElse(props.get("urls")).getOrElse("inline-body")
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(tableSchema, props ++ options.asScala)
}

final class RestScanBuilder(tableSchema: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedParams: Map[String, String] = Map.empty
  private var pushedLimit: Option[Int] = None

  /** LIMIT pushdown stops the driver-side fetch early: the page walk
    * (and the multi-url loop) quits once `limit` documents are in
    * hand. `isPartiallyPushed` stays true (the default) so Spark
    * keeps its own Limit on top — over-fetch within the last page is
    * harmless, under-fetch impossible.
    */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true
  }

  /** col → (op → query param) from `pushdown.<col>.<op>` options. */
  private val mappings: Map[(String, String), String] =
    opts.collect { case (k, v) if k.startsWith("pushdown.") =>
      k.stripPrefix("pushdown.").split('.') match {
        case Array(c, op) => (c.toLowerCase, op.toLowerCase) -> v
        case _ => throw new IllegalArgumentException(s"bad pushdown option: $k")
      }
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val params = Seq.newBuilder[(String, String)]
    val accepted = Seq.newBuilder[Filter]
    filters.foreach { f =>
      val mapped = f match {
        case EqualTo(c, v)            => mappings.get((c.toLowerCase, "eq")).map(_ -> v)
        case LessThan(c, v)           => mappings.get((c.toLowerCase, "lt")).map(_ -> v)
        case LessThanOrEqual(c, v)    => mappings.get((c.toLowerCase, "lte")).map(_ -> v)
        case GreaterThan(c, v)        => mappings.get((c.toLowerCase, "gt")).map(_ -> v)
        case GreaterThanOrEqual(c, v) => mappings.get((c.toLowerCase, "gte")).map(_ -> v)
        case _                        => None
      }
      mapped.foreach { case (param, v) =>
        params += (param -> String.valueOf(v)); accepted += f
      }
    }
    pushedParams = params.result().toMap
    pushed = accepted.result().toArray
    // endpoints are untrusted about their own filtering: everything is
    // re-evaluated Spark-side; pushdown only shrinks the fetch
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RestScan(opts, required, pushedParams, pushedLimit)
}

final case class RestPartition(docs: Array[String]) extends InputPartition

final class RestScan(
    opts: Map[String, String],
    readSchemaV: StructType,
    pushedParams: Map[String, String],
    pushedLimit: Option[Int] = None) extends Scan with Batch {

  override def readSchema(): StructType = readSchemaV
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
        val client = RestTableProvider.clientFrom(opts)
        val params = RestTableProvider.staticParams(opts) ++ pushedParams
        // driver-side, serial, one token bucket — by design
        opts.get("page.param") match {
          case Some(cursorParam) =>
            val field = opts.getOrElse("page.cursorField",
              throw new IllegalArgumentException(
                "graft-rest paging requires page.cursorField"))
            val desc = !opts.get("page.dir").contains("asc")
            val maxPages = opts.get("page.maxPages").map(_.toInt).getOrElse(10)
            val budget = pushedLimit.getOrElse(Int.MaxValue)
            val out = Seq.newBuilder[InputPartition]
            var fetched = 0
            urls.iterator.takeWhile(_ => fetched < budget).foreach { u =>
              val pages = fetchPages(client, u, params, cursorParam, field, desc,
                maxPages, budget - fetched)
              pages.foreach { p =>
                out += p
                fetched += p.asInstanceOf[RestPartition].docs.length
              }
            }
            out.result().toArray
          case None =>
            val budget = pushedLimit.getOrElse(Int.MaxValue)
            val out = Seq.newBuilder[InputPartition]
            var fetched = 0
            // pushed LIMIT stops the url loop as soon as enough
            // documents are in hand (Spark re-applies the limit)
            urls.iterator.takeWhile(_ => fetched < budget).foreach { u =>
              client.fetch(u, params) match {
                case Right(body) =>
                  val docs = RestSource.normalizeBody(body).toArray
                  out += RestPartition(docs)
                  fetched += docs.length
                case Left(err) => throw new RuntimeException(s"graft-rest fetch failed: ${err.message}")
              }
            }
            out.result().toArray
        }
    }
  }

  /** Cursor-paged fetch loop, one InputPartition per page: page N+1
    * passes `cursorParam` = min (desc) / max (asc) of `field` over
    * page N's documents — the reference API's `less_than_match_id`
    * idiom (`opendotaapi.py:103` issues only the single unpaged GET;
    * the loop is what a full load actually needs). Stops on an empty
    * page, a missing/unchanged cursor, or the `maxPages` bound. If
    * filter pushdown already mapped a predicate to `cursorParam`, the
    * first page honors it and later pages advance past it.
    *
    * `page.cursorField` MUST be unique per row (the reference API's
    * match_id is): the next page strictly advances past the boundary
    * value, so rows SHARING the boundary that the server held back
    * would be skipped forever. A duplicated boundary inside one page
    * is detected and warned about; cross-page duplication is
    * undetectable client-side, hence the contract. The numeric-vs-
    * lexicographic comparison mode is pinned by the FIRST page — a
    * representation flip mid-walk (e.g. zero-padded ids appearing on
    * one page) would change ordering semantics and re-fetch or skip
    * pages, so it fails loudly instead.
    */
  private def fetchPages(
      client: graft.sources.RestClient, url: String,
      params: Map[String, String], cursorParam: String, field: String,
      desc: Boolean, maxPages: Int, docBudget: Int = Int.MaxValue): Seq[InputPartition] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var numericCursor: Option[Boolean] = None // pinned on first page
    def nextCursor(docs: Array[String]): Option[String] = {
      val vals = docs.toSeq.flatMap { d =>
        try {
          Option(mapper.readTree(d).get(field)).filterNot(_.isNull).map(_.asText)
        } catch { case _: com.fasterxml.jackson.core.JacksonException => None }
      }
      if (vals.isEmpty) None
      else {
        val numeric = numericCursor.getOrElse {
          val parses = vals.count(v => scala.util.Try(BigDecimal(v)).isSuccess)
          val m = parses == vals.size
          // a MIXED first page pins lexicographic mode over values
          // that look numeric — almost certainly a malformed row on a
          // numerically-ordered endpoint; say so instead of silently
          // string-comparing ids for the rest of the walk
          if (!m && parses > 0)
            System.err.println(
              s"[graft-rest] cursor field '$field' mixes numeric and non-numeric " +
                s"values on the first page ($parses/${vals.size} parse) — pinning " +
                "LEXICOGRAPHIC comparison for the whole walk; if the endpoint is " +
                "numerically ordered this will re-fetch or skip ranges")
          numericCursor = Some(m)
          m
        }
        val boundary =
          if (numeric) {
            val bd = vals.map(v => scala.util.Try(BigDecimal(v)).getOrElse(
              throw new IllegalStateException(
                s"graft-rest paging: cursor field '$field' switched from numeric to " +
                  s"non-numeric representation mid-walk (value '$v') — ordering would " +
                  "be inconsistent; fix the endpoint or use a lexicographic cursor")))
            (if (desc) bd.min else bd.max).bigDecimal.toPlainString
          } else if (desc) vals.min else vals.max
        val dupes = if (numeric) {
          val b = BigDecimal(boundary)
          vals.count(v => BigDecimal(v) == b)
        } else vals.count(_ == boundary)
        if (dupes > 1)
          System.err.println(
            s"[graft-rest] page.cursorField '$field' is not unique (boundary value " +
              s"'$boundary' appears $dupes times in one page) — rows sharing a page " +
              "boundary value may be skipped; use a unique cursor field")
        Some(boundary)
      }
    }
    val pages = Seq.newBuilder[InputPartition]
    var cursor: Option[String] = None
    var n = 0
    var got = 0
    var done = false
    while (!done && n < maxPages && got < docBudget) {
      val p = params ++ cursor.map(cursorParam -> _)
      client.fetch(url, p) match {
        case Right(body) =>
          val docs = RestSource.normalizeBody(body).toArray
          if (docs.isEmpty) done = true
          else {
            pages += RestPartition(docs)
            got += docs.length
            val next = nextCursor(docs)
            if (next.isEmpty || next == cursor) done = true else cursor = next
          }
        case Left(err) =>
          throw new RuntimeException(s"graft-rest fetch failed: ${err.message}")
      }
      n += 1
    }
    pages.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(readSchemaV)

  override def toMicroBatchStream(checkpointLocation: String): sstreaming.MicroBatchStream =
    new RestMicroBatchStream(opts, readSchemaV, checkpointLocation)
}

/** Polled REST micro-batch source: each trigger's `latestOffset()`
  * fetches the endpoint ONCE on the driver (same serial token-bucket
  * discipline as the batch scan) and advances a monotonically
  * increasing poll counter; the batch (start, end] replays exactly
  * the bodies captured for those polls.
  *
  * DURABLE REPLAY: a REST payload cannot be re-fetched by offset, so
  * every poll's body is written under the query's checkpoint location
  * BEFORE the offset is handed to the engine — an offset range the
  * checkpoint says is pending can always be replayed by a restarted
  * driver, from memory or from those files. A range whose payload is
  * truly gone (checkpoint files deleted out-of-band) THROWS instead
  * of fabricating an empty batch: silent data loss is the one failure
  * mode a streaming source must not have. The poll counter itself is
  * persisted (watermark file) so a restart never re-issues an offset,
  * even after commits have pruned the replay files.
  *
  * State is bounded on both sides: memory holds only uncommitted
  * bodies, and `commit(end)` prunes the replay files through `end`.
  */
final class RestMicroBatchStream(
    opts: Map[String, String], schema: StructType, checkpointLocation: String)
    extends sstreaming.MicroBatchStream {

  private case class PollOffset(n: Long) extends sstreaming.Offset {
    override def json(): String = n.toString
  }

  private val url = opts.getOrElse("url",
    throw new IllegalArgumentException("graft-rest streaming requires url"))
  private lazy val client = RestTableProvider.clientFrom(opts)
  private val params = RestTableProvider.staticParams(opts)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val bodiesDir =
    new org.apache.hadoop.fs.Path(checkpointLocation, "graft-rest-bodies")
  private val fs = bodiesDir.getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  private val watermarkPath =
    new org.apache.hadoop.fs.Path(bodiesDir, "watermark")
  private def bodyPath(n: Long) =
    new org.apache.hadoop.fs.Path(bodiesDir, s"poll-$n.json")

  /** Restart recovery: resume the counter past every offset this
    * checkpoint ever issued — max of the watermark (survives commit
    * pruning) and any replay file (survives a crash between body
    * write and watermark write).
    */
  private var polls: Long = {
    fs.mkdirs(bodiesDir)
    val bodyRe = "poll-([0-9]+)\\.json".r
    val fromFiles = fs.listStatus(bodiesDir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case bodyRe(n) => Some(n.toLong)
        case _ => None
      }
    }
    val fromWatermark =
      if (fs.exists(watermarkPath)) {
        val in = fs.open(watermarkPath)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      } else 0L
    (fromWatermark +: fromFiles).max
  }

  private val bodies = scala.collection.mutable.Map.empty[Long, Array[String]]

  private def writeFile(path: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Unit = {
    // temp + rename: a crashed half-write never masquerades as a poll
    val tmp = new org.apache.hadoop.fs.Path(bodiesDir, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"graft-rest: cannot persist $path")
  }

  private def readBody(n: Long): Option[Array[String]] =
    if (fs.exists(bodyPath(n))) {
      val in = fs.open(bodyPath(n))
      try Some(mapper.readValue(in: java.io.InputStream, classOf[Array[String]]))
      finally in.close()
    } else None

  override def initialOffset(): sstreaming.Offset = PollOffset(0L)
  override def deserializeOffset(json: String): sstreaming.Offset = PollOffset(json.toLong)

  override def latestOffset(): sstreaming.Offset = synchronized {
    client.fetch(url, params) match {
      case Right(body) =>
        val docs = RestSource.normalizeBody(body).toArray
        // durability BEFORE visibility: body file, then watermark,
        // then the in-memory map; only then is the offset observable
        writeFile(bodyPath(polls + 1), mapper.writeValueAsBytes(docs))
        writeFile(watermarkPath,
          String.valueOf(polls + 1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        polls += 1
        bodies(polls) = docs
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
    ((s + 1) to e).map { n =>
      val docs = bodies.get(n).orElse(readBody(n)).getOrElse(
        throw new IllegalStateException(
          s"graft-rest: offset range ($s, $e] needs poll $n but its payload is in " +
            s"neither memory nor $bodiesDir — refusing to replay an empty batch " +
            "(a REST payload cannot be re-fetched by offset; this range is lost)"))
      bodies(n) = docs
      RestPartition(docs): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema)

  override def commit(end: sstreaming.Offset): Unit = synchronized {
    val e = end.asInstanceOf[PollOffset].n
    bodies.keys.filter(_ <= e).toSeq.foreach(bodies.remove)
    // prune by directory listing, not the memory map — a restarted
    // stream committing a replayed batch has an empty map but files
    val bodyRe = "poll-([0-9]+)\\.json".r
    fs.listStatus(bodiesDir).foreach { st =>
      st.getPath.getName match {
        case bodyRe(n) if n.toLong <= e => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }

  override def stop(): Unit = ()
}

/** Executor-side readers. Raw schema emits documents as strings;
  * typed schemas run Catalyst's JacksonParser per document (only the
  * required/pruned fields are materialized).
  */
final class RestReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val docs = partition.asInstanceOf[RestPartition].docs
    if (schema == RestTableProvider.rawSchema)
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < docs.length }
        override def get(): InternalRow = InternalRow(UTF8String.fromString(docs(i)))
        override def close(): Unit = ()
      }
    else
      new PartitionReader[InternalRow] {
        private val parser = new JacksonParser(
          schema,
          new JSONOptions(Map.empty[String, String], "UTC"),
          allowArrayAsStructs = true,
          Nil)
        private val iter: Iterator[InternalRow] = docs.iterator.flatMap { doc =>
          parser.parse[String](
            doc,
            (jf: JsonFactory, s: String) => CreateJacksonParser.string(jf, s),
            (s: String) => UTF8String.fromString(s))
        }
        private var row: InternalRow = _
        override def next(): Boolean = {
          if (iter.hasNext) { row = iter.next(); true } else false
        }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
  }
}
