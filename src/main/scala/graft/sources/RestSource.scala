package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON payload → DataFrame ingestion.
  *
  * The reference tabularizes three payload shapes — list-of-dicts,
  * single dict, raw JSON string — with bounded schema inference
  * (`extract-data-dota.py:85-110`, `infer_schema_length=1000`). Here
  * the same tolerance lives in [[normalizeBody]] (shape handling) and
  * [[readJson]] (explicit schema preferred, sampled inference as the
  * fallback), but the tabular engine is Spark's JSON reader: the
  * payload becomes a `Dataset[String]` of one JSON document per row
  * and `spark.read.json` does the rest — so everything downstream is
  * a plain distributed DataFrame no matter which shape arrived.
  *
  * Jackson (already on Spark's classpath — Spark itself depends on
  * it) splits a top-level array WITHOUT deep-parsing each element;
  * elements are re-serialized verbatim for Spark's parser.
  */
object RestSource {

  private lazy val mapper = new ObjectMapper()

  /** list-of-docs → one string per element; single doc → singleton;
    * scalar/malformed → singleton passthrough (Spark's JSON reader
    * will surface it in the corrupt-record column if unparseable).
    */
  def normalizeBody(body: String): Seq[String] = {
    val trimmed = body.trim
    if (trimmed.startsWith("["))
      try {
        val node = mapper.readTree(trimmed)
        node.elements().asScala.map(_.toString).toSeq
      } catch {
        // unsplittable array → single row; Spark's PERMISSIVE reader
        // quarantines it in _corrupt_record instead of us throwing
        case _: com.fasterxml.jackson.core.JacksonException => Seq(trimmed)
      }
    else Seq(trimmed)
  }

  /** Parse a payload into a DataFrame. With `schema` the read is
    * deterministic (the preferred path — SURVEY.md §7.4 hazard 2);
    * without, inference samples like the reference's
    * infer_schema_length bound. Unparseable rows are quarantined in
    * `_corrupt_record` instead of failing the load.
    */
  def readJson(
      spark: SparkSession,
      body: String,
      schema: Option[StructType] = None,
      samplingRatio: Double = 1.0): DataFrame = {
    val ds: Dataset[String] = spark.createDataset(normalizeBody(body))(Encoders.STRING)
    val reader = spark.read
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema match {
      case Some(s) => reader.schema(s).json(ds)
      case None    => reader.option("samplingRatio", samplingRatio.toString).json(ds)
    }
  }

  /** Fetch an endpoint and tabularize it: the whole O-1→O-6 path.
    * Fetch errors surface as Left so orchestration can skip the
    * entity and continue (`extract-data-dota.py:130-199` semantics).
    */
  def read(
      spark: SparkSession,
      client: RestClient,
      url: String,
      params: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): Either[FetchError, DataFrame] =
    client.fetch(url, params).map(body => readJson(spark, body, schema))
}
