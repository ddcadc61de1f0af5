package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SQL-text front door for the LLM-DATA-PIPELINE surface: exact
  * dedup, MinHash-LSH near-dup detection, and cosine top-k retrieval
  * submitted as plain `spark.sql` text — the engine's native codegen
  * expressions (`graft_minhash_sig`, `graft_sorted_inter`,
  * `graft_dot`, registered by GraftExtensions) called straight from
  * user query strings, gated against the SAME DuckDB twins as the
  * library bodies (t23 / t25 / s31). `LlmSqlSpec` asserts
  * SQL-text ≡ DataFrame row-and-type-exact, closing the round-16
  * verdict gap: "the LLM operator surface is unreachable from SQL
  * text".
  *
  * Scale notes mirror the library bodies: the minhash text is the
  * banded-LSH shape (signatures are one codegen'd projection, the
  * candidate join runs on band keys — never all pairs), and the
  * top-k text broadcasts the bounded query set against the corpus
  * scan. Dialect rules carried from the q88+ suite: D-suffixed
  * fractional literals, BIGINT casts on every count-like output.
  */
object LlmSql {

  /** quant4 rendered as SQL text — identical to Exact.quant4. */
  private def q4(x: String): String =
    s"floor(($x)*10000.0D+0.5D)/10000.0D"

  private val needs: Map[String, Seq[String]] = Map(
    "exact_dedup" -> Seq("documents"),
    "minhash_lsh" -> Seq("documents"),
    "cosine_topk" -> Seq("embeddings"),
    "decontaminate_13gram" -> Seq("documents"))

  def run(spark: SparkSession, t: Tables, name: String): DataFrame = {
    TpchSql.registerViews(t, needs(name))
    spark.sql(sql(name))
  }

  /** One banded md5 key per band from the signature array `s`
    * (0-based SQL element access), matching the DataFrame body's
    * md5(concat_ws(",", h_i)) rule byte for byte. */
  private def bandStructs(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val elems = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(s[$i] AS STRING)").mkString(", ")
      s"named_struct('band', $b, 'bkey', md5(concat_ws(',', $elems)))"
    }.mkString(",\n        ")

  val sql: Map[String, String] = Map(
    // t23's exact dedup: normalized-text fingerprint, min-doc_id
    // canonical, is_dup flag — one hash groupBy, no pairwise work
    "exact_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))) AS fp
        |  FROM documents),
        |c AS (SELECT fp, min(doc_id) AS canonical_id FROM fp GROUP BY fp)
        |SELECT f.doc_id, c.canonical_id,
        |  f.doc_id <> c.canonical_id AS is_dup
        |FROM fp f JOIN c ON f.fp = c.fp ORDER BY f.doc_id""".stripMargin,
    // t25's MinHash-LSH near-dup pairs: the native signature
    // expression over sorted-distinct token sets, 4 bands × 4 rows,
    // band-key self-join for candidates, exact-Jaccard verify via the
    // native sorted-intersect — quantized and thresholded at 0.5.
    // NO canonical-set collapse — MEASURED, r18: the library body's
    // collapse was ported here (set-level sid/signatures/candidates,
    // doc expansion at the end; row-identical output, oracle green)
    // and LOST 1.9× (5.9 → 11.3 s min, shuffle 91 → 154 MB at sf0.1):
    // SQL text cannot persist the canonical-set frame (Spark inlines
    // CTEs), so every consumer re-tokenized the corpus and re-shuffled
    // the full token arrays through the set DISTINCT. The library API
    // (t25), which persistTracks those frames, stays the scale path.
    "minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, array_sort(array_distinct(
         |    regexp_extract_all(lower(text), '[a-z0-9]+', 0))) AS toks
         |  FROM documents),
         |nz AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS n
         |  FROM t WHERE size(toks) > 0),
         |sig AS (SELECT doc_id, graft_minhash_sig(toks, 16, 7) AS s FROM nz),
         |band AS (SELECT doc_id, bk.band AS band, bk.bkey AS bkey FROM sig
         |  LATERAL VIEW explode(array(
         |        ${bandStructs(4, 4)})) e AS bk),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |v AS (SELECT c.doc_a, c.doc_b,
         |  ${q4("CAST(graft_sorted_inter(ta.toks, tb.toks) AS DOUBLE)" +
              "/(ta.n + tb.n - graft_sorted_inter(ta.toks, tb.toks))")} AS jac
         |  FROM cand c JOIN nz ta ON ta.doc_id = c.doc_a
         |  JOIN nz tb ON tb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, jac FROM v WHERE jac >= 0.5D
         |ORDER BY doc_a, doc_b""".stripMargin,
    // s31's brute-force cosine top-k: queries (vec_id < 5) broadcast
    // against the corpus, native sequential-fold dot both for norms
    // and scores, quant6 rounding + vec_id tiebreak, k = 5
    "cosine_topk" ->
      """WITH e AS (SELECT vec_id,
        |    CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM e),
        |sc AS (SELECT /*+ BROADCAST(q) */ q.vec_id AS query_id,
        |    c.vec_id AS vec_id,
        |    floor(graft_dot(q.v, c.v)/(q.nrm*c.nrm)*1000000.0D+0.5D)
        |      /1000000.0D AS cos
        |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id >= 5),
        |r AS (SELECT query_id, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT query_id, rnk, vec_id, cos FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,
    // t243's exact 13-gram decontamination (the GPT-3 verbatim-leak
    // rule) with the identical in-query contamination planting: the
    // heldout grams stay DISTINCT and broadcast into a LEFT SEMI
    // JOIN, so the corpus side streams map-side with zero shuffle —
    // the same 100 TB shape the library body plans
    "decontaminate_13gram" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |esp AS (SELECT doc_id AS eid,
        |  array_join(slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0),
        |    1, 13), ' ') AS span
        |  FROM d WHERE doc_id % 20 = 0),
        |tp AS (SELECT d.doc_id, concat(d.text, ' ', esp.span) AS text
        |  FROM d JOIN esp ON esp.eid = (d.doc_id DIV 20) * 20
        |  WHERE d.doc_id % 20 <> 0 AND d.doc_id % 7 = 1),
        |corpus AS (SELECT doc_id, text FROM d
        |  WHERE doc_id NOT IN (SELECT doc_id FROM tp)
        |  UNION ALL SELECT doc_id, text FROM tp),
        |t AS (SELECT doc_id,
        |  regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS tk FROM corpus),
        |g AS (SELECT doc_id, explode(transform(sequence(1, size(tk) - 12),
        |    i -> concat_ws(' ', slice(tk, i, 13)))) AS ng
        |  FROM t WHERE size(tk) >= 13),
        |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 20 = 0),
        |h AS (SELECT /*+ BROADCAST(ev) */ g.doc_id,
        |    count(1) AS n_hit
        |  FROM g LEFT SEMI JOIN ev ON g.ng = ev.ng
        |  WHERE g.doc_id % 20 <> 0 GROUP BY g.doc_id)
        |SELECT t.doc_id, coalesce(h.n_hit, 0L) AS n_hit_grams,
        |  coalesce(h.n_hit, 0L) > 0L AS contaminated
        |FROM t LEFT JOIN h ON h.doc_id = t.doc_id
        |WHERE t.doc_id % 20 <> 0 ORDER BY t.doc_id""".stripMargin)
}
