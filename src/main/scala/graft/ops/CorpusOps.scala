package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: the steps
  * between "deduplicated documents" and "token stream on the trainer" —
  * sampling, relevance ranking, sequence packing, rule-based filtering.
  *
  * Scale shapes:
  *  - sampling and filtering are NARROW passes (a filter over a hash or
  *    per-row metrics; no shuffle beyond presentation sort);
  *  - stratified quotas and packing use windows PARTITIONED by stratum,
  *    so every stratum proceeds in parallel;
  *  - TF-IDF is two partial-aggregating shuffles (token, then doc) —
  *    the canonical distributed formulation.
  *
  * Numeric portability (gate contract): ratios compared by integer
  * cross-multiplication where possible; scores that must be emitted as
  * doubles are single IEEE divisions of exact integers (exactly rounded
  * in every engine — only transcendentals are non-portable, which is
  * why tf-idf here uses a LINEAR idf, see [[tfidfTopTerms]]).
  */
object CorpusOps {

  /** Deterministic stratified sample: the `quota` hash-smallest
    * documents of each `source` stratum. Ordering by content hash
    * (md5 of normalized text, doc_id tiebreak) makes the sample
    *  - uniform within stratum (md5 is uniform),
    *  - reproducible under re-ingestion and row reordering, and
    *  - exact-quota per stratum (unlike Bernoulli sampling, which
    *    only hits the rate in expectation).
    * One window per stratum — strata sample in parallel; no global
    * sort, no driver-side anything.
    */
  def stratifiedSample(documents: DataFrame, quota: Int = 5): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), TextOps.fingerprint(col("text")).as("h"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= quota)
      .select("source", "rnk", "doc_id", "h")
      .orderBy("source", "rnk")
  }

  /** Top-k distinctive terms per document by tf·idf with a LINEAR idf
    * (score = tf/df): log-idf is order-equivalent per document when
    * ranking a single doc's terms only through df, but `ln` is not
    * bit-portable across engines (libm-dependent last ulp), while the
    * division of two exact small integers is exactly rounded IEEE —
    * identical everywhere. Ranking quality is the standard rare-term
    * preference either way.
    *
    * Plan: explode → (doc,term) count → df from the tf frame (one
    * partial-agg shuffle each, the second over ~|vocabulary| rows) →
    * per-doc ranking window. The df join is token-partitioned; AQE
    * broadcasts it when the realized vocabulary is small.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val w = documents.select(
      col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    val tf = w.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "score")
      .orderBy("doc_id", "rnk")
  }

  /** Sequence packing: concatenate each source's documents in doc_id
    * order and cut the token stream into fixed `seqLen` training
    * sequences; a document belongs to the sequence its FIRST token
    * lands in. Reports per (source, seq_id): docs, tokens, doc range —
    * the shard manifest a trainer's data loader consumes.
    *
    * One cumulative-sum window per source: strata pack in parallel,
    * and the window carries two longs per row. A single stratum too
    * large for one task generalizes to the two-phase prefix sum
    * (per-partition subtotals broadcast as range offsets) — same
    * numbers, one extra tiny shuffle; not needed at gate scale and the
    * per-source form keeps the plan portable.
    */
  def packSequences(documents: DataFrame, seqLen: Long = 512L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("offset") / seqLen).cast("long"))
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "seq_id")
  }

  /** Gopher-style rule-based quality filter: per-document pass/fail
    * flags plus the final keep decision. Rules (bounds fit the gate
    * corpus but are parameters in spirit):
    *  - token count within [minTokens, maxTokens];
    *  - mean token length within [3, 10] chars;
    *  - at least 2 DISTINCT stopwords present (the Gopher "has common
    *    English words" screen);
    *  - type-token ratio ≥ 0.2 (repetition screen).
    * All comparisons are integer cross-multiplications — `sum_len ≥
    * 3·n` instead of `sum_len/n ≥ 3.0` — so the report is exact on
    * every engine with zero float rounding anywhere. Single narrow
    * pass; the only exchange is the presentation sort.
    */
  def gopherFilter(
      documents: DataFrame,
      minTokens: Long = 20L, maxTokens: Long = 400L): DataFrame = {
    val toks = col("tk") // materialized once — see TextOps.shinglesFromTokens
    val stopList = lit(Array("the", "a", "of", "and", "is", "to", "in"))
    documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        size(array_intersect(array_distinct(toks), stopList)).cast("long").as("n_stop_uniq"))
      .select(
        col("doc_id"), col("n").as("n_tokens"),
        (col("n") >= minTokens && col("n") <= maxTokens).as("ok_len"),
        (col("sum_len") >= lit(3L) * col("n") &&
          col("sum_len") <= lit(10L) * col("n")).as("ok_word_len"),
        (col("n_stop_uniq") >= 2L).as("ok_stopwords"),
        (lit(5L) * col("n_uniq") >= col("n")).as("ok_ttr"))
      .withColumn("keep",
        col("ok_len") && col("ok_word_len") && col("ok_stopwords") && col("ok_ttr"))
      .orderBy("doc_id")
  }
}
