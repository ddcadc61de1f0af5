package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Module-scoped ledger for mid-plan persists ([[graft.core.GraftCaches]]):
    * releasing another module's caches can never free these (the
    * prefix-sum chunk frame pins `spark_partition_id`s — a mid-flight
    * free would recompute them inconsistently and corrupt offsets).
    */
  private val ledger = graft.core.GraftCaches.newLedger()

  /** Unpersist every frame the corpus pipelines persisted mid-plan;
    * call AFTER the terminal action on the pipeline result.
    */
  def releaseCaches(): Unit = ledger.release()

  /** Deterministic stratified sample: the `quota` hash-smallest
    * documents of each `source` stratum. Ordering by content hash
    * (md5 of normalized text, doc_id tiebreak) makes the sample
    *  - uniform within stratum (md5 is uniform),
    *  - reproducible under re-ingestion and row reordering, and
    *  - exact-quota per stratum (unlike Bernoulli sampling, which
    *    only hits the rate in expectation).
    *
    * Scale shape: the ranking window never sees the stratum — a
    * hash-bound pre-filter ([[hashBounded]], exact by construction)
    * first cuts each stratum to ~quota survivors, so the one-task-
    * per-stratum sort ranks a handful of rows however large the
    * source is. No global sort, no driver-side anything.
    */
  def stratifiedSample(documents: DataFrame, quota: Int = 5): DataFrame = {
    val h = documents
      .select(col("doc_id"), col("source"), TextOps.fingerprint(col("text")).as("h"))
    val w = Window.partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    hashBounded(h, quota)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= quota)
      .select("source", "rnk", "doc_id", "h")
      .orderBy("source", "rnk")
  }

  /** INCREMENTAL [[stratifiedSample]]: fold a new shard into a
    * maintained sample without rescanning history. The index IS the
    * previous sample — (source, doc_id, h), ≤quota rows per stratum —
    * and the greedy property of hash-smallest selection makes the
    * fold EXACT: the quota hash-smallest of (history ∪ shard) are
    * always contained in (quota hash-smallest of history) ∪ shard,
    * so re-ranking the tiny index against the hash-bounded shard
    * reproduces the one-shot full-corpus sample bit-for-bit (gated:
    * t110's twin IS t52's full-corpus SQL). The daily loop: take
    * today's output as tomorrow's index.
    */
  def incrementalStratifiedSample(
      shard: DataFrame, index: DataFrame, quota: Int = 5): DataFrame = {
    val sh = shard.select(
      col("doc_id"), col("source"), TextOps.fingerprint(col("text")).as("h"))
    val all = index.select("doc_id", "source", "h")
      .unionByName(hashBounded(sh, quota).select("doc_id", "source", "h"))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    all
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= quota)
      .select("source", "rnk", "doc_id", "h")
      .orderBy("source", "rnk")
  }

  /** EXACT pre-filter for per-stratum hash-smallest selection: keep
    * only rows whose 16-bit hash prefix lands at or below the
    * smallest bucket boundary where the stratum's cumulative count
    * reaches `quota`. Because bucket order equals hash-prefix order
    * (fixed-width lowercase hex compares identically as string and as
    * integer), the kept set is prefix-closed and provably contains
    * the quota hash-smallest rows; overshoot is bounded by one
    * bucket's load (~stratum/65536 under md5 uniformity). Strata
    * with fewer than `quota` rows keep everything (the boundary
    * defaults to the last occupied bucket).
    *
    * Cost: one partial-aggregating shuffle over (source, bucket) —
    * at most |sources|·65536 rows after combine — plus a broadcast
    * of the per-source thresholds. The full-width window this
    * replaces sorted EVERY row of a stratum in ONE task; this sorts
    * ~quota rows per stratum.
    */
  private[ops] def hashBounded(h: DataFrame, quota: Int,
      stratum: String = "source"): DataFrame = {
    // persisted (tracked): the bucket-count pass and the survivor
    // filter both read this frame — without the persist each would
    // re-scan and re-hash the corpus text; cached it is ~50 bytes/row
    val bucketed = ledger.persist(
      h.withColumn("bucket",
        conv(substring(col("h"), 1, 4), 16, 10).cast("int")))
    val wc = Window.partitionBy(stratum).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = bucketed.groupBy(stratum, "bucket").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wc))
      .groupBy(stratum)
      .agg(coalesce(
        min(when(col("cum") >= quota, col("bucket"))),
        max(col("bucket"))).as("thr"))
    bucketed.join(broadcast(thr), stratum)
      .filter(col("bucket") <= col("thr"))
      .drop("bucket", "thr")
  }

  /** CLUSTER-BALANCED sampling: [[stratifiedSample]]'s deterministic
    * content-hash selection with [[topicClusters]]' assignment as the
    * stratum — `quota` docs per TOPIC instead of per source. The
    * curation move that stops one dominant topic (boilerplate-heavy
    * crawl chrome, one vertical) from monopolizing a budgeted
    * subsample: every cluster contributes equally, however skewed the
    * corpus. Same exactness story as t52 — the hash-bound pre-filter
    * is provably lossless, the per-cluster window sorts ~quota rows.
    *
    * Output: (cid, rnk, doc_id, h) — the selected manifest.
    */
  def clusterBalancedSample(documents: DataFrame, quota: Int = 5,
      nCells: Int = 8, dim: Int = 64): DataFrame = {
    val h = topicClusters(documents, nCells, dim)
      .select(col("doc_id"), col("cid"))
      .join(documents.select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("h")), "doc_id")
    val w = Window.partitionBy("cid").orderBy(col("h"), col("doc_id"))
    hashBounded(h, quota, stratum = "cid")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= quota)
      .select("cid", "rnk", "doc_id", "h")
      .orderBy("cid", "rnk")
  }

  /** SOURCE-OVERLAP matrix: content Jaccard between every pair of
    * SOURCES over their distinct normalized-fingerprint sets — the
    * "is src7 a mirror of src3" question a mixture designer asks
    * before assigning per-source budgets (double-counting a mirrored
    * source silently doubles its weight). The equi-join is on the
    * 16-byte fingerprint, the aggregate collapses to ≤|sources|²
    * rows, and the Jaccard division sees exact integer operands.
    */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val sf = documents
      .select(col("source"), TextOps.fingerprint(col("text")).as("fp"))
      .distinct()
    val sizes = sf.groupBy("source").agg(count(lit(1)).as("n"))
    sf.as("a").join(sf.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        Exact.quant4(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter"))).as("jac"))
      .orderBy("src_a", "src_b")
  }

  /** SNAPSHOT DIFF between two crawls of the same id space — the
    * re-crawl report a monthly pipeline publishes before replacing a
    * corpus: per doc_id, `added` (new id), `removed` (id gone),
    * `changed` (same id, different content fingerprint), or
    * `unchanged`. Content comparison is by [[TextOps.fingerprint]]
    * (16-byte md5 of normalized text), so the full-outer join
    * shuffles fingerprints + ids, never document text, and
    * normalization noise (case/punctuation churn) doesn't count as
    * change. One full-outer equi-join on doc_id; both sides
    * partial-project to (doc_id, fp) at the scan.
    */
  def corpusDiff(before: DataFrame, after: DataFrame): DataFrame = {
    def fps(d: DataFrame, fp: String) =
      d.select(col("doc_id"), TextOps.fingerprint(col("text")).as(fp))
    fps(before, "fp_a").join(fps(after, "fp_b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") === col("fp_b"), "unchanged")
          .otherwise("changed").as("status"))
      .orderBy("doc_id")
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

  /** Hashed TF-IDF document vectors: a `dim`-dimensional dense vector
    * per document — term weights tf·(N − df) folded into md5-hashed
    * buckets (the hashing trick: fixed dimensionality at any
    * vocabulary, the same device the t74 classifier uses) — bridging
    * the text side of the engine to the vector side: the output
    * composes directly with cosine top-k / ANN / clustering, giving
    * embedding-free semantic search over raw documents.
    *
    * Portability (the gate contract): a bucket's weight is
    * Σ tf·(N − df) — every factor an exact integer, so the SUM is
    * order-independent — with the single IEEE division by N deferred
    * to the very end. (A per-term double idf would make bucket sums
    * depend on Spark's reduction order and break the bit-exact
    * oracle; the common denominator is what makes hashed tf-idf
    * hashable.) Linear idf, like [[tfidfTopTerms]].
    *
    * Scale shape: two partial-agg shuffles (term tf, then bucket
    * fold), a vocabulary-sized df join (AQE broadcasts it when
    * small), the corpus total as a broadcast one-row frame, and a
    * per-doc map assembly — no stage is wider than the token
    * explode. Documents with no tokens produce no row.
    */
  def hashedTfIdfVectors(documents: DataFrame, dim: Int = 64): DataFrame = {
    val tf = termFrequencies(documents)
    hashedTfIdfVectorsFrom(
      tf, tf.groupBy("term").agg(count(lit(1)).as("df")),
      documents.agg(count(lit(1)).as("n_docs")), dim)
  }

  /** (doc_id, term, tf) — the corpus term statistics both the vector
    * assembly and [[tfidfSearch]]'s query weighting derive from.
    */
  private def termFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** [[hashedTfIdfVectors]] from precomputed tf/df/count frames — the
    * reuse seam for callers that already hold the term statistics
    * ([[tfidfSearch]] persists tf once and feeds both the corpus
    * vectors and the query weights from it, so the corpus is
    * tokenized exactly once per search).
    */
  private def hashedTfIdfVectorsFrom(
      tf: DataFrame, df: DataFrame, nDocs: DataFrame, dim: Int): DataFrame = {
    val bucket = conv(substring(md5(col("term")), 1, 15), 16, 10)
      .cast("long") % dim
    val bw = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("n_docs"), bucket.as("b"),
        (col("tf") * (col("n_docs") - col("df"))).as("num"))
      .groupBy("doc_id", "n_docs", "b")
      .agg(sum("num").as("num"))
    bw.groupBy("doc_id", "n_docs")
      .agg(map_from_entries(collect_list(struct(col("b"), col("num")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(element_at(col("m"), i.cast("long")), lit(0L)).cast("double")
            / col("n_docs")).as("vec"))
      .orderBy("doc_id")
  }

  /** Embedding-free semantic search, end-to-end: top-k documents for
    * a literal query string by cosine over [[hashedTfIdfVectors]] —
    * the composition that makes the s46 text→vector bridge a search
    * engine with no model in the loop. The query is tokenized with
    * the corpus tokenizer, weighted with the CORPUS's idf statistics
    * (tf_q·(N−df); terms unseen in the corpus drop out, standard
    * idf behavior), and folded into the same md5 buckets.
    *
    * Portability: query-vector components stay exact INTEGERS
    * (cosine is scale-invariant, so the /N division the corpus side
    * carries is simply skipped — no float arithmetic until the
    * fold); the cosine is the sequential-fold dot over both arrays
    * (bit-identical across engines, the s31 contract) and is
    * quantized before ranking so order is stable under float noise.
    *
    * Scale shape: one broadcast one-row query vector against the
    * corpus vector frame — a narrow pass — and the final top-k is
    * orderBy+limit, which compiles to TakeOrderedAndProject (per-
    * partition heaps + driver merge of k), never a global sort. The
    * corpus is tokenized ONCE (the tf frame persists; vectors and
    * query weights both derive from it); a serving deployment
    * persists the (term, df) frame and the vectors across queries.
    */
  def tfidfSearch(
      documents: DataFrame, query: String, k: Int = 10,
      dim: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val tf = ledger.persist(termFrequencies(documents))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val vecs = hashedTfIdfVectorsFrom(tf, df, nDocs, dim)
    val bucket = conv(substring(md5(col("term")), 1, 15), 16, 10)
      .cast("long") % dim
    val qv = Seq(query).toDF("qtext")
      .select(explode(TextOps.tokens(col("qtext"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .join(df, "term")
      .crossJoin(broadcast(nDocs))
      .select(bucket.as("b"), (col("tf") * (col("n_docs") - col("df"))).as("num"))
      .groupBy("b").agg(sum("num").as("num"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("num")))).as("m"))
      .select(transform(sequence(lit(0), lit(dim - 1)), i =>
        coalesce(element_at(col("m"), i.cast("long")), lit(0L)).cast("double")).as("qv"))
    vecs.crossJoin(broadcast(qv))
      .withColumn("na", Similarity.norm(col("vec")))
      .withColumn("nb", Similarity.norm(col("qv")))
      .filter(col("na") > 0 && col("nb") > 0)
      .withColumn("score",
        Exact.quant6(Similarity.dot(col("vec"), col("qv")) / (col("na") * col("nb"))))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("rnk", "doc_id", "score")
  }

  /** Embedding-free TOPIC CLUSTERING: every document assigned to its
    * argmax-cosine seed centroid over the [[hashedTfIdfVectors]]
    * space — the curation primitive behind cluster-balanced sampling
    * and per-topic corpus cards, with no model in the loop. Seed
    * centroids are the first `nCells` documents' vectors (the
    * deterministic s42/s35 contract — [[graft.ops.Similarity]]'s
    * Lloyd machinery drops in for production tightening exactly as in
    * semanticDedup, at the cost of gate-exactness only).
    *
    * Zero-norm vectors (every term ubiquitous → all buckets 0) are
    * excluded from both the corpus side and the seed window — cosine
    * is undefined for them.
    *
    * Scale shape: the ≤nCells-row centroid table broadcasts; the
    * corpus makes ONE narrow pass (crossJoin against nCells rows +
    * a doc-partitioned argmax window over nCells candidates per doc);
    * cosine is the sequential-fold dot quantized to 6 dp before
    * ranking (the s31 portability contract).
    *
    * Output: (doc_id, cid, cos) — cid is the seed doc's id.
    */
  def topicClusters(documents: DataFrame, nCells: Int = 8,
      dim: Int = 64): DataFrame = {
    require(nCells > 0, "nCells must be positive")
    val vecs = ledger.persist(
      hashedTfIdfVectors(documents, dim)
        .withColumn("nrm", Similarity.norm(col("vec")))
        .filter(col("nrm") > 0))
    val seed = vecs.orderBy("doc_id").limit(nCells)
      .select(col("doc_id").as("cid"), col("vec").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("doc_id").orderBy(col("sim").desc, col("cid"))
    vecs.crossJoin(broadcast(seed))
      .withColumn("sim",
        Similarity.dot(col("vec"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cid"),
        Exact.quant6(col("sim")).as("cos"))
      .orderBy("doc_id")
  }

  /** BM25-shaped retrieval — what the cosine path ([[tfidfSearch]])
    * lacks: TERM-FREQUENCY SATURATION (the 10th occurrence of a query
    * term adds almost nothing) and LENGTH NORMALIZATION (a term hit
    * in a short doc outweighs one in a long doc). Standard BM25 at
    * k1 = 1.2, b = 0.75 scores a matching (doc, term) as
    * idf · tf·(k1+1) / (tf + k1·(1−b + b·len/avglen)); here the
    * constants are cleared to exact integers (multiply num and den by
    * 20·SL, where SL = corpus token count and avglen = SL/N):
    *
    *   score_term = 44·(N−df)·tf·SL / (20·tf·SL + 6·SL + 18·len·N)
    *
    * with the linear (N−df) idf of the s46/s47 precedent (engine
    * log() is last-ulp unportable; linear keeps the gate exact).
    * Every factor is an exact integer-valued double (products ≪ 2^53
    * at gate scale — production would move idf back to log space and
    * lose gate-exactness, nothing else), so the ONE division per
    * (doc, term) sees identical operands in every engine; its result
    * is floor-quantized to a 6-dp INTEGER and the per-doc sum is
    * integer — order-free — with the /10⁶ deferred to the end.
    *
    * Scale shape: the vocabulary-sized df table is filtered to the
    * query's terms BEFORE joining the corpus, so the corpus-side join
    * is one broadcast of ≤|query| rows against tf; doc lengths join
    * doc-keyed; the two corpus totals broadcast as one row. Top-k via
    * the TakeOrderedAndProject tail shared with [[tfidfSearch]].
    */
  def bm25Search(documents: DataFrame, query: String, k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bm25SearchBatch(documents, Seq((0L, query)).toDF("query_id", "qtext"), k)
      .select("rnk", "doc_id", "score")
  }

  /** BM25 over a QUERY TABLE — the serving-tier batch form: a frame
    * of (query_id, qtext) rows is scored against ONE corpus pass
    * instead of re-tokenizing and re-statisticizing the corpus per
    * query. Identical arithmetic to the single-query contract per
    * (query, doc) — [[bm25Search]] IS this with one query row, so
    * there is a single source of truth for the scoring formula.
    *
    * Scale shape: the corpus statistics (tf / per-doc lengths / the
    * one-row totals) are computed once for the whole batch; the
    * (query_id, term, df) table — at most Σ|query terms| rows, tiny
    * at any corpus size — BROADCASTS onto tf, so the corpus-side
    * work stays one broadcast-hash join however many queries ride
    * together. Per-query top-k is a query_id-partitioned rank window
    * over the matched-doc aggregate, which is bounded by candidate
    * matches (docs sharing ≥1 query term), never the corpus.
    */
  def bm25SearchBatch(documents: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame =
    bm25SearchIndexed(queries, bm25IndexFrames(documents), k)

  /** The BM25 SEARCH INDEX: the corpus term statistics scoring needs
    * — (doc_id, term, tf) postings, per-doc lengths, and the one-row
    * corpus totals — materialized once so serving never re-tokenizes
    * the corpus. Per-term df is NOT stored: it equals the posting
    * count per term, and the serving path counts it over the
    * query-filtered postings (broadcast-small), so the index carries
    * no second table that appends could drift out of sync.
    */
  final case class Bm25Index(tf: DataFrame, lens: DataFrame, totals: DataFrame)

  def bm25IndexFrames(documents: DataFrame): Bm25Index = {
    val tf = ledger.persist(termFrequencies(documents))
    val lens = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    Bm25Index(tf, lens,
      lens.agg(sum("len").as("sl"), count(lit(1)).as("nd")))
  }

  /** EXACT incremental index maintenance: fold a new shard's index
    * into the corpus index without rescanning history text. Doc_ids
    * disjoint by contract, so postings and lengths union disjointly;
    * totals add as integers. Because serving derives df by COUNTING
    * postings, the merged index scores identically to an index built
    * from the full corpus in one shot (gated: t117's twin is s55's
    * full-corpus SQL verbatim) — df, idf, and length normalization
    * all shift corpus-wide the moment a shard lands, exactly as a
    * rebuild would.
    */
  def mergeBm25Index(a: Bm25Index, b: Bm25Index, checkIds: Boolean = true): Bm25Index = {
    // checkIds = false skips the eager disjointness semi-join for hot
    // per-shard loops where the shards structurally slice one id space
    if (checkIds)
      graft.ops.Dedup.requireDisjointIds(a.lens, b.lens, "doc_id", "mergeBm25Index")
    Bm25Index(
      a.tf.unionByName(b.tf),
      a.lens.unionByName(b.lens),
      a.totals.crossJoin(b.totals.withColumnRenamed("sl", "sl2")
          .withColumnRenamed("nd", "nd2"))
        .select((col("sl") + col("sl2")).as("sl"), (col("nd") + col("nd2")).as("nd")))
  }

  /** Persist the index: postings bucketed by term (the probe and the
    * df count both key on term), lengths by doc_id (the join key),
    * the one-row totals alongside. Append a shard with
    * [[mergeBm25Index]] + an append-mode writer, or rewrite — either
    * serves identically (spec-proven round trip).
    */
  def writeBm25Index(index: Bm25Index, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit = {
    writer.commitBucketed(index.tf, s"${name}_tf", buckets, Seq("term"),
      replace = writer.replaces)
    writer.commitBucketed(index.lens, s"${name}_lens", buckets, Seq("doc_id"),
      replace = writer.replaces)
    writer.commitBucketed(index.totals, s"${name}_totals", 1, Seq("nd"),
      replace = writer.replaces)
  }

  def readBm25Index(spark: org.apache.spark.sql.SparkSession,
      name: String): Bm25Index =
    Bm25Index(
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_tf"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_lens"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_totals"))

  /** BM25 serving over a prepared (or merged) index — the online half
    * of [[bm25SearchBatch]], which is now this code over a one-shot
    * index. The corpus-side join broadcasts the ≤Σ|query terms| df
    * table onto the postings; per-query top-k by a partitioned rank
    * window over candidate matches.
    */
  def bm25SearchIndexed(queries: DataFrame, index: Bm25Index,
      k: Int = 10): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(TextOps.tokens(col("qtext"))).as("term"))
      .distinct()
    val qdf = index.tf.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .join(broadcast(qterms), Seq("term"))
    index.tf.join(broadcast(qdf), Seq("term"))
      .join(index.lens, Seq("doc_id"))
      .crossJoin(broadcast(index.totals))
      .withColumn("ts", floor(
        (lit(44.0) * (col("nd") - col("df")) * col("tf") * col("sl")) /
          (lit(20.0) * col("tf") * col("sl") + lit(6.0) * col("sl")
            + lit(18.0) * col("len") * col("nd"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id").agg(sum("ts").as("sts"))
      .withColumn("score", col("sts").cast("double") / lit(1000000.0))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy("query_id", "rnk")
  }

  /** Sequence packing: concatenate each source's documents in doc_id
    * order and cut the token stream into fixed `seqLen` training
    * sequences; a document belongs to the sequence its FIRST token
    * lands in. Reports per (source, seq_id): docs, tokens, doc range —
    * the shard manifest a trainer's data loader consumes.
    *
    * Offsets come from the TWO-PHASE prefix sum ([[tokenOffsets]]),
    * never a per-source window: a 10 TB single-source corpus packs
    * across every core instead of serializing into one window task.
    */
  def packSequences(documents: DataFrame, seqLen: Long = 512L): DataFrame =
    packManifest(
      documents.select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
      Seq("source"), seqLen)

  /** Manifest over a slim (strata…, doc_id, n_tokens) frame: global
    * offsets → seq_id → per-sequence stats. Strata-generic so the
    * corpus-build capstone can pack per (source, split).
    */
  private[ops] def packManifest(
      slim: DataFrame, strata: Seq[String], seqLen: Long,
      parts: Int = 0): DataFrame = {
    val keys = strata.map(col) :+ col("seq_id")
    tokenOffsets(slim, strata, parts)
      .withColumn("seq_id", floor(col("offset") / seqLen).cast("long"))
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy(keys: _*)
  }

  /** Per-document global token offset within its stratum's doc_id-
    * ordered stream, as a TWO-PHASE PREFIX SUM — the distributed
    * formulation of a running total that a `Window.partitionBy(
    * stratum)` cannot give (one stratum = one window task = one
    * straggler at 100×):
    *
    *  1. range-repartition by (strata…, doc_id) into `parts` chunks,
    *     so chunk order equals global order and every chunk is
    *     ~equal-sized REGARDLESS of stratum skew;
    *  2. local running sums per chunk (window by chunk id — `parts`
    *     parallel tasks, each over rows/parts rows);
    *  3. per (chunk, stratum) subtotals — a tiny aggregate, at most
    *     parts·|strata| rows — cumulated into per-chunk base offsets
    *     by a window over that TINY frame and broadcast back;
    *  4. global offset = local cumsum − own tokens + chunk base.
    *
    * Same numbers as the windowed form (asserted in CorpusOpsSpec),
    * three extra exchanges, all either full-parallel or bounded by
    * parts·|strata|. The range exchange is computed once — both the
    * local-sum window and the subtotal aggregate read it, and Spark's
    * ReuseExchange collapses the duplicate subtree.
    *
    * Output keeps the chunk id (`pid`) so the spec can assert >1 task
    * carried a single-stratum corpus; callers drop it via groupBy.
    */
  private[ops] def tokenOffsets(
      slim: DataFrame, strata: Seq[String], parts: Int = 0): DataFrame = {
    val nParts =
      if (parts > 0) parts
      else slim.sparkSession.sessionState.conf.numShufflePartitions
    val ord = strata.map(col) :+ col("doc_id")
    // persisted (tracked — GraftCaches releases it): BOTH phases must
    // see the IDENTICAL chunk assignment, and `spark_partition_id()`
    // evaluated in two separate consumers of the range exchange is not
    // guaranteed consistent (AQE may replan each consumer; measured:
    // scrambled base offsets at sf0.01). One materialization of the
    // slim (strata, doc_id, n_tokens, pid) frame pins the chunking —
    // the honest cost of any two-phase prefix sum.
    val ranged = ledger.persist(
      slim.repartitionByRange(nParts, ord: _*)
        .withColumn("pid", spark_partition_id()))
    // local sums are per (chunk, stratum) — a chunk spans multiple
    // strata and a chunk-wide running total would leak the earlier
    // strata's tokens into the later ones' offsets
    val wLocal = Window.partitionBy(col("pid") +: strata.map(col): _*)
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("cum", sum("n_tokens").over(wLocal))
    // chunk base offsets: subtotals of every EARLIER chunk touching
    // the same stratum (range partitioning guarantees "earlier chunk"
    // == "earlier rows in (strata, doc_id) order")
    val wPrev = Window.partitionBy(strata.map(col): _*).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = ranged.groupBy(col("pid") +: strata.map(col): _*)
      .agg(sum("n_tokens").as("subtotal"))
      .withColumn("base", coalesce(sum("subtotal").over(wPrev), lit(0L)))
      .select(col("pid") +: strata.map(col) :+ col("base"): _*)
    local.join(broadcast(bases), "pid" +: strata)
      .withColumn("offset", col("cum") - col("n_tokens") + col("base"))
      .drop("cum", "base")
  }

  /** SYSTEMATIC PPS SAMPLE — exactly `k` draws with probability
    * proportional to an integer size/weight (tokens, bytes, clicks):
    * the classic weighted corpus subsample where hash-Bernoulli rates
    * give binomial counts and [[Relational.reservoirK]] is uniform.
    * Fully deterministic (no randomness: the grid anchors at stratum
    * midpoints — "systematic sampling with implicit stratification",
    * Madow 1949, public): rows ordered by unique `id` lay their
    * weights end-to-end on [0, W); draw j selects the row covering
    * grid point ⌊W·(2j+1)/(2k)⌋. A row heavier than W/k can be drawn
    * multiple times — correct PPS-with-multiplicity semantics, the
    * multiplicity IS its weight share.
    *
    * Scale shape: the global cumulative weight comes from the SAME
    * two-phase prefix sum as [[tokenOffsets]] (range-partition,
    * in-chunk window, broadcast base offsets — no global sort-window
    * over facts); the k-row grid broadcasts into a containment join
    * (O(n·k) predicate work, zero extra shuffle — k ≪ n always).
    * Grid arithmetic runs in DECIMAL(38,0) so W·(2k−1) can't
    * overflow. Output: (sample_ord, id, w), exactly k rows.
    */
  def ppsSystematic(df: DataFrame, id: Column, wInt: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    val slim = df.select(id.cast("long").as("id"), wInt.cast("long").as("w"))
    val nParts = spark.sessionState.conf.numShufflePartitions
    val ranged = ledger.persist(slim.repartitionByRange(nParts, col("id"))
      .withColumn("pid", spark_partition_id()))
    val wLocal = Window.partitionBy("pid").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("cum", sum("w").over(wLocal))
    // the only unpartitioned window runs over ≤|chunks| subtotal rows
    val wPrev = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = ranged.groupBy("pid").agg(sum("w").as("subtotal"))
      .withColumn("base", coalesce(sum("subtotal").over(wPrev), lit(0L)))
      .select("pid", "base")
    val cum = local.join(broadcast(bases), "pid")
      .withColumn("hi", col("cum") + col("base"))
      .withColumn("lo", col("hi") - col("w"))
    // one-row driver probe of the grand total: W ≤ 0 (empty input or
    // all-zero weights) makes every grid interval empty — the promise
    // is "exactly k rows", so the degenerate case must FAIL LOUDLY
    // (the reservoirK/ancestorClosure discipline), never return 0 rows
    val wtotRow = cum.agg(max("hi").as("wtot")).head()
    require(!wtotRow.isNullAt(0) && wtotRow.getLong(0) > 0L,
      "ppsSystematic: total weight must be positive — empty input or " +
        "all-zero weights cannot yield an exactly-k PPS sample")
    val wtot = wtotRow.getLong(0)
    val grid = spark.range(k.toLong).select(col("id").as("j"))
      .select(col("j"), expr(
        s"CAST((CAST($wtot AS DECIMAL(38,0)) * (2*j + 1)) div ${2L * k} " +
          "AS BIGINT)").as("g"))
    cum.join(broadcast(grid), col("g") >= col("lo") && col("g") < col("hi"))
      .select(col("j").as("sample_ord"), col("id"), col("w"))
      .orderBy("sample_ord")
  }

  /** Mixture (re-weighting) sample: given a total document `budget`
    * spread uniformly across sources, keep each source's deterministic
    * content-hash slice at rate target/n — the "data mixing" step of a
    * training recipe (downsample overrepresented domains to hit a
    * target mixture). Reports per source: population, target, kept.
    *
    * The keep rule is a pure hash threshold (first 32 fingerprint bits
    * under floor(rate·2³²)) — reproducible under re-ingestion, exact
    * duplicates always land on the same side, and every arithmetic
    * step (integer division → exactly-rounded IEEE division →
    * power-of-two scale → floor) is bit-identical across engines, so
    * the twin matches by construction. Sources under target keep
    * everything (rate caps at 1).
    *
    * Two narrow passes over a slim hash frame + a broadcast of the
    * per-source rates; no corpus-wide shuffle at any size.
    */
  def mixtureSample(documents: DataFrame, budget: Long = 200L): DataFrame = {
    val h = ledger.persist(
      documents.select(col("doc_id"), col("source"),
        TextOps.fingerprint(col("text")).as("h")))
    val counts = h.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val ns = counts.agg(count(lit(1)).as("n_sources"))
    val rates = counts.crossJoin(broadcast(ns))
      .withColumn("target",
        floor(lit(budget).cast("double") / col("n_sources")).cast("long"))
      .withColumn("cut",
        floor(least(lit(1.0), col("target").cast("double") / col("n_docs"))
          * lit(4294967296.0)))
      .select("source", "target", "cut")
    h.withColumn("u", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .join(broadcast(rates), "source")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        first(col("target")).as("target"),
        sum(when(col("u").cast("double") < col("cut"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Temperature-weighted mixture sampling (α = 0.5): per-source
    * budgets ∝ √n instead of [[mixtureSample]]'s uniform split — the
    * standard up/down-weighting for multi-source training mixes
    * (rare sources get more than their proportional share, dominant
    * crawls less; α = 0.5 is the sampling-temperature midpoint
    * between proportional α = 1 and uniform α = 0).
    *
    * Portability (gate contract): sqrt is correctly-rounded IEEE in
    * every engine, each weight is immediately floor-quantized to an
    * INTEGER (w = ⌊√n · 10⁶⌋, exact below 2⁵³), and everything
    * downstream — the weight total, each target = ⌊budget·w / W⌋ —
    * is exact integer arithmetic (budget·w must stay below 2⁶³:
    * any realistic budget does). Keep rule per document: the same
    * md5-prefix uniform as [[mixtureSample]], so a document's fate
    * is a pure function of its content and the mix parameters.
    *
    * Scale shape: identical to [[mixtureSample]] — one narrow
    * fingerprint pass, a |sources|-row weight table broadcast back,
    * one partial-agg shuffle for the report.
    */
  def mixtureSampleTemperature(documents: DataFrame, budget: Long = 200L): DataFrame = {
    val h = ledger.persist(
      documents.select(col("doc_id"), col("source"),
        TextOps.fingerprint(col("text")).as("h")))
    h.withColumn("u", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .join(broadcast(temperatureRates(h, budget)), "source")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        first(col("w")).as("w"),
        first(col("target")).as("target"),
        sum(when(col("u").cast("double") < col("cut"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Per-source temperature rates (w ∝ √n, target from `budget`,
    * accept cut) — shared by the report ([[mixtureSampleTemperature]])
    * and the keep-set ([[mixtureTemperatureKeep]]) so the rate math
    * can never drift between them. `h`: (doc_id, source, h).
    */
  private def temperatureRates(h: DataFrame, budget: Long): DataFrame = {
    val counts = h.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val wts = counts.withColumn("w",
      floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = wts.agg(sum("w").as("w_total"))
    wts.crossJoin(broadcast(tot))
      .withColumn("target", expr(s"(${budget}L * w) div w_total"))
      .withColumn("cut",
        floor(least(lit(1.0), col("target").cast("double") / col("n_docs"))
          * lit(4294967296.0)))
      .select("source", "w", "target", "cut")
  }

  /** The temperature mixture's KEEP SET — the documents the t92
    * report counts as `n_kept`, for pipelines that consume the
    * sampled docs rather than the report (the crawl capstone's
    * stage 7). Output: (doc_id, source).
    */
  def mixtureTemperatureKeep(documents: DataFrame, budget: Long = 200L): DataFrame = {
    // persisted (tracked) for the same reason the report path
    // persists it: the rates subtree and the keep filter both read
    // the fingerprint frame — bare, the corpus re-fingerprints per
    // consumer
    val h = ledger.persist(documents.select(col("doc_id"), col("source"),
      TextOps.fingerprint(col("text")).as("h")))
    h.withColumn("u", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .join(broadcast(temperatureRates(h, budget)), "source")
      .filter(col("u").cast("double") < col("cut"))
      .select("doc_id", "source")
  }

  /** Deterministic training-order shuffle: a seeded global permutation
    * of the corpus — (doc_id, pos) with pos the 1-based rank under
    * md5(seed:doc_id) (doc_id tiebreak makes the order total). Data
    * order for a training run must be a pure function of a seed, not
    * of storage layout or scheduler timing: this is the operator that
    * fixes it, replayable across re-runs and resumable mid-epoch
    * (pos ranges shard the epoch).
    *
    * Scale shape: a naive global row_number is a ONE-PARTITION window
    * — the classic driver-shaped bottleneck. The rank instead splits
    * into bucket offset + within-bucket rank: buckets are the key's
    * first FOUR hex chars (65,536 of them, uniform by construction —
    * at 10^12 documents that is ~1.5·10^7 rows per window partition,
    * a single-task sort; two chars would cap parallelism at 256 and
    * put 4·10^9 rows in each), the offset table is a ≤65,536-row
    * cumulative sum (tiny; its single-partition window holds
    * |buckets| rows, never |corpus|), and the within-bucket
    * row_number partitions BY bucket — every corpus-sized stage is
    * parallel. Same two-phase shape as [[packSequences]]' token
    * offsets.
    */
  def shuffleOrder(documents: DataFrame, seed: Long = 42L): DataFrame =
    shuffleRank(
      documents.select(col("doc_id"),
        md5(concat_ws(":", lit(seed.toString), col("doc_id").cast("string"))).as("hkey")),
      tieCols = Seq("doc_id"))
      .select("doc_id", "pos")
      .orderBy("pos")

  /** The two-phase seeded-permutation rank, key-generic: input rows
    * carry a precomputed `hkey`; output adds `pos` = the 1-based rank
    * under (hkey, tieCols…). Shared by the per-document shuffle and
    * the packed-sequence shuffle (crawl capstone stage 9), so the
    * bucket-offset trick — no global single-partition window — is
    * written once.
    */
  private[ops] def shuffleRank(keyed0: DataFrame, tieCols: Seq[String]): DataFrame = {
    val keyed = keyed0.withColumn("bucket", substring(col("hkey"), 1, 4))
    val offs = keyed.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val cumW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = offs
      .withColumn("off", coalesce(sum("bn").over(cumW), lit(0L)))
      .select("bucket", "off")
    val inBucket = Window.partitionBy("bucket")
      .orderBy(col("hkey") +: tieCols.map(col): _*)
    keyed.join(broadcast(cum), "bucket")
      .withColumn("pos",
        (row_number().over(inBucket).cast("long") + col("off")))
      .drop("bucket", "off")
  }

  /** Capstone corpus build — the full path from raw documents to a
    * training-shard manifest, composing the operators the gate checks
    * individually, the way a real corpus build runs them:
    *
    *  1. exact dedup: keep each content fingerprint's canonical
    *     (minimum-doc_id) document;
    *  2. Gopher-style rule filter: keep documents passing all four
    *     rules ([[gopherFilter]]'s bounds, integer cross-multiplied);
    *  3. split assignment: train/val/test from the SAME fingerprint
    *     computed for dedup (16-bit prefix mod 10 → 8/1/1) — dups
    *     can't leak across splits by construction, and no re-hash;
    *  4. sequence packing per (source, split) via the two-phase
    *     prefix sum ([[packManifest]]).
    *
    * Plan discipline: the fingerprint is computed ONCE (dedup + split
    * both read it) and the token array is materialized ONCE (filter
    * metrics + packed token counts both read it) — no stage
    * re-tokenizes. Dedup is the only corpus-wide shuffle before the
    * slim manifest aggregation.
    */
  def corpusBuild(
      documents: DataFrame, seqLen: Long = 512L,
      minTokens: Long = 20L, maxTokens: Long = 400L): DataFrame = {
    val fp = documents.select(col("doc_id"), col("source"), col("text"),
      TextOps.fingerprint(col("text")).as("fp"))
    val canon = fp.groupBy("fp").agg(min("doc_id").as("canonical_id"))
    val kept0 = fp.join(canon, "fp").filter(col("doc_id") === col("canonical_id"))
    manifestTail(kept0, seqLen, minTokens, maxTokens)
  }

  /** The shared filter→split→pack tail of the corpus-build capstones:
    * takes the deduplicated (doc_id, source, text, fp) survivors,
    * assigns splits from the SAME fingerprint (no re-hash; dups can't
    * leak across splits by construction), computes the rule metrics
    * over ONE materialized token array, packs per (source, split).
    */
  private def manifestTail(
      kept0: DataFrame, seqLen: Long, minTokens: Long, maxTokens: Long): DataFrame = {
    val bucket = conv(substring(col("fp"), 1, 4), 16, 10).cast("long") % 10
    val toks = col("tk")
    val stopList = lit(Array("the", "a", "of", "and", "is", "to", "in"))
    val metrics = kept0
      .select(col("doc_id"), col("source"),
        when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test").as("split"),
        TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("source"), col("split"),
        size(toks).cast("long").as("n"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        size(array_intersect(array_distinct(toks), stopList)).cast("long").as("n_stop_uniq"))
    val kept = metrics.filter(
      col("n") >= minTokens && col("n") <= maxTokens &&
        col("sum_len") >= lit(3L) * col("n") && col("sum_len") <= lit(10L) * col("n") &&
        col("n_stop_uniq") >= 2L && lit(5L) * col("n_uniq") >= col("n"))
      .select(col("source"), col("split"), col("doc_id"), col("n").as("n_tokens"))
    packManifest(kept, Seq("source", "split"), seqLen)
  }

  /** [[corpusBuild]] with NEAR-duplicate canonicalization: stage 1
    * keeps one representative per Jaccard duplicate CLUSTER
    * ([[graft.ops.Dedup.jaccardClusters]] — set-graph label
    * propagation, the gated t49 machinery) instead of one per exact
    * fingerprint, so reshuffled/lightly-edited copies collapse too —
    * the dedup stage a web-scale build actually runs (exact dedup is
    * its special case at threshold 1.0). Documents outside every
    * cluster (including token-less ones the clustering never sees)
    * keep themselves. The tail — fingerprint-keyed splits, rule
    * filter, two-phase packing — is [[manifestTail]], identical to
    * the exact capstone.
    */
  def corpusBuildNearDup(
      documents: DataFrame, threshold: Double = 0.6, seqLen: Long = 512L,
      minTokens: Long = 20L, maxTokens: Long = 400L): DataFrame = {
    val clusters = Dedup.jaccardClusters(documents, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val kept0 = documents
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("source"), col("text"),
        TextOps.fingerprint(col("text")).as("fp"))
    manifestTail(kept0, seqLen, minTokens, maxTokens)
  }

  /** Daily-shard INCREMENTAL corpus build — the workflow a production
    * training-data pipeline actually runs when shard N+1 arrives:
    * dedup the shard against the persisted (fp, canonical_id) exact
    * index WITHOUT touching history ([[graft.ops.Dedup
    * .incrementalExactDedup]] decomposition: a shard doc survives iff
    * its fp is absent from the index AND it is the fp's minimum
    * within the shard), then run the IDENTICAL filter→split→pack
    * tail the full capstone uses ([[manifestTail]] — same fingerprint
    * feeds dedup and split assignment, so a shard dup of a historical
    * doc can never leak into a different split than its canonical).
    *
    * The shard packs into NEW sequences (offsets restart per shard):
    * finalized training shards are immutable — continuing history's
    * pack state would re-open them, which no pipeline does. After
    * taking the manifest, append the shard's novel fps to the index
    * (the t66 anti-join-append contract) so tomorrow's shard sees
    * today's.
    *
    * Scale shape: history appears ONLY as the index side of one
    * left-anti join — bucketed by fp ([[graft.sinks.LakeWriter
    * .commitBucketed]]), it joins without shuffling; everything else
    * is shard-sized. Re-running the FULL capstone to absorb a daily
    * shard re-shuffles the whole corpus; this runs in O(shard).
    */
  def incrementalCorpusBuild(
      newDocs: DataFrame, index: DataFrame, seqLen: Long = 512L,
      minTokens: Long = 20L, maxTokens: Long = 400L): DataFrame = {
    val fp = newDocs.select(col("doc_id"), col("source"), col("text"),
      TextOps.fingerprint(col("text")).as("fp"))
    // shard-local canonical per fp, minus anything history owns
    val novelMin = fp.groupBy("fp").agg(min("doc_id").as("new_min"))
      .join(index.select("fp"), Seq("fp"), "left_anti")
    val kept0 = fp
      .join(novelMin, "fp")
      .filter(col("doc_id") === col("new_min"))
      .select(col("doc_id"), col("source"), col("text"), col("fp"))
    manifestTail(kept0, seqLen, minTokens, maxTokens)
  }

  /** Daily-shard corpus build with NEAR-duplicate canonicalization —
    * [[incrementalCorpusBuild]]'s near-dup sibling, and the indexed
    * incremental form of [[corpusBuildNearDup]]: the shard's near-dup
    * pairs come from ONE probe of the persisted minhash band index
    * ([[graft.ops.Dedup.incrementalMinhashPairs]] — old×old
    * unrepresentable, history never shuffles), classified into two
    * drop rules:
    *
    *  - HISTORY-AUTHORITATIVE: a shard doc pairing with any indexed
    *    doc is dropped, whatever the ids — history is immutable, its
    *    copy already feeds training (the same arrival-order rule the
    *    streaming intake uses, `indexWins`);
    *  - shard-internal clusters ([[graft.ops.Dedup.dedupClusters]]
    *    over both-new pairs) keep their min-id representative; a
    *    cluster whose representative was history-dropped drops whole
    *    (its content is transitively represented).
    *
    * Near-dup detection is the banded-LSH rule, exactly as the t25 /
    * t63 gates define it (candidate = band-key collision, then exact
    * Jaccard ≥ τ) — deliberately approximate with the documented
    * 1-(1-τ^r)^b recall, which is the production tradeoff an indexed
    * daily pipeline actually ships. Everything outside the index
    * probe is shard-sized; the tail is [[manifestTail]] verbatim.
    */
  def incrementalCorpusBuildNearDup(
      newDocs: DataFrame, index: Dedup.MinhashIndex, threshold: Double = 0.9,
      seqLen: Long = 512L, minTokens: Long = 20L, maxTokens: Long = 400L): DataFrame = {
    val kept0 = nearDupSurvivors(newDocs, index, threshold)
      .select(col("doc_id"), col("source"), col("text"),
        TextOps.fingerprint(col("text")).as("fp"))
    manifestTail(kept0, seqLen, minTokens, maxTokens)
  }

  /** The t87 shard-vs-history drop rule, factored so the crawl
    * capstone composes the SAME rule: shard docs near-dupping history
    * drop (history-authoritative), shard-internal clusters keep their
    * minimum member. Returns the surviving `newDocs` rows.
    */
  private[ops] def nearDupSurvivors(
      newDocs: DataFrame, index: Dedup.MinhashIndex,
      threshold: Double): DataFrame = {
    val pairs = Dedup.incrementalMinhashPairs(newDocs, index, threshold)
    val ids = newDocs.select("doc_id")
    val flagged = pairs
      .join(ids.select(col("doc_id").as("doc_a"), lit(true).as("a_new")), Seq("doc_a"), "left")
      .join(ids.select(col("doc_id").as("doc_b"), lit(true).as("b_new")), Seq("doc_b"), "left")
    val histDropped = flagged.filter(col("a_new").isNull || col("b_new").isNull)
      .select(when(col("a_new").isNotNull, col("doc_a")).otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    val shardPairs = flagged
      .filter(col("a_new").isNotNull && col("b_new").isNotNull)
      .select("doc_a", "doc_b")
    val nonCanonical = Dedup.dedupClusters(shardPairs)
      .filter(!col("is_canonical")).select("doc_id")
    val dropped = histDropped.unionByName(nonCanonical).distinct()
    newDocs.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** CRAWL-TO-CORPUS CAPSTONE — the full daily-intake path a crawl
    * pipeline runs, composing NINE individually-gated operators in
    * the order a production build chains them (the t56/t80 precedent:
    * composition bugs hide between gates). Today's shard
    * (doc_id ≡ 0 mod 5) flows; the rest of the corpus is the
    * already-ingested history:
    *
    *  1. t71 URL canon/dedup WITHIN the shard (crawl refetches);
    *  2. t124 domain blocklist from the FULL corpus (domain
    *     reputation comes from history);
    *  3. t55 Gopher quality rules on the survivors;
    *  4. t107 fuzzy decontamination: survivors near-dupping the
    *     held-out eval slice of history (content-hash bucket ≥ 8)
    *     at `decontamThreshold` drop;
    *  5. t87 near-dup vs the history minhash index at
    *     `nearDupThreshold`: history-matched docs drop, shard-
    *     internal clusters keep their minimum;
    *  6. t121 DSIR resample: accept by the content-hash Bernoulli
    *     against importance scores whose weight table comes from the
    *     FULL corpus (the fixed target slice); reference-slice docs
    *     (doc_id % 10 < 3) pass through — they ARE the target;
    *  7. t92 temperature mixture (√n budgets) over the accepted docs;
    *  8. t54 sequence packing per source;
    *  9. t91 seeded training shuffle of the packed sequences.
    *
    * Output: (pos, source, seq_id, n_docs, n_tokens, first_doc,
    * last_doc) — the shuffled training-shard manifest. Every stage
    * reuses the gated operator's code path (urlDedup,
    * domainQualityReport, gopherFilter, crossNearDups,
    * nearDupSurvivors, importanceWeights, mixtureTemperatureKeep,
    * packSequences, shuffleRank) — nothing is reimplemented here, so
    * a capstone/gate divergence can only be a WIRING bug, which is
    * exactly what this row exists to catch.
    */
  def crawlCorpusBuild(documents: DataFrame, withUrls: DataFrame,
      minDomainQuality: Double = 0.6, decontamThreshold: Double = 0.9,
      nearDupThreshold: Double = 0.9, budget: Long = 64L,
      seqLen: Long = 512L, seed: Long = 42L): DataFrame = {
    val shard = documents.filter(col("doc_id") % 5 === 0)
    val history = documents.filter(col("doc_id") % 5 =!= 0)
    // 1. URL canon/dedup within the shard
    val shardUrls = withUrls.join(shard.select("doc_id"), "doc_id")
    val d1 = UrlOps.urlDedup(shardUrls)
      .filter(!col("is_dup")).select("doc_id", "domain")
    // 2. domain blocklist from the full corpus
    val blocked = UrlOps.domainQualityReport(documents, withUrls, minDomainQuality)
      .filter(col("blocked")).select("domain")
    val d2 = d1.join(blocked, Seq("domain"), "left_anti").select("doc_id")
    // 3. Gopher quality rules
    val d3 = gopherFilter(documents.join(d2, "doc_id"))
      .filter(col("keep")).select("doc_id")
    // localCheckpoint at each stage boundary: the surviving-id frames
    // are tiny, and carrying nine stages of lineage into one plan
    // blows analysis/codegen long before data size matters
    val d3docs = documents.join(d3, "doc_id").localCheckpoint()
    // 4. fuzzy decontamination vs the eval slice of history
    val contaminated = Dedup.crossNearDups(d3docs, evalSlice(history),
        decontamThreshold)
      .select(col("train_id").as("doc_id")).distinct()
    val d4docs = d3docs.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    corpusTail(documents, d4docs, history, nearDupThreshold, budget,
      seqLen, seed)
  }

  /** The held-out eval slice of the history corpus (content-hash
    * bucket ≥ 8) — the decontamination target of the capstone's
    * stage 4, shared with the streaming intake gate. */
  private[graft] def evalSlice(history: DataFrame): DataFrame = {
    val bucket = conv(substring(TextOps.fingerprint(col("text")), 1, 4), 16, 10)
      .cast("long") % 10
    history.filter(bucket >= 8)
  }

  /** Stages 5–9 of [[crawlCorpusBuild]] — the DAY-CLOSE tail: shard-
    * internal + history near-dup resolution, DSIR resample,
    * temperature mixture, packing, seeded shuffle. Factored out so
    * the STREAMING intake gate can run the identical tail over its
    * staged survivors: stages 1–4 are per-document decisions against
    * static context (union-stable across micro-batches), stage 5's
    * shard-internal clustering is NOT (a cluster's members can span
    * batches), so an exactly-batch-equal stream must defer from here
    * down to day close. `d4docs` = the decontaminated survivors.
    */
  private[graft] def corpusTail(documents: DataFrame, d4docs: DataFrame,
      history: DataFrame, nearDupThreshold: Double, budget: Long,
      seqLen: Long, seed: Long): DataFrame = {
    // 5. near-dup vs the history index
    val d5docs = nearDupSurvivors(
      d4docs, Dedup.minhashIndexFrames(history), nearDupThreshold)
      .localCheckpoint()
    // 6. DSIR resample (weight table from the full corpus)
    val u16 = conv(substring(TextOps.fingerprint(col("text")), 1, 4), 16, 10)
      .cast("long")
    val accepted = d5docs.select(col("doc_id"), u16.as("u16"))
      .join(importanceWeights(documents), "doc_id")
      .filter(col("u16") * col("n_tok") * lit(1000000L) < col("swq") * lit(65536L))
      .select("doc_id")
    val d6 = d5docs.filter(col("doc_id") % 10 < 3).select("doc_id")
      .unionByName(accepted)
    val d6docs = documents.join(d6, "doc_id").localCheckpoint()
    // 7. temperature mixture over the accepted docs
    val d7 = mixtureTemperatureKeep(d6docs, budget).select("doc_id")
    // 8. pack per source
    val packed = packSequences(documents.join(d7, "doc_id"), seqLen)
    // 9. seeded training shuffle of the sequences
    shuffleRank(
      packed.withColumn("hkey",
        md5(concat_ws(":", lit(seed.toString), col("source"),
          col("seq_id").cast("string")))),
      tieCols = Seq("source", "seq_id"))
      .select("pos", "source", "seq_id", "n_docs", "n_tokens",
        "first_doc", "last_doc")
      .orderBy("pos")
  }

  /** BPE MERGE-PAIR LEARNING over the document TOKEN STREAMS — the
    * phrase/merge-mining complement of the word-internal char-level
    * [[bpeTrain]] (which runs on the vocabulary-sized word-TYPE table
    * and can't learn cross-word units): `nMerges` times, count all
    * adjacent token bigrams across each document's full stream, take
    * the most frequent pair (ties broken (cnt desc, left, right) —
    * fully deterministic), and GREEDILY apply it left-to-right before
    * recounting (Sennrich et al. 2016, public). Greedy
    * application is the classic correctness trap: occurrences of a
    * pair (l, r) can only overlap when l == r, where leftmost-greedy
    * merges exactly the EVEN offsets of each maximal run ("aaaa" →
    * "(aa)(aa)", never "a(aa)a") — computed as run-position parity
    * over gaps-and-islands, no sequential scan needed, so the apply
    * step stays one windowed pass in BOTH engines. Output: one row
    * per step (step, left, right, cnt, n_tokens_after) — the learned
    * merge table plus the post-apply stream length, which checksums
    * the apply itself.
    *
    * Scale shape: each step is one (doc_id, pos+1) self-equi-join
    * (shuffle by doc_id) + per-doc windows (bounded by document
    * length, never corpus-sized) + one global top-1
    * (TakeOrderedAndProject). The step LOOP is driver-sequential by
    * nature — merge k+1's counts depend on merge k's stream — which
    * is inherent to BPE, not a distribution defect; each iteration's
    * work is fully distributed and the carried stream is
    * localCheckpointed so lineage stays flat.
    */
  def bpeMerges(documents: DataFrame, nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1, "need at least one merge step")
    val spark = documents.sparkSession
    var stream = documents
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long, Long)]()
    for (step <- 1 to nMerges) {
      val nxt = stream.select(col("doc_id").as("bdoc"),
        col("pos").as("bpos"), col("tok").as("btok"))
      val withNext = stream.join(nxt,
          col("doc_id") === col("bdoc") && col("bpos") === col("pos") + 1,
          "left")
        .select(col("doc_id"), col("pos"), col("tok"), col("btok"))
      val top = graft.core.DriverProbe.boundedCollect(
        withNext.filter(col("btok").isNotNull)
          .groupBy(col("tok").as("l"), col("btok").as("r"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r")).limit(1),
        maxRows = 1, what = "bpeMerges top pair")
      require(top.nonEmpty, s"bpeMerges: no adjacent pairs left at step $step")
      val (l, r, cnt) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      val isMatch = col("tok") === l && col("btok") === r
      // run parity — only l == r occurrences can overlap
      val flagged =
        if (l != r) withNext.withColumn("even", lit(true))
        else {
          val rn = Window.partitionBy("doc_id").orderBy("pos")
          val runs = withNext.filter(col("tok") === l)
            .withColumn("island",
              col("pos") - row_number().over(rn).cast("long"))
            .withColumn("run_start",
              min("pos").over(Window.partitionBy("doc_id", "island")))
            .select(col("doc_id"), col("pos"),
              (((col("pos") - col("run_start")) % 2) === 0).as("even"))
          withNext.join(runs, Seq("doc_id", "pos"), "left")
        }
      val started = flagged
        .withColumn("start",
          when(isMatch && coalesce(col("even"), lit(false)), lit(true))
            .otherwise(lit(false)))
        .select("doc_id", "pos", "tok", "start")
        .localCheckpoint()
      val consumed = started.filter(col("start"))
        .select(col("doc_id").as("cdoc"), (col("pos") + 1).as("cpos"))
      stream = started
        .join(consumed,
          col("doc_id") === col("cdoc") && col("pos") === col("cpos"),
          "left_anti")
        .withColumn("tok",
          when(col("start"), lit(s"${l}_$r")).otherwise(col("tok")))
        .withColumn("pos", row_number()
          .over(Window.partitionBy("doc_id").orderBy("pos")).cast("long"))
        .select("doc_id", "pos", "tok")
        .localCheckpoint()
      out += ((step.toLong, l, r, cnt, stream.count()))
    }
    import spark.implicits._
    // left_tok/right_tok, not left/right: LEFT and RIGHT are SQL
    // keywords and a twin would have to quote them in every dialect
    out.toSeq.toDF("step", "left_tok", "right_tok", "cnt", "n_tokens_after")
      .orderBy("step")
  }

  /** Vocabulary construction: the `k` most frequent corpus tokens
    * (occurrences, not document frequency) with dense ids in
    * (count desc, token) order — the table a tokenizer trainer or a
    * frequency-cutoff filter consumes.
    *
    * Scale shape: one partial-aggregating shuffle to |vocabulary|
    * rows, then a global top-k that compiles to
    * `TakeOrderedAndProject` (no full sort — each partition keeps k
    * candidates, the driver merges k·partitions rows); id assignment
    * is a window over the k survivors only.
    */
  def vocabulary(documents: DataFrame, k: Int = 500): DataFrame = {
    val counts = documents
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("token_id", row_number().over(w).cast("long"))
      .select("token_id", "token", "cnt")
      .orderBy("token_id")
  }

  /** Collocation mining: top-k unordered token pairs co-occurring
    * within `window` positions, scored by the PMI-MONOTONE ratio
    * N·c_ab / (c_a·c_b) — the same ranking PMI gives, without the
    * engine-unportable `log` (libm last-ulp differences); every
    * factor is an exactly-representable integer, so the one division
    * is bit-identical everywhere.
    *
    * Scale shape: positions fan out to n·window rows via an EQUI-join
    * on (doc_id, pos+d) — never a per-document cross product — then
    * partial-aggregating pair counts and a TakeOrdered top-k. The
    * unigram table joins by token (shuffle, vocabulary-sized); the
    * corpus total broadcasts as one row.
    */
  def cooccurrence(documents: DataFrame, window: Int = 2, k: Int = 50): DataFrame = {
    // persisted (tracked): THREE consumers read the position frame
    // (both pair sides and the unigram counts; the corpus total sums
    // the unigram frame) — unpersisted, each would re-tokenize the
    // corpus
    val pos = ledger.persist(documents.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok"))))
    val left = pos.select(col("doc_id"), col("pos"), col("tok").as("tok_a"))
      .withColumn("d", explode(sequence(lit(1), lit(window))))
      .withColumn("pos_b", col("pos") + col("d"))
    val pairs = left
      .join(pos.select(col("doc_id"), col("pos").as("pos_b"), col("tok").as("tok_b")),
        Seq("doc_id", "pos_b"))
      .select(least(col("tok_a"), col("tok_b")).as("ta"),
        greatest(col("tok_a"), col("tok_b")).as("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
    val unigrams = pos.groupBy("tok").agg(count(lit(1)).as("c"))
    // corpus total from the vocabulary-sized unigram frame — a fourth
    // full pass over the position frame would buy the same number
    val total = unigrams.agg(sum("c").as("n_tok"))
    pairs
      .join(unigrams.select(col("tok").as("ta"), col("c").as("ca")), "ta")
      .join(unigrams.select(col("tok").as("tb"), col("c").as("cb")), "tb")
      .crossJoin(broadcast(total))
      .withColumn("score", Exact.quant6(
        (col("n_tok").cast("double") * col("c_ab").cast("double"))
          / (col("ca").cast("double") * col("cb").cast("double"))))
      .orderBy(col("score").desc, col("ta"), col("tb")).limit(k)
      .select("ta", "tb", "c_ab", "score")
      .orderBy(col("score").desc, col("ta"), col("tb"))
  }

  /** Context-window chunk plan: how many training windows of `win`
    * tokens at stride `stride` each document yields (first window
    * covers tokens 1..win; further windows start every `stride`
    * until the tail is covered; empty docs yield none). Reports per
    * source: docs, tokens, chunks, and the padding implied by the
    * final partial windows — the sizing pass an embedding or
    * long-context pipeline runs before sharding. All integer
    * arithmetic (ceil by (a+b-1) div b), single narrow pass.
    */
  def chunkPlan(documents: DataFrame, win: Long = 64L, stride: Long = 32L): DataFrame = {
    val n = size(TextOps.tokens(col("text"))).cast("long")
    documents
      .select(col("source"), n.as("n"))
      // `div`, not `/`: Column `/` is IEEE double division, whose
      // floor can cross an integer boundary at large n for
      // non-power-of-two strides — true integer division keeps the
      // all-integer contract for every parameter choice
      .withColumn("chunks", when(col("n") === 0L, 0L).otherwise(
        lit(1L) + expr(s"(greatest(n - ${win}L, 0L) + ${stride - 1}L) div ${stride}L")))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n").as("n_tokens"),
        sum("chunks").as("n_chunks"),
        // the last window of a doc spans [(chunks-1)·stride,
        // (chunks-1)·stride + win); whatever of that range lies past
        // the doc's end is padding
        sum(when(col("chunks") === 0L, 0L).otherwise(
          greatest((col("chunks") - 1L) * stride + win - col("n"), lit(0L))))
          .as("pad_tokens"))
      .orderBy("source")
  }

  /** Boilerplate detection: the `k` word n-gram shingles shared by
    * the most documents (document frequency ≥ `minDf`) — repeated
    * template text (headers, footers, navigation, license blurbs) is
    * exactly the content a corpus cleaner strips before training, and
    * cross-document shingle frequency is its standard signature.
    * Shingles are distinct per document, so one partial-aggregating
    * shuffle yields df directly; the top-k is a TakeOrdered, never a
    * full sort.
    */
  def boilerplateShingles(
      documents: DataFrame, n: Int = 3, minDf: Long = 2L, k: Int = 50): DataFrame = {
    val sh = documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("tk"), n)).as("shingle"))
    val w = Window.orderBy(col("df").desc, col("shingle"))
    sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("shingle")).limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select("rnk", "shingle", "df")
      .orderBy("rnk")
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

  /** Word-type frequency table (w, cnt) — BPE's training input:
    * classic BPE (Sennrich et al. 2016) trains over DISTINCT words
    * weighted by corpus frequency, never over the raw token stream —
    * the table is vocabulary-sized however big the corpus, which is
    * what makes tokenizer training tractable at 100 TB (one corpus
    * pass to count, then every merge iteration touches only types).
    */
  private def wordTypes(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent-symbol pair frequencies over the current symbol
    * sequences — BPE's inner loop, exposed as the gated query (t76
    * covers the first iteration, whose symbols are single
    * characters): Σ over word types of cnt · (pair occurrences).
    * Top-k by (freq DESC, pair) — the same total order the merge
    * selection uses.
    */
  def bpePairCounts(documents: DataFrame, k: Int = 20): DataFrame =
    pairCounts(wordTypes(documents)
      .select(col("cnt"), split(col("w"), "").as("sym")))
      .limit(k)

  /** Shared pair-count core: [[bpePairCounts]] (the gated query) and
    * [[bpeTrain]]'s merge selection run the SAME code, so the
    * tie-break order training depends on can never desync from what
    * the oracle checks.
    */
  private def pairCounts(syms: DataFrame): DataFrame =
    pairFreqs(syms).orderBy(col("freq").desc, col("pair"))

  /** Unsorted pair frequencies over a symbol frame — the aggregation
    * behind [[pairCounts]] (which adds the presentation sort); the
    * trainer's incremental state updates join on `pair` and must not
    * carry a sort node through every delta fold. */
  private def pairFreqs(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("sym")) >= 2)
      .select(col("cnt"), explode(TextOps.kgrams(col("sym"), 2)).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("freq"))

  /** Greedy left-to-right application of one merge (a, b) → ab over a
    * symbol array — overlapping occurrences merge leftmost-first
    * ("aaa" + merge(a,a) → [aa, a]), the reference BPE behavior. A
    * fold that either extends the last output symbol or appends;
    * `get()` (null out of range) keeps the empty-prefix probe safe
    * under ANSI.
    */
  private def applyMergePair(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (out, x) => {
      val last = get(out, size(out) - 1)
      when(last === lit(a) && x === lit(b),
        concat(slice(out, lit(1), size(out) - 1), array(concat(last, x))))
        .otherwise(concat(out, array(x)))
    })

  /** BPE tokenizer TRAINING: `nMerges` iterations of count-adjacent-
    * pairs → pick the most frequent (freq DESC, pair ASC — fully
    * deterministic) → merge it everywhere. Returns the merge table
    * (rank, left, right, freq) — the artifact a tokenizer ships.
    *
    * Scale shape — MEASURED, and the single-node intuition does NOT
    * transfer: the classic BPE delta update (retract the affected
    * types' pre-merge pairs, insert their post-merge pairs, fold the
    * signed difference into a carried counts frame) is implemented
    * behind `deltaCounts = true` and produces a bit-identical merge
    * table (A/B spec), but it is the SLOWER path in this execution
    * model at every scale tested (SCALE.md round-16: 1.3–1.6× slower
    * at 31, 65k, and 390k word types). Why: the full recount is ONE
    * map-side-combinable explode+aggregate — Spark's cheapest shape —
    * while the delta is four extra joins per merge, and the dominant
    * per-iteration cost (rewriting the carried symbol table) is paid
    * by BOTH paths. The delta only wins with a mutable indexed state
    * store where unaffected rows are not rewritten (the bucketed
    * delta-commit pattern of the MV gates) — recorded in SCALE.md as
    * the upgrade path, with the full recount as the measured default.
    * The per-iteration argmax is a 1-row collect — driver
    * coordination inherent to the sequential-merge algorithm; symbol
    * and count frames are localCheckpointed per iteration with eager
    * frees so lineage and storage stay bounded at any merge count.
    */
  def bpeTrain(documents: DataFrame, nMerges: Int = 10,
      deltaCounts: Boolean = false): DataFrame = {
    val spark = documents.sparkSession
    var (syms, symIds) = Dedup.checkpointTracked(
      wordTypes(documents).select(col("cnt"), split(col("w"), "").as("sym")))
    var (counts, cntIds) = Dedup.checkpointTracked(pairFreqs(syms))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = counts.orderBy(col("freq").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += (((i + 1).toLong, a, b, top(0).getLong(1)))
        // CASE keeps kgrams away from single-symbol words (its slice
        // is undefined below size 2 — same guard pairFreqs applies)
        val hit = when(size(col("sym")) >= 2,
          array_contains(TextOps.kgrams(col("sym"), 2), lit(s"$a $b")))
          .otherwise(lit(false))
        val affected = syms.filter(hit)
        val merged = affected.select(col("cnt"),
          applyMergePair(col("sym"), a, b).as("sym"))
        // coalesce before the checkpoint: the union's partition count
        // is the SUM of its children's, and the children derive from
        // the previous iteration's syms — uncapped, partitions double
        // per merge (4 → 2^n·4; round-16 lesson: iteration 13 ran a
        // 28k-task stage over 31 rows). Narrow merge back to the
        // session's shuffle width each step.
        val width = spark.sessionState.conf.numShufflePartitions
        val (nextSyms, nextSymIds) = Dedup.checkpointTracked(
          syms.filter(!hit).unionByName(merged).coalesce(width))
        val (nextCounts, nextCntIds) =
          if (!deltaCounts) Dedup.checkpointTracked(pairFreqs(nextSyms))
          else {
            // the delta update: retract the affected types' pre-merge
            // pairs, insert their post-merge pairs, fold the signed
            // difference into the carried counts, drop exhausted pairs
            val oldP = pairFreqs(affected).withColumnRenamed("freq", "of")
            val newP = pairFreqs(merged).withColumnRenamed("freq", "nf")
            val delta = oldP.join(newP, Seq("pair"), "full_outer")
              .select(col("pair"),
                (coalesce(col("nf"), lit(0L)) -
                  coalesce(col("of"), lit(0L))).as("df"))
              .filter(col("df") =!= 0L)
            Dedup.checkpointTracked(
              counts.join(delta, Seq("pair"), "full_outer")
                .select(col("pair"),
                  (coalesce(col("freq"), lit(0L)) +
                    coalesce(col("df"), lit(0L))).as("freq"))
                .filter(col("freq") > 0L))
          }
        Dedup.freeRdds(syms, symIds)
        Dedup.freeRdds(counts, cntIds)
        syms = nextSyms; symIds = nextSymIds
        counts = nextCounts; cntIds = nextCntIds
        i += 1
      }
    }
    Dedup.freeRdds(syms, symIds)
    Dedup.freeRdds(counts, cntIds)
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** BPE tokenizer APPLICATION — encode documents with a trained merge
    * table ([[bpeTrain]]'s artifact): (doc_id, tokens, n_tokens) with
    * each word independently segmented by applying the merges in rank
    * order, greedy leftmost per merge — exactly the training-side
    * update rule ([[applyMergePair]], shared code), so encoding the
    * training corpus reproduces training's final symbol state
    * (spec-proven round trip).
    *
    * Scale shape — merges never touch the corpus: they apply to the
    * word-TYPE table (vocabulary-sized, however big the corpus), in
    * `mergeBatch`-sized column-composition rounds with an eager
    * localCheckpoint per round so neither the expression tree nor the
    * lineage grows with the merge count (superseded checkpoints are
    * freed in-loop; the final one stays for the caller's action —
    * the [[graft.ops.Dedup.propagateMin]] lifetime rule). The corpus
    * then joins the encoded types ONCE by word (a vocabulary-sized
    * build side — AQE broadcasts it when small) and reassembles each
    * document with one partial-agg shuffle. Encoding cost is
    * O(merges · |vocab|) + one corpus pass, the same asymptotics as
    * the single-node encoder per word, distributed over types.
    *
    * Documents with no tokens produce no output row (nothing to
    * encode — the posexplode emits nothing for them).
    */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)],
      mergeBatch: Int = 8): DataFrame = {
    var (syms, ids) = Dedup.checkpointTracked(
      wordTypes(documents).select(col("w"), split(col("w"), "").as("sym")))
    merges.grouped(math.max(mergeBatch, 1)).foreach { batch =>
      val applied = batch.foldLeft(col("sym")) {
        case (c, (a, b)) => applyMergePair(c, a, b)
      }
      val (next, nextIds) = Dedup.checkpointTracked(
        syms.select(col("w"), applied.as("sym")))
      Dedup.freeRdds(syms, ids)
      syms = next; ids = nextIds
    }
    documents
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
      .join(syms.select(col("w"), col("sym")), "w")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        x => x.getField("sym"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .select("doc_id", "tokens", "n_tokens")
      .orderBy("doc_id")
  }

  /** Golden BPE fixture (t85 gate): four planted documents whose
    * encoding under [[goldenBpeMerges]] is hand-derivable from the
    * greedy-leftmost merge rule alone, so the oracle twin is a VALUES
    * constant (the t93/q41 golden-frame pattern for pipelines SQL
    * can't recompute). Derivation, merge list applied in rank order
    * — (l,o) (lo,w) (e,s) (es,t) (n,e) (ne,w) (w,i) (wi,d) (e,r)
    * (a,a):
    *  - "low"    → lo w → low                          = [low]
    *  - "lower"  → low e r → (e,r) → [low, er]
    *  - "lowest" → low e s t → (e,s)(es,t) → [low, est]
    *  - "new"    → (n,e) ne w → (ne,w) → [new]
    *  - "newest" → (e,s)(es,t) n e w est → (n,e)(ne,w) → [new, est]
    *  - "news"   → (n,e)(ne,w) → [new, s]   ((e,s) never adjacent)
    *  - "wide"   → (w,i)(wi,d) → [wid, e]
    *  - "widest" → (e,s)(es,t)(w,i)(wi,d) → [wid, est]
    *  - "aaa"    → (a,a) greedy LEFTMOST → [aa, a]  (the overlap rule)
    *  - "abab", "banana" → no merge applies → single characters.
    * Doc rows: 1 "low lower lowest" → 5 tokens "low low er low est";
    * 2 "new newest news" → 5 "new new est new s"; 3 "wide widest low"
    * → 5 "wid e wid est low"; 4 "aaa abab banana" → 12
    * "aa a a b a b b a n a n a". Any drift in tokenization, merge
    * order, greedy-overlap handling, or document reassembly breaks the
    * hash match. The full-corpus trained encode stays the spec-covered
    * library path (CorpusOpsSpec round-trip + differential).
    */
  def goldenBpeFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "low lower lowest"),
      (2L, "new newest news"),
      (3L, "wide widest low"),
      (4L, "aaa abab banana")
    ).toDF("doc_id", "text")
  }

  /** The fixed 10-merge table [[goldenBpeFixture]] is derived under —
    * a hand-auditable stand-in for [[bpeTrain]]'s artifact with the
    * same (rank-ordered left/right pair) shape.
    */
  val goldenBpeMerges: Seq[(String, String)] = Seq(
    ("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("n", "e"),
    ("ne", "w"), ("w", "i"), ("wi", "d"), ("e", "r"), ("a", "a"))

  /** KN-substrate language-model counts: trigram frequencies plus the
    * continuation diversity of each bigram prefix — count(w1 w2 w3)
    * and countDistinct(w3 | w1 w2), the two tables Kneser-Ney
    * smoothing interpolates. One explode + one partial-agg shuffle
    * per order; top-k by (n_trigrams DESC, prefix) keeps the gate
    * output bounded.
    */
  def lmCounts(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(explode(TextOps.kgrams(col("tk"), 3)).as("g"))
      .select(
        element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"),
        element_at(split(col("g"), " "), 3).as("w3"))
      .groupBy("w1", "w2")
      .agg(
        count(lit(1)).as("n_trigrams"),
        countDistinct("w3").as("n_continuations"))
      .orderBy(col("n_trigrams").desc, col("w1"), col("w2"))
      .limit(k)

  /** Corpus card — the one-row dataset report every released corpus
    * ships: size, token budget, language/source diversity, exact-dup
    * rate, rule-based quality keep rate. Composes the gated operators
    * ([[graft.ops.Dedup.exactDedup]], [[gopherFilter]]) rather than
    * re-deriving their rules — three narrow passes plus the 16-byte
    * fingerprint shuffle, then one global aggregate; a report run
    * occasionally over any corpus size.
    */
  def corpusCard(documents: DataFrame): DataFrame = {
    val facts = documents.select(
      col("doc_id"), col("lang"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
    val dup = Dedup.exactDedup(documents).select(col("doc_id"), col("is_dup"))
    val keep = gopherFilter(documents).select(col("doc_id"), col("keep"))
    facts.join(dup, "doc_id").join(keep, "doc_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dups"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_keep"))
  }

  /** Inverted index build — the search/decontamination serving
    * substrate: per word n-gram (the phrase unit
    * [[graft.ops.Dedup.containmentReport]] matches on), document
    * frequency and the full postings list (doc:pos, position-aware so
    * a phrase hit can be widened in place), restricted to rare grams
    * (df ≤ maxDf — common grams are stop-listed exactly like the
    * decontamination df cap, and their postings would dominate
    * storage for no lookup value). Postings serialize as an ORDERED
    * string so the artifact is byte-deterministic on every engine.
    * One explode + one partial-agg shuffle.
    */
  def invertedIndex(documents: DataFrame, n: Int = 3, maxDf: Long = 3L): DataFrame =
    documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), posexplode(TextOps.kgrams(col("tk"), n)).as(Seq("pos", "term")))
      .groupBy("term")
      .agg(
        countDistinct("doc_id").as("df"),
        count(lit(1)).as("n_postings"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("pos")))),
            x => concat_ws(":", x.getField("doc_id"), x.getField("pos"))))
          .as("postings"))
      .filter(col("df") <= maxDf)
      .orderBy("term")

  /** Count-min sketch table over one occurrence per input ROW of
    * `keyCol`: (d, bucket, cnt) for d ∈ [0, depth), bucket ∈
    * [0, width). Bucket hash is the engine-portable md5 form the
    * minhash family uses (60-bit hex prefix, salted with the row
    * index: md5("d:" || key) — DuckDB reproduces it exactly).
    *
    * Scale shape: one partial-aggregating shuffle — the map side
    * absorbs everything to ≤ depth·width rows per partition, so the
    * exchange carries the SKETCH, not the corpus, at any input size.
    * The result is MERGEABLE: sketches of disjoint shards sum
    * per-(d, bucket) into the sketch of the union (spec-proven),
    * which is what makes it maintainable incrementally — re-sketching
    * 100 TB to absorb a daily shard is never needed.
    */
  def cmsSketch(items: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame =
    items
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(d, col(keyCol), width).as("bucket"))): _*)).as("db"))
      .select(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** CMS point estimates for a frame of candidate keys: (key, est)
    * with est = min over depth rows of the key's bucket counters —
    * the classic overestimate (est ≥ true count, spec-bounded).
    * The sketch side is depth·width rows at most, so the probe is a
    * BROADCAST join whatever the candidate volume; the min-fold is a
    * key-partitioned partial aggregate.
    *
    * Contract: candidate keys must OCCUR in the sketched input (an
    * unseen key's buckets may be absent from the sketch frame and the
    * inner join would drop, not zero, them). Heavy-hitter candidates
    * by construction occur.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame =
    keys
      .select(col(keyCol), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(d, col(keyCol), width).as("bucket"))): _*)).as("db"))
      .select(col(keyCol), col("db.d").as("d"), col("db.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(keyCol)
      .agg(min("cnt").as("est"))

  /** Merge CMS sketches built with the SAME (depth, width, hash):
    * counters sum per (d, bucket). This is the whole incremental
    * story — sketch each daily shard as it lands, fold it into the
    * persisted corpus sketch (a few thousand rows: read, merge,
    * overwrite), and heavy-hitter queries stay current without ever
    * re-reading history. Mixing sketches of different shapes is a
    * correctness error the row counts can't always catch — keep the
    * parameters with the table.
    */
  def mergeCmsSketches(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))

  private def cmsBucket(d: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$d:"), key)), 1, 15), 16, 10)
      .cast("long") % width

  /** Heavy word n-grams by count-min sketch: every n-gram OCCURRENCE
    * (not distinct-per-doc) feeds the sketch; candidates come from a
    * deterministic 1/`sampleMod` document slice (a true heavy hitter
    * appears in any non-trivial sample of the corpus; the slice
    * filter runs at the scan, BEFORE tokenization — the second pass
    * re-reads cheap raw bytes instead of caching the corpus-sized
    * token frame, and tokenizes only the sampled docs);
    * output is every sampled n-gram whose CMS estimate reaches
    * `threshold`, (gram, est) ordered by gram.
    *
    * This is the 100 TB shape for "what phrases dominate my corpus":
    * exact n-gram counting ([[vocabulary]]) shuffles the full type
    * table; the sketch bounds the exchange at depth·width rows and
    * stays mergeable across shards, at the price of ε·N overestimates
    * (ε = e/width) that the threshold filter tolerates by design.
    */
  def cmsHeavyHitters(documents: DataFrame, threshold: Long,
      n: Int = 2, sampleMod: Int = 20,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    def grams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), explode(TextOps.kgrams(col("tk"), n)).as("gram"))
    val sketch = cmsSketch(grams(documents), "gram", depth, width)
    val cands = grams(documents.filter(col("doc_id") % sampleMod === 0))
      .select("gram").distinct()
    cmsEstimate(sketch, cands, "gram", depth, width)
      .filter(col("est") >= threshold)
      .orderBy("gram")
  }

  /** Mixture UPSAMPLING — the other half of the mixture toolkit
    * ([[mixtureSample]]/[[mixtureSampleTemperature]] sample big
    * sources DOWN; this repeats small sources UP): each source gets
    * an epoch count of ceil(n_max / n_source) capped at `maxEpochs`
    * (the "a few epochs of the rare high-quality source" pattern —
    * unbounded repetition memorizes), emitted as one (doc_id, source,
    * epoch) row per pass so the training manifest materializes the
    * repetition explicitly. All arithmetic is integer ((n_max + n −
    * 1) div n — no doubles anywhere), so the gate is exact.
    *
    * Scale shape: per-source counts are one map-side-combined agg;
    * the ≤|sources|-row epoch table broadcasts back onto the corpus;
    * the explode multiplies rows by the bounded epoch count only.
    */
  def mixtureEpochs(documents: DataFrame, maxEpochs: Int = 4): DataFrame = {
    val counts = documents.groupBy("source").agg(count(lit(1)).as("n"))
    val nMax = counts.agg(max("n").as("n_max"))
    val reps = counts.crossJoin(broadcast(nMax))
      .select(col("source"),
        least(expr("(n_max + n - 1) div n"), lit(maxEpochs.toLong)).as("epochs"))
    documents.select("doc_id", "source")
      .join(broadcast(reps), Seq("source"))
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * each candidate document by how much its hashed-feature
    * distribution resembles a target slice's, so sampling by score
    * shifts the corpus mixture toward the target domain. Features are
    * unigram tokens folded into `buckets` md5-prefix buckets (the
    * engine-portable hash shared with [[hashedTfIdfVectors]] and the
    * CMS); the target is the deterministic `doc_id % refMod <
    * refSlots` slice (the [[lmCoverageScores]] contract) and
    * candidates are the held-out rest.
    *
    * Portability: DSIR's per-feature log-ratio sum would not gate
    * (engine logs differ in the last ulp); the linear-ratio ANALOGUE
    * here — an intentional portability trade-off, NOT a monotone
    * transform of the log-ratio sum, so document rankings can differ
    * from true DSIR — keeps everything integral: the per-bucket
    * weight is floor(10⁶·(tc+1)/(rc+1) + 0.5), an exact integer from
    * ONE IEEE division of exact integers (add-1 smoothing keeps
    * unseen-in-target buckets finite), a document's raw score is an
    * order-free INTEGER sum of those weights, and the final
    * per-token mean is the one deferred division.
    *
    * Scale shape: the weight table is ≤ `buckets` rows — built from
    * two map-side-combined counts over one narrow tokenize pass,
    * then BROADCAST to the candidate side; candidates aggregate
    * per-doc sums with map-side partials. Nothing corpus-sized
    * shuffles except the per-doc aggregation itself, and the target
    * slice (fixed and curated in the DSIR deployment) is read once
    * however large the candidate crawl grows.
    */
  def importanceWeights(documents: DataFrame, buckets: Int = 1024,
      refMod: Int = 10, refSlots: Int = 3): DataFrame = {
    val bucket = conv(substring(md5(col("w")), 1, 15), 16, 10)
      .cast("long") % buckets
    val toks = documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .select(col("doc_id"), bucket.as("b"))
    val isRef = col("doc_id") % refMod < refSlots
    val tc = toks.filter(isRef).groupBy("b").agg(count(lit(1)).as("tc"))
    val rc = toks.filter(!isRef).groupBy("b").agg(count(lit(1)).as("rc"))
    val w = rc.join(tc, Seq("b"), "left")
      .select(col("b"),
        floor((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double")
          / (col("rc") + lit(1L)) * lit(1000000.0) + lit(0.5))
          .cast("long").as("wq"))
    toks.filter(!isRef)
      .join(broadcast(w), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("wq").as("swq"))
      .withColumn("score",
        Exact.quant6(col("swq").cast("double") / lit(1000000.0) / col("n_tok")))
      .orderBy("doc_id")
  }

  /** The DSIR RESAMPLING step — [[importanceWeights]] scores, this
    * SELECTS: accept a candidate document iff its deterministic
    * content-hash uniform (first 16 fingerprint bits) falls below its
    * importance score, i.e. acceptance probability min(1, score)
    * under a fixed unit scaling — proportional-to-importance Bernoulli
    * with no PRNG, re-runnable bit-for-bit. The accept test is pure
    * integer cross-multiplication (u·n_tok·10⁶ < swq·2¹⁶ — bounded
    * well under 2⁶³ at any corpus: u < 2¹⁶ and swq ≤ n_tok·10⁹),
    * so the kept set is engine-exact. Output: accepted (doc_id,
    * score), the target-like slice of the crawl.
    */
  def importanceResample(documents: DataFrame, buckets: Int = 1024,
      refMod: Int = 10, refSlots: Int = 3): DataFrame = {
    val w = importanceWeights(documents, buckets, refMod, refSlots)
    val u = conv(substring(TextOps.fingerprint(col("text")), 1, 4), 16, 10)
      .cast("long")
    documents.select(col("doc_id"), u.as("u16"))
      .join(w, "doc_id")
      .filter(col("u16") * col("n_tok") * lit(1000000L) < col("swq") * lit(65536L))
      .select(col("doc_id"), col("score"))
      .orderBy("doc_id")
  }

  /** Reference-LM coverage scoring — the CCNet-style "does this look
    * like my reference corpus" quality signal, with transcendental-free
    * arithmetic. CCNet ranks CommonCrawl documents by the perplexity of
    * a Wikipedia-trained Kneser-Ney LM; the portable analogue here
    * scores each held-out document by how far down the backoff chain a
    * reference n-gram table must reach to explain its trigrams:
    *
    *   level 3 — the exact trigram occurs in the reference slice;
    *   level 2 — only its bigram suffix (w2 w3) does (first backoff);
    *   level 1 — only the unigram w3 does (second backoff);
    *   level 0 — out-of-vocabulary even at the unigram level.
    *
    * A fluent document resolves almost everything at level 3/2; gibberish
    * and lorem-noise fall through to 1/0 — exactly the separation a
    * perplexity threshold buys, but every emitted number is an integer
    * count plus ONE deferred IEEE division (`coverage = n_hit3/n_tri`),
    * so the gate hashes bit-identically (log-space perplexity would not;
    * see the linear-idf precedent on [[tfidfTopTerms]]).
    *
    * The reference slice is the deterministic `doc_id % refMod <
    * refSlots` shard (defaults: 30% of the corpus); scored docs are the
    * held-out rest — self-scoring the reference would saturate level 3.
    *
    * Scale shape: the reference n-gram tables are DISTINCT sets bounded
    * by the reference slice's type count (sublinear in corpus size —
    * Heaps' law), not its token count; the three backoff probes are
    * plain equi-joins on ngram keys, each broadcast-eligible when the
    * reference slice is small (the CCNet deployment: a fixed curated
    * reference scoring an unbounded crawl — at 100 TB the score side
    * scans once and each join shuffles only on hashed gram keys, with
    * partial aggregation collapsing the per-doc counts map-side).
    */
  def lmCoverageScores(documents: DataFrame,
      refMod: Int = 10, refSlots: Int = 3): DataFrame = {
    val grams = documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(TextOps.kgrams(col("tk"), 3)).as("g"))
      .select(col("doc_id"),
        element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"),
        element_at(split(col("g"), " "), 3).as("w3"))
    val isRef = col("doc_id") % refMod < refSlots
    val ref = grams.filter(isRef)
    val ref3 = ref.select("w1", "w2", "w3").distinct().withColumn("h3", lit(1))
    val ref2 = ref.select("w2", "w3").distinct().withColumn("h2", lit(1))
    val ref1 = ref.select("w3").distinct().withColumn("h1", lit(1))
    grams.filter(!isRef)
      .join(ref3, Seq("w1", "w2", "w3"), "left")
      .join(ref2, Seq("w2", "w3"), "left")
      .join(ref1, Seq("w3"), "left")
      .select(col("doc_id"),
        when(col("h3") === 1, 3).when(col("h2") === 1, 2)
          .when(col("h1") === 1, 1).otherwise(0).as("lvl"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tri"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_hit2"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_hit1"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("coverage",
        Exact.quant6(col("n_hit3").cast("double") / col("n_tri")))
      .orderBy("doc_id")
  }
}
