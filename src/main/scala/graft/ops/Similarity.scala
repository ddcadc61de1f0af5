package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Mid-plan persists in this module register in a scoped cache ledger
  * ([[graft.core.GraftCaches]]); call [[releaseCaches]] after the
  * terminal action, exactly like the Dedup family.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set against the corpus; one narrow pass, no shuffle until the
  * per-query top-k (TakeOrdered-style via ranking window over
  * query-partitioned rows).
  *
  * Scale path: random-hyperplane LSH — a deterministic 16-bit
  * signature per vector buckets the corpus; queries probe their own
  * bucket plus all hamming-1 neighbors. Candidates per query drop from
  * |corpus| to |corpus|/2^bits · probes, turning the cross product
  * into an equi-join. For true 100 TB use the same structure with
  * more bits + IVF-style re-ranking; recall is tested in
  * SimilaritySpec against the brute-force oracle.
  *
  * Numeric portability: vectors are cast float→double BEFORE any
  * arithmetic, and dot/norm accumulate left-to-right — bitwise
  * identical to the DuckDB oracle's `::DOUBLE[]` math.
  */
object Similarity {

  private val ledger = graft.core.GraftCaches.newLedger()

  /** Unpersist every frame THIS module persisted mid-plan (see the
    * Dedup twin for the full contract). Call after the pipeline's
    * terminal action.
    */
  def releaseCaches(): Unit = ledger.release()

  /** Σ a_i·b_i over two double arrays — the native codegen'd
    * [[graft.plans.DotProduct]] when the graft extensions are
    * installed (GraftSession always installs them), else the
    * composable higher-order fold. Both are the same left-to-right
    * sequential accumulation: bit-identical results, different speed
    * (the native loop skips the intermediate array + lambda dispatch).
    *
    * Resolves against the ACTIVE session; the DataFrame-taking entry
    * points below use [[dotWith]] pinned to the frame's own session
    * instead — a frame built while a different session is active must
    * not silently lose the native path (or fail analysis if the
    * active session lacks the extension).
    */
  def dot(a: Column, b: Column): Column = dotWith(SparkSession.active)(a, b)

  private def dotWith(session: SparkSession)(a: Column, b: Column): Column =
    if (session.catalog.functionExists("graft_dot")) call_function("graft_dot", a, b)
    else aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: queries = vec_id < nQueries, corpus =
    * the rest. Ranking uses the ROUNDED cosine + vec_id tiebreak so
    * order is stable under float noise.
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    bruteTopK(e, nQueries, k, dp)
  }

  /** Seeded Gaussian RANDOM PROJECTION (Johnson–Lindenstrauss):
    * dim→outDim by `outDim` fixed hyperplane dots — the 4× (64→16)
    * index-memory/compute cut that approximately preserves pairwise
    * angles (JL lemma), composing with every downstream serving path
    * because the output carries the standard (vec_id, embedding)
    * shape. The projection matrix is the seeded [[hyperplanes]]
    * family — driver-side constants baked into both the Spark plan
    * and the oracle twin, so a rebuild (or the twin) reproduces
    * projections bit-for-bit; each component is one sequential-fold
    * dot (the s31 portability contract). A new shard projects with
    * the same seed and appends — nothing recomputes.
    */
  def projectEmbeddings(embeddings: DataFrame, outDim: Int = 16,
      dim: Int = 64, seed: Long = 99L): DataFrame = {
    val planes = hyperplanes(outDim, dim, seed)
    val dp = dotWith(embeddings.sparkSession) _
    val v = asDouble(col("embedding"))
    embeddings.select(col("vec_id"),
      array(planes.toSeq.map(p =>
        dp(v, array(p.toSeq.map(lit): _*))): _*).as("embedding"))
  }

  /** Brute-force cosine top-k over the PROJECTED space — the
    * reduced-dimension serving path ([[recallAtK]] against
    * [[cosineTopK]] measures what the 4× cut costs in recall).
    */
  def projectedTopK(embeddings: DataFrame, outDim: Int = 16,
      nQueries: Int = 5, k: Int = 5, seed: Long = 99L): DataFrame =
    cosineTopK(projectEmbeddings(embeddings, outDim, seed = seed), nQueries, k)

  /** MMR (maximal marginal relevance) RERANK: greedy diversification
    * of a BOUNDED candidate set — pick k items maximizing
    * λ·relevance − (1−λ)·max-cosine-to-already-selected, so the
    * result covers the query's facets instead of returning k
    * paraphrases of the best hit. This is a SERVING-TIER operator by
    * contract: `candidates` is the top-N of a retrieval stage (N tens
    * to hundreds — bounded by construction, NOT a corpus), and the k
    * greedy rounds are k tiny distributed jobs over that bounded
    * frame (each: one broadcast of ≤k selected vectors + an argmax);
    * `localCheckpoint` per round keeps lineage flat. The corpus-sized
    * work stays in the retrieval stage that produced the candidates.
    *
    * Exactness: similarities and the MMR objective are quantized to
    * 6 dp before every argmax (ties by doc_id), and the (1−λ) factor
    * is the IEEE result of computing it from λ — interpolated
    * verbatim into the twin, which unrolls the k rounds in SQL.
    *
    * `candidates`: (doc_id, score, v). Output: (rnk, doc_id, score,
    * mmr).
    */
  def mmrRerank(candidates: DataFrame, k: Int = 5,
      lambda: Double = 0.7): DataFrame =
    mmrRerankBatch(candidates.withColumn("query_id", lit(0L)), k, lambda)
      .select("rnk", "doc_id", "score", "mmr")
      .orderBy("rnk")

  /** BATCH MMR serving — [[mmrRerank]] for a query TABLE, in ONE
    * composition (the s55 batch-BM25 treatment): the greedy loop
    * stays k rounds of driver-side composition, but each round is a
    * single distributed job that advances EVERY query's selection at
    * once — the per-query argmax is a `query_id`-partitioned
    * row_number, and the max-sim-to-selected join keys on `query_id`
    * with the ≤|queries|·k selected vectors broadcast. k bounds the
    * round count no matter how many queries the table carries, so
    * serving a million-query rerank batch costs the SAME k jobs as
    * one query — that's the whole point.
    *
    * Exactness contract is [[mmrRerank]]'s verbatim (quantized
    * objective, (mmr DESC, doc_id) tie-break, IEEE (1−λ)); the
    * single-query path DELEGATES here, so the two can never drift.
    * `candidates`: (query_id, doc_id, score, v), the bounded top-N of
    * a per-query retrieval stage. Output: (query_id, rnk, doc_id,
    * score, mmr); a query with fewer than k candidates exhausts
    * early and emits the rows it has.
    */
  def mmrRerankBatch(candidates: DataFrame, k: Int = 5,
      lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    val dp = dotWith(spark) _
    val oneMinus = 1.0 - lambda
    var rem = candidates.select(col("query_id"), col("doc_id"), col("score"), col("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
      .localCheckpoint()
    var selected: DataFrame = null
    var out: DataFrame = null
    val w = Window.partitionBy("query_id").orderBy(col("mmr").desc, col("doc_id"))
    for (i <- 1 to k) {
      val scored =
        if (selected == null)
          rem.withColumn("mmr", Exact.quant6(lit(lambda) * col("score")))
        else {
          val s = selected.select(col("query_id"),
            col("v").as("sv"), col("nrm").as("sn"))
          val maxsim = rem.join(broadcast(s), Seq("query_id"))
            .withColumn("sim",
              Exact.quant6(dp(col("v"), col("sv")) / (col("nrm") * col("sn"))))
            .groupBy("query_id", "doc_id").agg(max("sim").as("maxsim"))
          rem.join(maxsim, Seq("query_id", "doc_id"))
            .withColumn("mmr", Exact.quant6(
              lit(lambda) * col("score") - lit(oneMinus) * col("maxsim")))
        }
      val pick = scored
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("query_id"), col("doc_id"), col("score"), col("v"),
          col("nrm"), col("mmr"))
        .localCheckpoint()
      selected =
        if (selected == null) pick
        else selected.unionByName(pick).localCheckpoint()
      val row = pick.select(col("query_id"), lit(i.toLong).as("rnk"),
        col("doc_id"), col("score"), col("mmr"))
      out = if (out == null) row else out.unionByName(row)
      rem = rem.join(pick.select("query_id", "doc_id"),
        Seq("query_id", "doc_id"), "left_anti")
        .localCheckpoint()
    }
    out.orderBy("query_id", "rnk")
  }

  /** [[mmrRerank]] driven end-to-end from an embedding table: the
    * cosine top-`n` of query 0 (the s31 retrieval stage) feeds the
    * greedy diversification — the gate's deterministic composition.
    */
  def mmrRerankTop(embeddings: DataFrame, n: Int = 10, k: Int = 5,
      lambda: Double = 0.7): DataFrame = {
    val cand = cosineTopK(embeddings, nQueries = 1, k = n)
      .select(col("vec_id"), col("cos").as("score"))
      .join(embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v")),
        "vec_id")
      .withColumnRenamed("vec_id", "doc_id")
    mmrRerank(cand, k, lambda)
  }

  /** [[mmrRerankBatch]] driven end-to-end from an embedding table:
    * the cosine top-`n` of the first `nQueries` queries feeds one
    * batched greedy diversification — every query reranks in the
    * same k jobs.
    */
  def mmrRerankTopBatch(embeddings: DataFrame, nQueries: Int = 3,
      n: Int = 10, k: Int = 5, lambda: Double = 0.7): DataFrame = {
    val cand = cosineTopK(embeddings, nQueries = nQueries, k = n)
      .select(col("query_id"), col("vec_id"), col("cos").as("score"))
      .join(embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v")),
        "vec_id")
      .withColumnRenamed("vec_id", "doc_id")
    mmrRerankBatch(cand, k, lambda)
  }

  /** Broadcast-query brute-force top-k over a prepared (vec_id, v,
    * nrm) frame — shared by the full-precision and the quantized
    * serving paths.
    */
  private def bruteTopK(
      e: DataFrame, nQueries: Int, k: Int,
      dp: (Column, Column) => Column): DataFrame =
    topKAgainst(
      e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")),
      e.filter(col("vec_id") >= nQueries), k, dp)

  /** Broadcast a prepared (query_id, qv, qn) query set against a
    * prepared (vec_id, v, nrm) corpus — the shared top-k tail of
    * every full-scan serving path.
    */
  private def topKAgainst(
      q: DataFrame, corpus: DataFrame, k: Int,
      dp: (Column, Column) => Column): DataFrame = {
    val scored = corpus.join(broadcast(q))
      .withColumn("cos", Exact.quant6(dp(col("qv"), col("v")) / (col("qn") * col("nrm"))))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "cos")
      .orderBy("query_id", "rnk")
  }

  /** Symmetric int8-range quantization: per vector, scale = max |xᵢ|
    * and qᵢ = round(xᵢ/scale·127) — the 4× (fp32→int8) memory
    * compression a billion-vector serving index runs on. Pure column
    * math, bit-portable (round is floor(+0.5), one division order,
    * mirrored in the twin); the zero vector quantizes to zeros.
    */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .select(col("vec_id"), col("scale"),
        when(col("scale") > 0.0,
          transform(col("v"), x => floor(x / col("scale") * 127.0 + 0.5).cast("long")))
          .otherwise(transform(col("v"), _ => lit(0L))).as("q"))

  /** [[cosineTopK]] over the DEQUANTIZED int8 index — the serving
    * path that trades ≤1/254-per-component error for 4× less index
    * memory; the spec bounds its ranking drift against full
    * precision, and the gate (s43) pins the exact dequantized scores
    * via the identical twin arithmetic.
    */
  def quantizedTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = dequantizedEmbeddings(embeddings)
      .withColumnRenamed("embedding", "v")
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    bruteTopK(e, nQueries, k, dp)
  }

  /** quantize → dequantize: the int8-rounded embedding frame — the
    * values a serving tier actually scores against when its index is
    * stored int8. Feeding this into any index build ([[annIndexFrame]],
    * [[ivfIndexFrames]]) composes 4× index-memory compression with
    * that index's serving path; the s45 gate pins the ANN composition
    * bit-exactly and the drift spec bounds its ranking error.
    */
  def dequantizedEmbeddings(embeddings: DataFrame): DataFrame =
    quantizeEmbeddings(embeddings)
      .select(col("vec_id"),
        transform(col("q"), x => x.cast("double") * col("scale") / 127.0).as("embedding"))

  /** Hamming-≤2 probe masks over `bits` bit positions: 0, all single
    * bits, all bit pairs. 1 + bits + bits·(bits-1)/2 masks.
    */
  def probeMasks(bits: Int): Array[Long] = {
    val singles = (0 until bits).map(1L << _)
    val pairs = for { i <- 0 until bits; j <- i + 1 until bits } yield (1L << i) | (1L << j)
    (0L +: (singles ++ pairs)).toArray
  }

  /** Near-duplicate embedding pairs: cosine ≥ threshold, a < b,
    * found via sign-sketch banded LSH + exact cosine verify.
    *
    * Signature: 64 sign bits (bit j = v[j] > 0 — axis-aligned random
    * hyperplanes, valid for isotropic embeddings; bit-exact in every
    * engine since it's a float comparison, no arithmetic). Split into
    * 4 bands × 16 bits; a pair becomes a candidate when some band
    * keys are within hamming ≤ 2 (left side explodes into the 137
    * probe masks). For a true near-dup at cos 0.95 (per-bit disagree
    * p = θ/π ≈ 0.101) recall is ≈ 99.8%; a random pair (p = 0.5)
    * is a candidate with p ≈ 0.008 — the n² cross join never happens.
    * Exact cosine over candidates keeps only real pairs.
    *
    * The DuckDB oracle twin implements the IDENTICAL candidate rule,
    * so the gate is hash-exact by construction; recall vs brute force
    * is bounded separately in SimilaritySpec (the driver corpus has
    * no near-dups — max pairwise cos ≈ 0.51 at every SF — so the
    * declared query is empty-but-consistent there).
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.9): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = normedVecs(embeddings, dp)
    val banded = signBands(e)
    val probed = probeExplode(banded)
    val cand = probed
      .join(banded.select(col("vec_id").as("vec_b"), col("band"), col("bkey")), Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    verifyCosPairs(cand, e, threshold, dp)
  }

  /** (vec_id, v DOUBLE[], nrm) — the verification-ready vector frame. */
  private def normedVecs(
      embeddings: DataFrame, dp: (Column, Column) => Column): DataFrame =
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))

  /** Sign-sketch band keys (vec_id, band, bkey): 64 sign bits in
    * 4×16-bit bands — the near-dup candidate substrate, shared by the
    * one-shot and incremental forms.
    */
  private def signBands(e: DataFrame): DataFrame = {
    def bandKey(b: Int): Column =
      (0 until 16).map(i =>
        when(element_at(col("v"), b * 16 + i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
    e.select(col("vec_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("bkey"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** The hamming-≤2 multiprobe: each band key explodes into its 137
    * probe masks. Probing from ONE side covers the symmetric radius
    * (xor is an involution: a ⊕ m = b ⇔ b ⊕ m = a).
    */
  private def probeExplode(banded: DataFrame): DataFrame = {
    val masks = array(probeMasks(16).map(lit): _*)
    banded.select(col("vec_id").as("vec_a"), col("band"),
      explode(transform(masks, m => col("bkey").bitwiseXOR(m))).as("bkey"))
  }

  /** Exact-cosine verification over candidate (vec_a, vec_b) pairs. */
  private def verifyCosPairs(
      cand: DataFrame, e: DataFrame, threshold: Double,
      dp: (Column, Column) => Column): DataFrame = {
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(a, "vec_a").join(b, "vec_b")
      .withColumn("cos", Exact.quant6(dp(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** Persisted sign-sketch index over already-embedded history —
    * [[graft.ops.Dedup.MinhashIndex]]'s vector-side twin. `bands`
    * bucketed by (band, bkey) makes the daily probe bucket-local;
    * `vecs` bucketed by vec_id does the same for verification.
    */
  final case class EmbIndex(bands: DataFrame, vecs: DataFrame)

  def embeddingIndexFrames(embeddings: DataFrame): EmbIndex = {
    val dp = dotWith(embeddings.sparkSession) _
    // persisted (tracked): bands and vecs both read the normed frame
    // (and in the in-query gate shape, so does verification)
    val e = ledger.persist(normedVecs(embeddings, dp))
    EmbIndex(signBands(e), e)
  }

  def writeEmbeddingIndex(
      index: EmbIndex, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit = {
    writer.commitBucketed(index.bands, s"${name}_bands", buckets, Seq("band", "bkey"),
      replace = writer.replaces)
    writer.commitBucketed(index.vecs, s"${name}_vecs", buckets, Seq("vec_id"),
      replace = writer.replaces)
  }

  def readEmbeddingIndex(spark: SparkSession, name: String): EmbIndex =
    EmbIndex(
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_bands"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_vecs"))

  /** Candidate pairs for the incremental embedding probe (with
    * duplicates): new probes × indexed keys plus new probes × new
    * keys — the indexed bands enter exactly ONE join, so old×old
    * candidacy has no plan node that could produce it. Package-
    * visible so the spec can plan-assert the probe in isolation.
    */
  private[graft] def incrementalEmbCandidates(
      newBands: DataFrame, indexBands: DataFrame): DataFrame = {
    val probed = probeExplode(newBands)
    val candOld = probed
      .join(indexBands.select(col("vec_id").as("vec_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
    val candNew = probed
      .join(newBands.select(col("vec_id").as("vec_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    candOld.unionByName(candNew)
  }

  /** [[embeddingNearDup]] for a NEW batch of vectors against an
    * indexed history: output equals the full recompute restricted to
    * pairs with ≥1 new side (same probe radius — one-sided probing
    * covers the symmetric hamming ball — same exact-cosine verify),
    * but old×old candidacy is unrepresentable: the index's bands
    * enter exactly one join, probed by the new batch. Contract: new
    * vec_ids disjoint from indexed ones.
    */
  def incrementalEmbeddingNearDup(
      newVecs: DataFrame, index: EmbIndex, threshold: Double = 0.9): DataFrame = {
    val dp = dotWith(newVecs.sparkSession) _
    val newIdx = embeddingIndexFrames(newVecs)
    // persisted (tracked): the new band frame probes twice (vs index,
    // vs itself), and cand feeds the history-vecs semi-join AND the
    // verify join — unpersisted, each subtree would run per consumer
    val newBands = ledger.persist(newIdx.bands)
    val cand = ledger.persist(
      incrementalEmbCandidates(newBands, index.bands).distinct())
    val candIds = cand
      .select(explode(array(col("vec_a"), col("vec_b"))).as("vec_id")).distinct()
    val oldNeeded = index.vecs.join(candIds, Seq("vec_id"), "left_semi")
    verifyCosPairs(cand, oldNeeded.unionByName(newIdx.vecs), threshold, dp)
  }

  /** Derivation that makes the near-dup gate row NON-vacuous: the
    * fixture corpus has no genuine near-dups (max pairwise cos ≈ 0.51
    * at every SF), so [[embeddingNearDup]] over it can only ever
    * compare empty frames — a gate that could never catch a broken
    * candidate rule. This plants them IN-QUERY with pure column
    * arithmetic both engines reproduce bit-exactly: every vec_id ≡ 0
    * (mod `mod`) gains a copy at vec_id+`offset` whose LAST component
    * is negated. cos(v, v') = 1 − 2·v₆₄²/|v|² ≈ 0.97 for isotropic
    * 64-dim vectors — a true near-dup, not an identical row — and its
    * sign sketch differs from the original's in exactly one bit of
    * band 3, inside the hamming-≤2 probe radius, so the LSH MUST
    * surface it. Float negation is sign-bit flip: exact in IEEE, so
    * the planted vectors are bit-identical across engines.
    */
  def plantNearDups(
      embeddings: DataFrame, mod: Long = 10, offset: Long = 1000000L): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val planted = embeddings.filter(col("vec_id") % mod === 0)
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 63, -x).otherwise(x)).as("embedding"))
    base.unionByName(planted)
  }

  /** Brute-force near-dup (O(n²/2) cross join) — the recall ORACLE for
    * [[embeddingNearDup]] in SimilaritySpec, never the declared query:
    * at corpus scale the cross join is the one shape that can't run.
    */
  def embeddingNearDupBrute(embeddings: DataFrame, threshold: Double = 0.9): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", Exact.quant6(dp(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** Deterministic random hyperplanes: `bits` planes × `dim` components
    * from a seeded PRNG (driver-side constants, baked into the plan).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits, dim)(rng.nextGaussian())
  }

  /** LSH bucket id: sign-bit signature against the hyperplanes. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    lshBucketWith(SparkSession.active)(v, planes)

  private def lshBucketWith(session: SparkSession)(
      v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dotWith(session)(v, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** HARD-NEGATIVE MINING for contrastive training — per anchor, the
    * top-k most-similar corpus vectors whose cosine falls in
    * [lo, hi): similar enough to be informative negatives, below the
    * near-duplicate ceiling that would make them false negatives
    * (the standard in-batch-negatives upgrade for embedding-model
    * training). Candidates come from the SAME multiprobe LSH bucket
    * rule as [[annLsh]] (equi-join on bucket, no cross product — the
    * 100 TB path), scores are the quantized exact cosine, and the
    * band filter runs BEFORE the per-anchor rank so k survivors are
    * k in-band negatives, not k candidates. Output:
    * (query_id, rnk, vec_id, cos).
    */
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      lo: Double = 0.2, hi: Double = 0.98,
      bits: Int = 12, dim: Int = 64): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val idx = annIndexFrame(embeddings, bits, dim)
      .filter(col("vec_id") >= nQueries)
    val probes = array(lit(0L) +: (0 until bits).map(i => lit(1L << i)): _*)
    val q = annIndexFrame(embeddings.filter(col("vec_id") < nQueries),
        bits, dim)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    val scored = q.join(idx, Seq("bucket"))
      .withColumn("cos",
        Exact.quant6(dp(col("qv"), col("v")) / (col("qn") * col("nrm"))))
      .filter(col("cos") >= lo && col("cos") < hi)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.select("query_id", "vec_id", "cos").distinct()
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "vec_id", "cos")
  }

  /** Approximate top-k: candidates share the query's bucket or any
    * hamming-1 neighbor bucket (multiprobe). Equi-join on bucket —
    * shuffle-partitioned by bucket, no cross product.
    */
  def annLsh(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
             bits: Int = 12, dim: Int = 64): DataFrame = {
    val e = annIndexFrame(embeddings, bits, dim)
    annLshServe(
      embeddings.filter(col("vec_id") < nQueries),
      e.filter(col("vec_id") >= nQueries), k, bits, dim)
  }

  /** The ANN serving substrate: corpus vectors with norm and LSH
    * bucket precomputed — (vec_id, v, nrm, bucket). Persist bucketed
    * BY `bucket` ([[writeAnnIndex]]) and every query probe joins the
    * corpus in place; embedding a new shard appends its frame (the
    * hyperplanes are seeded constants, so bucket ids never shift).
    */
  def annIndexFrame(embeddings: DataFrame, bits: Int = 12, dim: Int = 64): DataFrame = {
    val session = embeddings.sparkSession
    val dp = dotWith(session) _
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
      .withColumn("bucket", lshBucketWith(session)(col("v"), hyperplanes(bits, dim)))
  }

  def writeAnnIndex(
      index: DataFrame, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit =
    writer.commitBucketed(index, name, buckets, Seq("bucket"),
      replace = writer.replaces)

  def readAnnIndex(spark: SparkSession, name: String): DataFrame =
    graft.sinks.LakeWriter.readBucketedTable(spark, name)

  /** ANN k-NN SERVING: raw query vectors against a prepared (or
    * persisted, bucket-local) index — the online half of [[annLsh]],
    * which is now query-set-vs-rest over one in-memory frame of this
    * same shape. Hamming-1 multiprobe on the query side only; the
    * index side is never exploded and, when bucketed, never shuffled.
    */
  def annLshServe(queries: DataFrame, index: DataFrame, k: Int = 5,
                  bits: Int = 12, dim: Int = 64): DataFrame = {
    val dp = dotWith(queries.sparkSession) _
    val probes = array(lit(0L) +: (0 until bits).map(i => lit(1L << i)): _*)
    val q = annIndexFrame(queries, bits, dim)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(transform(probes, m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val scored = q.join(index, Seq("bucket"))
      .withColumn("cos", Exact.quant6(dp(col("qv"), col("v")) / (col("qn") * col("nrm"))))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .select("query_id", "vec_id", "cos").distinct()
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "vec_id", "cos")
  }

  /** A few Lloyd (k-means) iterations over seed centroids: assign
    * every corpus vector to its nearest centroid (broadcast join +
    * ranking, same shape as the IVF assign itself), then recompute
    * each cell's element-wise mean. The mean is a partial-aggregating
    * groupBy — per-partition combines mean only |cells|·dim partial
    * rows cross the shuffle, never vectors — so each iteration costs
    * one broadcast pass + one tiny shuffle at any corpus size. Cells
    * that lose all members drop out (standard k-means behavior;
    * probing simply has fewer, tighter cells to choose from).
    *
    * ORACLE-SAFE refinement: centroid components come from
    * [[Exact.meanOf6]] — a per-component quantize → exact decimal sum
    * → single division, order-independent by construction — never a
    * raw `avg()` (grouped double means accumulate in engine-chosen
    * order). The refined centroids are therefore bit-identical to the
    * DuckDB twin's, which makes every downstream assignment, probe
    * ranking and score identical too (s36 in the gate).
    */
  private def lloydRefine(corpus: DataFrame, seed: DataFrame, iters: Int): DataFrame = {
    val dp = dotWith(corpus.sparkSession) _
    var cents = seed
    for (_ <- 0 until iters) {
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
      val assigned = corpus.crossJoin(broadcast(cents))
        .withColumn("sim", dp(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cid"), col("v"))
      cents = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy("cid", "pos").agg(Exact.meanOf6(col("col")).as("m"))
        .groupBy("cid").agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
        .select(col("cid"),
          transform(array_sort(col("pm")), p => p.getField("m")).as("cv"))
        .withColumn("cn", sqrt(dp(col("cv"), col("cv"))))
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: the corpus is assigned to
    * its nearest of `nCells` coarse centroids once, and each query
    * scores ONLY the lists of its `nProbe` nearest centroids — an
    * equi-join on cell id, `nProbe/nCells` of the corpus touched per
    * query. Centroids seed from a deterministic corpus subsample (the
    * first `nCells` vectors) and are tightened by `kmeansIters` Lloyd
    * sweeps ([[lloydRefine]]) — tighter cells mean fewer misses at
    * equal nProbe. The PLAN — broadcast centroids, argmax assign,
    * cell-partitioned join — is what survives a 100 TB corpus.
    */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
              nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 2): DataFrame =
    ivfServe(
      embeddings.filter(col("vec_id") < nQueries),
      ivfIndexFrames(embeddings.filter(col("vec_id") >= nQueries), nCells, kmeansIters),
      k, nProbe)

  /** Top-`keep` nearest centroids per vector of `side` — the shared
    * assign step of index build (keep=1) and query probing (keep=nProbe).
    */
  private def nearestCellsWith(dp: (Column, Column) => Column)(
      cents: DataFrame, side: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    side.crossJoin(broadcast(cents))
      .withColumn("sim", dp(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .drop("cv", "cn", "sim", "rn")
  }

  /** Persisted IVF index: the (tiny) centroid table plus the corpus
    * with its cell assignment — persist `assigned` bucketed BY cid
    * ([[writeIvfIndex]]) and query probes join cells in place. The
    * seed is deterministic (first `nCells` by vec_id) and refinement
    * is [[Exact.meanOf6]]-exact, so a rebuild reproduces the index
    * bit-for-bit.
    */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  def ivfIndexFrames(
      corpus: DataFrame, nCells: Int = 16, kmeansIters: Int = 2): IvfIndex = {
    val dp = dotWith(corpus.sparkSession) _
    val e = normedVecs(corpus, dp)
    val seed = e.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // materialized once: the corpus assign and every query probe read
    // the refined centroids, and the refinement subtree shouldn't
    // re-run per pass — it's |cells| rows, trivially checkpointable
    val cents =
      if (kmeansIters == 0) seed else lloydRefine(e, seed, kmeansIters).localCheckpoint()
    IvfIndex(cents, nearestCellsWith(dp)(cents, e, 1))
  }

  /** The index-build ASSIGN step alone, public for incremental /
    * streaming intakes: new corpus vectors against a FIXED persisted
    * centroid table (assignment is per-row against a broadcast — no
    * retraining, so a streamed index equals the one-shot build over
    * the same corpus bit-for-bit). Output matches
    * [[IvfIndex]].assigned: (vec_id, v, nrm, cid).
    */
  def ivfAssign(centroids: DataFrame, corpus: DataFrame): DataFrame = {
    val dp = dotWith(corpus.sparkSession) _
    nearestCellsWith(dp)(centroids, normedVecs(corpus, dp), 1)
  }

  def writeIvfIndex(
      index: IvfIndex, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit = {
    writer.commitBucketed(index.centroids, s"${name}_cents", 1, Seq("cid"),
      replace = writer.replaces)
    writer.commitBucketed(index.assigned, s"${name}_assigned", buckets, Seq("cid"),
      replace = writer.replaces)
  }

  def readIvfIndex(spark: SparkSession, name: String): IvfIndex =
    IvfIndex(
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_cents"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_assigned"))

  /** IVF k-NN SERVING: raw query vectors against a prepared (or
    * persisted) index — the online half of [[ivfTopK]], which is now
    * this same code over in-memory frames. Probes broadcast the
    * centroid table, pick `nProbe` cells, and join only those cells
    * of the assigned corpus.
    */
  def ivfServe(
      queries: DataFrame, index: IvfIndex, k: Int = 5, nProbe: Int = 4): DataFrame = {
    val dp = dotWith(queries.sparkSession) _
    val probes = nearestCellsWith(dp)(index.centroids, normedVecs(queries, dp), nProbe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("cid"))
    val scored = probes
      .join(index.assigned, "cid")
      .withColumn("cos", Exact.quant6(dp(col("qv"), col("v")) / (col("qn") * col("nrm"))))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored
      .select("query_id", "vec_id", "cos").distinct()
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "vec_id", "cos")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * by clustering embeddings into coarse cells and dropping, within
    * each cell, every vector whose cosine to an EARLIER-id cell-mate
    * meets the threshold — "keep one representative per group of
    * near-identical items", the dedup that catches paraphrases and
    * re-encodes exact/minhash dedup can't see.
    *
    * Deterministic contract (what the oracle checks): cells are the
    * seed-centroid IVF assignment ([[ivfTopK]]'s kmeansIters=0 shape
    * — argmax cosine against the first `nCells` vectors by vec_id);
    * a vector is dropped iff SOME earlier-id vector in its cell has
    * quantized cosine ≥ threshold — whether or not that earlier
    * vector was itself dropped (the paper's one-pass rule; no
    * transitive chasing). `dup_of` reports the smallest such id.
    *
    * Scale shape: the within-cell pair join is an equi-join on cid
    * (shuffle-partitioned, AQE-skew-splittable) costing Σ|cell|² —
    * bounded by growing nCells with the corpus, exactly how the
    * paper runs it (100k clusters over a web corpus keeps cells in
    * the thousands). The DEFAULT (nCells = 0) derives ≈ √N from the
    * corpus count — the balance point between N·nCells assignment
    * and N²/nCells pair cost — so the cost shape survives any scale
    * without retuning; pass an explicit nCells to pin a
    * deterministic oracle contract or a paper-style cluster count.
    * Nothing touches vectors across cells, and the centroid table is
    * broadcast — the corpus shuffles once for assignment and once
    * for the cell join.
    *
    * `kmeansIters` > 0 tightens the seed cells with that many Lloyd
    * sweeps ([[lloydRefine]], the s36-gated machinery — bit-exact
    * order-independent means) before assignment — the paper-faithful
    * configuration: tighter cells put more true paraphrase pairs in
    * the same cell at equal nCells, raising recall without touching
    * the Σ|cell|² cost shape. 0 keeps the deterministic seed-cell
    * contract (the s42 gate); the refined variant is gated as s44.
    */
  def semanticDedup(
      embeddings: DataFrame, nCells: Int = 0, threshold: Double = 0.9,
      kmeansIters: Int = 0): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    // persisted (tracked): seed + assignment both read the normed
    // frame; the assignment feeds both sides of the cell join
    val e = ledger.persist(normedVecs(embeddings, dp))
    // nCells <= 0 → derive ≈ √N from the corpus itself (the IVF
    // balance point: assignment costs N·nCells, the within-cell pair
    // join Σ|cell|² ≈ N²/nCells for balanced cells — √N minimizes
    // their sum, and the count rides the already-persisted normed
    // frame). A fixture-scaled literal default silently degrades to
    // near-quadratic cells on a corpus 1000× bigger; the derived
    // default keeps the cost shape at any scale. Pass nCells
    // explicitly to pin a deterministic oracle contract (the s42/s44
    // gates do) or to match the paper's fixed-cluster-count setup.
    val cells =
      if (nCells > 0) nCells
      else math.max(1, math.ceil(math.sqrt(e.count().toDouble)).toInt)
    val seed = e.orderBy("vec_id").limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    // |cells| rows — checkpoint cuts the per-sweep lineage exactly as
    // in ivfIndexFrames
    val cents =
      if (kmeansIters == 0) seed
      else lloydRefine(e, seed, kmeansIters).localCheckpoint()
    val assigned = ledger.persist(nearestCellsWith(dp)(cents, e, 1))
    val earlier = assigned.select(
      col("cid"), col("vec_id").as("ua"), col("v").as("va"), col("nrm").as("na"))
    val dupOf = assigned.join(earlier, Seq("cid"))
      .filter(col("ua") < col("vec_id"))
      .withColumn("cos", Exact.quant6(dp(col("va"), col("v")) / (col("na") * col("nrm"))))
      .filter(col("cos") >= threshold)
      .groupBy("vec_id").agg(min("ua").as("dup_of"))
    assigned.select("vec_id", "cid")
      .join(dupOf, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cid"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** Product-quantization encoding — the memory technique that takes a
    * billion-vector index from 256 B/vector (fp32×64) to m codes of
    * log₂(nCent) bits (+ a norm): split each vector into `m`
    * contiguous subvectors and replace each with the id of its nearest
    * codebook entry (squared-L2, per subspace). Codebooks here are the
    * SEED form shared with [[ivfTopK]]/[[semanticDedup]]: the first
    * `nCent` corpus vectors by vec_id, sliced per subspace — a
    * deterministic, oracle-expressible contract (k-means-trained
    * codebooks drop in by swapping `cents`; [[lloydRefine]] is the
    * per-subspace analogue and changes nothing downstream).
    *
    * Returns (vec_id, j, cid): the code table, long format — the shape
    * a persisted PQ index stores and [[pqTopK]] consumes. Encoding is
    * one broadcast join (corpus×m subvector rows against m·nCent
    * codewords) + a (vec_id, j)-partitioned argmin window: one shuffle
    * of m small rows per vector, no corpus×corpus anything.
    *
    * Numeric contract: the subspace distance is the sequential
    * left-to-right fold of (xᵢ−cᵢ)² (same [[dot]] machinery), so the
    * argmin — and therefore every code — is bit-reproducible across
    * engines; ties break on cid.
    */
  def pqEncode(embeddings: DataFrame, nQueries: Int = 5,
      m: Int = 8, nCent: Int = 16, dim: Int = 64): DataFrame =
    pqIndexFrames(embeddings.filter(col("vec_id") >= nQueries), m, nCent, dim).codes

  /** Persisted PQ index: the m·nCent codeword table (tiny, always
    * broadcast) plus the corpus code table at m·log₂(nCent) bits per
    * vector — what a PQ serving tier stores instead of fp32 vectors.
    * A new shard appends its codes (the codebook is frozen at build,
    * so codes never shift — the ANN/IVF index append contract).
    */
  final case class PqIndex(codebook: DataFrame, codes: DataFrame)

  def pqIndexFrames(corpus: DataFrame,
      m: Int = 8, nCent: Int = 16, dim: Int = 64): PqIndex = {
    require(m > 0 && dim % m == 0,
      s"dim ($dim) must be divisible by m ($m) — a remainder would " +
        "silently drop trailing dimensions from codes and reconstructions")
    val dp = dotWith(corpus.sparkSession) _
    val sub = dim / m
    val e = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val centSub = pqCodebook(e, m, nCent, sub)
    val corpusSub = subVectors(e, m, sub, "sv")
    PqIndex(centSub, pqEncodeAgainst(corpusSub, centSub, dp))
  }

  /** Argmin-encode subvector rows against a codeword table: one
    * broadcast join + a (vec_id, j)-partitioned window. The single
    * definition both the seed and the trained index build call — and
    * the refinement's assign step mirrors — so "nearest codeword"
    * can never mean different arithmetic in different places.
    */
  private def pqEncodeAgainst(corpusSub: DataFrame, cents: DataFrame,
      dp: (Column, Column) => Column): DataFrame = {
    val diff = zip_with(col("sv"), col("cv"), (x, c) => x - c)
    val w = Window.partitionBy("vec_id", "j").orderBy(col("d2"), col("cid"))
    corpusSub.join(broadcast(cents), Seq("j"))
      .withColumn("d2", dp(diff, diff))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "j", "cid")
  }

  /** [[pqIndexFrames]] with per-subspace LLOYD-TRAINED codebooks — the
    * production form (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011, trains each subspace's codebook
    * with k-means; the seed form is the oracle-minimal contract):
    * every subspace j independently tightens its nCent seed codewords
    * by `kmeansIters` sweeps of squared-L2 assignment — the SAME
    * sequential-fold metric encoding uses, so training and encoding
    * cannot disagree — followed by component-wise [[Exact.meanOf6]]
    * means. Refined codewords are therefore bit-reproducible and the
    * whole index gates against a sweep-unrolled SQL twin (the
    * s36/s44 precedent). Codewords that lose all members drop out
    * (encoding argmins over the survivors — standard k-means).
    *
    * Scale shape: identical to the seed build plus, per sweep, one
    * more broadcast-join assign pass and one m·nCent·sub-row partial
    * aggregate — the corpus never shuffles; only (j, cid, pos, mean)
    * partials do. The subvector frame is persisted across the
    * assign/encode passes (released by [[releaseCaches]]).
    */
  def pqIndexFramesTrained(corpus: DataFrame,
      m: Int = 8, nCent: Int = 16, dim: Int = 64,
      kmeansIters: Int = 1): PqIndex = {
    require(m > 0 && dim % m == 0,
      s"dim ($dim) must be divisible by m ($m) — a remainder would " +
        "silently drop trailing dimensions from codes and reconstructions")
    val dp = dotWith(corpus.sparkSession) _
    val sub = dim / m
    val e = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val corpusSub = ledger.persist(subVectors(e, m, sub, "sv"))
    var cents = pqCodebook(e, m, nCent, sub)
    for (_ <- 0 until kmeansIters) {
      val diff = zip_with(col("sv"), col("cv"), (x, c) => x - c)
      val w = Window.partitionBy("vec_id", "j").orderBy(col("d2"), col("cid"))
      val assigned = corpusSub.join(broadcast(cents), Seq("j"))
        .withColumn("d2", dp(diff, diff))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("j"), col("cid"), col("sv"))
      // m·nCent rows — localCheckpoint cuts per-sweep lineage exactly
      // as ivfIndexFrames does for its centroid table
      cents = assigned
        .select(col("j"), col("cid"), posexplode(col("sv")))
        .groupBy("j", "cid", "pos").agg(Exact.meanOf6(col("col")).as("m"))
        .groupBy("j", "cid").agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
        .select(col("cid"), col("j"),
          transform(array_sort(col("pm")), p => p.getField("m")).as("cv"))
        .localCheckpoint()
    }
    PqIndex(cents, pqEncodeAgainst(corpusSub, cents, dp))
  }

  def writePqIndex(
      index: PqIndex, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit = {
    writer.commitBucketed(index.codebook, s"${name}_codebook", 1, Seq("cid"),
      replace = writer.replaces)
    writer.commitBucketed(index.codes, s"${name}_codes", buckets, Seq("vec_id"),
      replace = writer.replaces)
  }

  def readPqIndex(spark: SparkSession, name: String): PqIndex =
    PqIndex(
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_codebook"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_codes"))

  /** PQ k-NN SERVING from a prepared (or persisted) code index — the
    * online half of [[pqTopK]]: reconstructions materialize from the
    * code table by one broadcast join against the codeword table,
    * then the shared broadcast-query top-k tail. The fp32 corpus is
    * nowhere in the plan — that's the point.
    */
  def pqServe(queries: DataFrame, index: PqIndex, k: Int = 5): DataFrame = {
    val dp = dotWith(queries.sparkSession) _
    val recon = reconstruct(index)
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    val q = queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(dp(col("qv"), col("qv"))))
    topKAgainst(q, recon, k, dp)
  }

  /** (vec_id, v): codebook reconstructions — codes joined back to
    * their codewords, re-assembled in subspace order.
    */
  private def reconstruct(index: PqIndex): DataFrame =
    index.codes.join(broadcast(index.codebook), Seq("j", "cid"))
      .groupBy("vec_id")
      .agg(collect_list(struct(col("j"), col("cv"))).as("parts"))
      .select(col("vec_id"),
        flatten(transform(array_sort(col("parts")), p => p.getField("cv"))).as("v"))

  /** (cid, j, cv): the first nCent corpus vectors by id, sliced into m
    * codewords of `sub` dims each — m·nCent rows, always broadcast.
    */
  private def pqCodebook(corpus: DataFrame, m: Int, nCent: Int, sub: Int): DataFrame =
    subVectors(
      corpus.orderBy("vec_id").limit(nCent).select(col("vec_id").as("cid"), col("v")),
      m, sub, "cv", idCol = "cid")

  private def subVectors(
      df: DataFrame, m: Int, sub: Int, out: String, idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol), explode(sequence(lit(0), lit(m - 1))).as("j"), col("v"))
      .select(col(idCol), col("j"), slice(col("v"), col("j") * sub + 1, lit(sub)).as(out))

  /** PQ-served cosine top-k — asymmetric distance computation over the
    * [[pqEncode]] code table: the query stays full precision and each
    * corpus vector is scored as its codebook reconstruction x̂ (the
    * codewords its codes select, concatenated). By linearity
    * dot(q, x̂) = Σⱼ dot(qⱼ, c_{j,codeⱼ}) — scoring the reconstruction
    * IS the per-subspace lookup-table sum a PQ serving tier computes,
    * expressed relationally; cosine denominators use ‖x̂‖ (known at
    * index-build time from the codes alone).
    *
    * Scale shape: reconstructions materialize from the code table by a
    * broadcast join against the m·nCent codeword table — the fp32
    * corpus is read ONCE at encode time and never again; the serving
    * scan carries m·log₂(nCent) bits per vector (here 8×4 = 4 B +
    * norm vs 256 B fp32, a 64× index-memory cut, the difference
    * between an in-memory and a spilling index at 10⁹ vectors). Then
    * the identical broadcast-query top-k as every serving path
    * ([[bruteTopK]]); composing with the IVF cell probe (s35/s41)
    * instead of the full scan is one filter on the probed cells.
    * Recall-for-memory is measured, not guessed: [[recallAtK]] (the
    * s48 harness) takes this as its `approx` side unchanged.
    */
  /** TWO-STAGE RETRIEVE-RERANK — the production ANN serving shape:
    * a cheap compressed index (PQ-ADC, [[pqTopK]]) retrieves `cand`
    * candidates per query, then ONLY those candidates are re-scored
    * against the full-precision vectors and the top `k` returned.
    * The rerank touches cand·|queries| raw vectors however big the
    * corpus — the compressed index absorbs the scan, full precision
    * pays only for finalists (the standard recall-vs-memory
    * resolution: PQ's quantization error decides WHO advances, exact
    * cosine decides the final ORDER). Output:
    * (query_id, rnk, vec_id, cos) with exact quantized cosines.
    */
  def retrieveRerank(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      cand: Int = 32, m: Int = 8, nCent: Int = 16, dim: Int = 64): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val candidates = pqTopK(embeddings, nQueries, cand, m, nCent, dim)
      .select(col("query_id"), col("vec_id"))
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(e, "vec_id")
      .withColumn("cos",
        Exact.quant6(dp(col("qv"), col("v")) / (col("qn") * col("nrm"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "vec_id", "cos")
  }

  def pqTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      m: Int = 8, nCent: Int = 16, dim: Int = 64): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val served = e.filter(col("vec_id") < nQueries)
      .unionByName(pqReconstructions(embeddings, nQueries, m, nCent, dim))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    bruteTopK(served, nQueries, k, dp)
  }

  /** [[pqTopK]] over the LLOYD-TRAINED index
    * ([[pqIndexFramesTrained]]) — same ADC serving tail, tighter
    * codewords: reconstructions sit closer to their vectors, so
    * recall@k rises at identical code size (measured by [[recallAtK]]
    * — the s51-vs-s54 comparison in SCALE.md).
    */
  def pqTopKTrained(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      m: Int = 8, nCent: Int = 16, dim: Int = 64,
      kmeansIters: Int = 1): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val served = e.filter(col("vec_id") < nQueries)
      .unionByName(reconstruct(pqIndexFramesTrained(
        embeddings.filter(col("vec_id") >= nQueries), m, nCent, dim, kmeansIters)))
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    bruteTopK(served, nQueries, k, dp)
  }

  /** (vec_id, v): each corpus vector's codebook reconstruction — the
    * codewords its [[pqEncode]] codes select, concatenated in subspace
    * order. Shared by [[pqTopK]] (full-scan ADC) and [[ivfPqTopK]]
    * (cell-probed ADC).
    */
  private def pqReconstructions(embeddings: DataFrame, nQueries: Int,
      m: Int, nCent: Int, dim: Int): DataFrame =
    reconstruct(pqIndexFrames(
      embeddings.filter(col("vec_id") >= nQueries), m, nCent, dim))

  /** IVF-PQ — the standard billion-scale serving layout (the inverted
    * file restricts WHICH vectors a query scores, the PQ codes decide
    * HOW each is scored): queries pick `nProbe` of `nCells` coarse
    * cells by full-precision centroid cosine, then ADC-score only
    * those cells' members via their [[pqEncode]] reconstructions.
    * Coarse cells are the deterministic seed form (kmeansIters = 0 —
    * the s42/s48 oracle contract; Lloyd refinement drops in exactly
    * as in [[ivfTopK]]).
    *
    * Scale shape: both index halves are one-time builds the serving
    * scan never recomputes — the cell assignment (broadcast-centroid
    * argmax) and the code table (m·log₂(nCent) bits/vector). A query
    * touches nProbe/nCells of the corpus and reads codes, not fp32
    * vectors: at 10⁹ vectors that's the difference between probing an
    * in-memory 4 GB index and scanning a 256 GB one. The full-probe
    * configuration (nProbe = nCells) degenerates to [[pqTopK]]
    * exactly — the differential the spec pins.
    */
  def ivfPqTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 8, nCent: Int = 16,
      dim: Int = 64): DataFrame = {
    val dp = dotWith(embeddings.sparkSession) _
    val corpus = embeddings.filter(col("vec_id") >= nQueries)
    val idx = ivfIndexFrames(corpus, nCells, kmeansIters = 0)
    val recon = pqReconstructions(embeddings, nQueries, m, nCent, dim)
      .withColumn("nrm", sqrt(dp(col("v"), col("v"))))
    val pqCells = idx.assigned.select("cid", "vec_id").join(recon, Seq("vec_id"))
    ivfServe(embeddings.filter(col("vec_id") < nQueries),
      IvfIndex(idx.centroids, pqCells), k, nProbe)
  }

  /** Vector-column ANALYZE — the data-QA profile an embedding table
    * gets before any index build (the [[graft.ops.Relational]]
    * tableProfile sibling for the column scalar ANALYZE skips):
    * per-dimension count, exact order-independent mean
    * ([[Exact.meanOf6]] — a raw avg() would not gate), min/max, and
    * dead-component count (exact zeros — embedding pipelines emit
    * them when a model head is truncated or a batch was zero-filled).
    * Long format (one row per dimension) so downstream checks join
    * components directly.
    *
    * Scale shape: one narrow posexplode, then a partial-aggregating
    * groupBy of dim·|corpus| component rows down to `dim` rows —
    * map-side combine collapses everything to dim rows per partition
    * before the (tiny) shuffle. No vectors cross the exchange.
    */
  def embeddingProfile(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        Exact.meanOf6(col("x")).as("m"),
        min("x").as("mn"), max("x").as("mx"),
        sum(when(col("x") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .orderBy("dim")

  /** Per-label centroid, dimension-wise — the batch-SQL twin of the
    * [[graft.functions.VectorAggregates]] centroid `Aggregator` (that
    * one folds floats in partition order, fine for pipelines but not
    * for a bit-exact gate): each component is [[Exact.meanOf6]], an
    * order-independent quantized-decimal mean, so the result is
    * engine-portable. One narrow explode + a partial-aggregating
    * shuffle of |labels|·dim component rows — never vectors.
    * Emitted long — (label, dim, m, n) rows — rather than
    * re-assembled arrays: downstream joins (nearest-centroid assign,
    * drift checks) consume components directly.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy("label", "dim")
      .agg(Exact.meanOf6(col("x")).as("m"), count(lit(1)).as("n"))
      .orderBy("label", "dim")

  /** k-NN label vote: classify each query vector by majority label of
    * its brute-force top-k neighbors (ties → smaller label).
    */
  def knnClassify(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val top = cosineTopK(embeddings, nQueries, k)
    val labels = embeddings.select(col("vec_id"), col("label"))
    val w = Window.partitionBy("query_id").orderBy(col("votes").desc, col("label"))
    top.join(labels, "vec_id")
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").cast("long").as("pred_label"), col("votes"))
      .orderBy("query_id")
  }

  /** Recall@k of an approximate ANN result against the exact
    * brute-force answer — the eval harness every ANN deployment needs
    * before trading recall for speed (tune nProbe/bands against a
    * ground-truth sample, then ship). Both inputs are top-k frames
    * with (query_id, vec_id) rows; output is one row per ground-truth
    * query: (query_id, hits, recall), recall = hits/k with the one
    * deferred IEEE division of the [[Exact]] contract. Queries the
    * approximate side missed entirely still appear (hits = 0) — a
    * silent-miss eval is how recall bugs hide. Scale: top-k frames
    * are |queries|·k rows regardless of corpus size, so this is a
    * broadcast-join of two tiny frames no matter how big the index
    * was.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int = 5): DataFrame = {
    val hits = exact.select("query_id", "vec_id")
      .join(approx.select("query_id", "vec_id"), Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        Exact.quant6(coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy("query_id")
  }
}
