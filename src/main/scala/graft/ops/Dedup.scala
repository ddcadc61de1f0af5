package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * n-gram Jaccard with prefix filtering, SimHash. Scale design notes:
  *
  *  - Exact dedup groups on a 128-bit md5 fingerprint, never on the
  *    full text — the shuffle carries 16 bytes + ids, not documents.
  *  - Jaccard pair-finding uses PPJoin-style prefix filtering: for
  *    threshold t a pair with jaccard ≥ t MUST share a token among the
  *    ⌊(1-t)·n⌋+1 globally-rarest tokens of each document, so only
  *    those tokens generate join candidates. Lossless, and candidate
  *    volume is driven by rare-token document frequency, not corpus².
  *  - MinHash/LSH buckets candidates by banded signatures: cost is
  *    O(corpus · K) for signatures plus near-duplicate bucket joins —
  *    the standard 100 TB algorithm. Exact Jaccard verifies candidates.
  *  - Hashing is md5-derived (engine-portable, oracle-checkable):
  *    fingerprints and band keys as md5 hex strings; minhash as ONE
  *    md5 per token widened to k variants by a seeded affine family
  *    (a·h + b mod 2^31-1) — pure integer math after the single hash.
  */
object Dedup {

  /** Frames persisted by dedup pipelines, so callers can return
    * executor storage to baseline after the terminal action without
    * nuking unrelated caches ([[graft.core.GraftCaches.release]] is
    * the session-wide hammer; this is the scoped screwdriver). A
    * long-lived 100 TB pipeline calls [[releaseCaches]] between
    * stages; Bench releases everything between queries.
    */
  private val ledger = graft.core.GraftCaches.newLedger()

  private def persistTracked(df: DataFrame): DataFrame = ledger.persist(df)

  /** Fail LOUDLY when an id-disjointness contract is violated. The
    * incremental/cross-corpus family (crossNearDups, mergeBm25Index,
    * incrementalImage/AudioNearDup) assumes the two sides slice one
    * id space: with an id on both sides, within-corpus near-dups
    * silently surface as cross-corpus pairs and token unions double
    * count — plausible wrong output, the worst kind. One bounded
    * semi-join job (short-circuits at the first overlap); call sites
    * pass the RAW id frames so the check never forces tokenize/decode
    * work.
    */
  private[graft] def requireDisjointIds(
      a: DataFrame, b: DataFrame, idCol: String, what: String): Unit = {
    val hit = a.select(col(idCol))
      .join(b.select(col(idCol)), Seq(idCol), "left_semi")
      .limit(1).collect()
    require(hit.isEmpty,
      s"$what: $idCol spaces must be disjoint across the two sides, " +
        s"but '${hit.headOption.map(_.get(0)).getOrElse("")}' appears in both")
  }

  /** Unpersist every frame the DEDUP pipelines persisted mid-plan —
    * scoped to this module's ledger, so a between-stages release here
    * can never free another pipeline's load-bearing frame. Call AFTER
    * the terminal action on the pipeline's result — the plans still
    * reference the frames and would silently recompute them if freed
    * mid-flight.
    */
  def releaseCaches(): Unit = ledger.release()

  /** Distinct token set per doc: (doc_id, toks array, n). */
  private def docTokens(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      array_distinct(TextOps.tokens(col("text"))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))

  /** Exact dedup on normalized-text fingerprint. Output: every doc with
    * its canonical (minimum) doc_id; `is_dup` marks non-canonical rows.
    */
  def exactDedup(documents: DataFrame): DataFrame = {
    val fp = documents.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    val canon = fp.groupBy("fp").agg(min("doc_id").as("canonical_id"))
    fp.join(canon, "fp")
      .select(
        col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Canonicalize documents by IDENTICAL token set: all the pairwise
    * set math (candidates, signatures, exact Jaccard) runs once per
    * distinct set, not once per document — on dup-heavy corpora
    * (exactly the corpora dedup exists for) that collapses the
    * quadratic candidate space before any join happens. Returns
    * (sets, members): sets keyed by a fingerprint of the sorted token
    * array, members mapping each doc to its set. Empty docs are
    * dropped — a doc with no tokens can never share one.
    */
  private def canonicalSets(toks: DataFrame): (DataFrame, DataFrame) = {
    // persisted (tracked - releaseCaches() frees it): every downstream
    // branch (dictionary probe, masks or prefix, verify, expansion)
    // re-references this frame, and the tokenize+sort+md5 subtree is
    // the most expensive narrow stage - recomputing it per branch
    // dominated the wall clock. Size is O(corpus tokens); spills to
    // disk.
    val keyed = persistTracked(toks
      .filter(col("n") > 0)
      .withColumn("sid", md5(concat_ws("", array_sort(col("toks"))))))
    // persisted (tracked) SEPARATELY from keyed: `first(array)` can't
    // hash-aggregate (immutable buffer type → SortAggregate), and the
    // set frame has 4-6 consumers per pipeline (signatures, band
    // keys, the stats probe, both verify sides) — uncached, EACH ran
    // its own exchange + sort + aggregation over the corpus-keyed
    // frame (plan-audited: 6 SortAggregate pairs in one t25 plan).
    // Caching the aggregation output makes it one.
    val sets = persistTracked(
      keyed.groupBy("sid").agg(first(col("toks")).as("toks"), first(col("n")).as("n")))
    val members = keyed.select(col("doc_id"), col("sid"))
    (sets, members)
  }

  /** Expand set-level verified pairs back to doc pairs: cross-set
    * pairs inherit the set pair's exact jaccard; co-members of one
    * set are exact duplicates (jaccard 1.0, identical in IEEE on both
    * engines). Output is the SAME frame a doc-level pass would emit.
    */
  private def expandSetPairs(setPairs: DataFrame, members: DataFrame): DataFrame = {
    val cross = setPairs
      .join(members.select(col("sid").as("sid_a"), col("doc_id").as("da")), "sid_a")
      .join(members.select(col("sid").as("sid_b"), col("doc_id").as("db")), "sid_b")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jac"))
    val same = members.as("x")
      .join(members.as("y"),
        col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), lit(1.0).as("jac"))
    cross.unionByName(same).orderBy("doc_a", "doc_b")
  }

  /** All pairs with token-set Jaccard ≥ `threshold`, via prefix
    * filtering over canonical sets. Returns (doc_a, doc_b, jac) with
    * doc_a < doc_b.
    *
    * The token document-frequency table is joined with a SHUFFLE join
    * (no broadcast hint): the vocabulary of a 100 TB corpus does not
    * fit on the driver, and this one-time per-token join is cheap to
    * shuffle. AQE may still choose broadcast at small SFs.
    */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.6): DataFrame =
    jaccardPairsFrom(docTokens(documents), threshold)

  /** n-gram Jaccard: the same prefix-filtered pipeline over word
    * n-gram SHINGLES instead of token sets — order-sensitive, so
    * reshuffled near-copies score low while true near-copies stay
    * high. Shingle universes are far larger than vocabularies, which
    * makes the prefix filter sharper (rare shingles ⇒ few candidates).
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 3, threshold: Double = 0.6): DataFrame =
    jaccardPairsFrom(
      documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
        .select(col("doc_id"), TextOps.shinglesFromTokens(col("tk"), n).as("toks"))
        .withColumn("n", size(col("toks")).cast("long")),
      threshold)

  /** Corpus-shape stats for strategy selection — the one eager probe
    * a representation-adaptive plan cannot avoid, over the (persisted)
    * canonical-set frame. Every downstream branch (mask sweep vs
    * prefix filter, mask verify vs exploded verify) reuses this
    * result instead of re-probing (round-2 fix: it used to be 2–3
    * full tokenize+distinct passes; round-4: the probe itself is now
    * approximate, with an exact confirmation only when the estimate
    * says the correctness-sensitive mask path is plausible).
    */
  private case class SetStats(vocab: Long, nSets: Long) {
    def smallVocab: Boolean = vocab <= 64
  }

  private def setStats(setsAsDocs: DataFrame): SetStats = {
    val w = setsAsDocs.select(col("doc_id"), explode(col("toks")).as("tok"))
    // the probe only picks a PLAN, so it runs on HLL estimates — a
    // single partial-aggregating pass whose shuffle carries sketches,
    // not the token universe (the exact two-column countDistinct was
    // an expand + full distinct shuffle at corpus scale). EXCEPT: the
    // ≤64-vocab mask path is a CORRECTNESS branch (65 tokens don't
    // fit a 64-bit mask), so an estimate near the boundary is
    // confirmed with an exact distinct — cheap precisely when it
    // runs, because partial aggregation leaves ~vocab rows per
    // partition. An estimate beyond 96 can't be a true ≤64 vocab
    // (HLL++ is effectively exact at such cardinalities), and the
    // error direction is safe: a missed mask path costs speed, never
    // correctness.
    val est = w.agg(
      approx_count_distinct(col("tok"), 0.02),
      approx_count_distinct(col("doc_id"), 0.02)).head()
    val (estVocab, nSets) = (est.getLong(0), est.getLong(1))
    val vocab =
      if (estVocab <= 96) w.select("tok").distinct().count()
      else estVocab
    SetStats(vocab, nSets)
  }

  private def jaccardPairsFrom(toksIn: DataFrame, threshold: Double): DataFrame = {
    val (setPairs, members) = setPairsFrom(toksIn, threshold)
    expandSetPairs(setPairs, members)
  }

  /** Jaccard ≥ threshold pairs at SET granularity, plus the doc→set
    * membership: the shared core of [[jaccardPairs]] (which expands
    * to doc pairs) and [[jaccardClusters]] (which clusters the set
    * graph directly and never materializes the doc-pair expansion).
    * Returns (setPairs(sid_a, sid_b, jac), members(doc_id, sid)).
    */
  private def setPairsFrom(toksIn: DataFrame, threshold: Double): (DataFrame, DataFrame) = {
    val (sets, members) = canonicalSets(toksIn)
    val setsAsDocs = sets.select(col("sid").as("doc_id"), col("toks"), col("n"))
    val w = setsAsDocs.select(col("doc_id"), explode(col("toks")).as("tok"))
    val stats = setStats(setsAsDocs)
    // a ≤64-token vocabulary over few-enough distinct sets means the
    // cheapest EXACT plan is a direct mask sweep over set pairs —
    // pure codegen'd bit math, no token join, no candidate distinct.
    val setPairs =
      if (stats.smallVocab && stats.nSets <= 16384) {
        val masks = setMasks(w, w.select("tok").distinct())
        val a = masks.select(col("doc_id").as("doc_a"), col("mask").as("ma"))
        val b = masks.select(col("doc_id").as("doc_b"), col("mask").as("mb"))
        scoreMaskPairs(a.join(b, col("doc_a") < col("doc_b")), threshold)
      } else {
        verifyJaccard(prefixCandidates(setsAsDocs, threshold), setsAsDocs,
          threshold, stats.smallVocab)
      }
    (setPairs.select(col("doc_a").as("sid_a"), col("doc_b").as("sid_b"), col("jac")),
      members)
  }

  /** PPJoin prefix-filtered candidate pairs (with duplicates) over a
    * (doc_id, toks, n) frame — the general path's candidate rule,
    * lossless for any fixed global token order; RARITY order minimizes
    * candidates. This ranking is also the skew defense: a stop-word-
    * grade token in every document has maximal df, so it ranks LAST
    * and never enters a prefix of any document with more than
    * ⌊(1-t)·n⌋+1 tokens — the one join key that could fan out to
    * |corpus|² candidate rows generates none at all (SkewSpec plants
    * exactly that corpus and bounds the candidate partitions).
    * Package-visible for that spec.
    */
  private[graft] def prefixCandidates(setsAsDocs: DataFrame, threshold: Double): DataFrame = {
    val w = setsAsDocs.select(col("doc_id"), explode(col("toks")).as("tok"))
    val df = w.groupBy("tok").agg(count(lit(1)).as("tok_df"))
    // Threshold in basis points, FLOORED: the integer length/positional
    // filters below must never be tighter than the real threshold (a
    // rounded-up T4 could drop a boundary pair the verify would keep;
    // a floored one only admits a few extra candidates — lossless).
    val t4 = math.floor(threshold * 10000).toLong
    val prefix = setsAsDocs
      .select(col("doc_id"), col("n"), explode(col("toks")).as("tok"))
      .join(df, "tok")
      .groupBy("doc_id", "n")
      .agg(array_sort(collect_list(struct(col("tok_df"), col("tok")))).as("ranked"))
      .select(
        col("doc_id"), col("n"),
        posexplode(slice(transform(col("ranked"), r => r.getField("tok")), lit(1),
          (floor(col("n") * (1 - threshold)) + 1).cast("int"))))
      .select(col("doc_id"), col("n"),
        (col("pos") + 1).cast("long").as("i"), col("col").as("tok"))
    // PPJoin's two residual filters ride the candidate join (Xiao et
    // al. 2008, both lossless given the verify is exact):
    //  - LENGTH: jac ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a| — a pair
    //    of very different sizes can never clear the threshold;
    //  - POSITIONAL: a qualifying pair's FIRST shared ranked token at
    //    (1-based) prefix positions i, j bounds the intersection by
    //    1 + min(na−i, nb−j), which must reach the required overlap
    //    α = ⌈t·(na+nb)/(1+t)⌉; matches that cannot are dead wedges.
    //    (x ≥ ⌈p/q⌉ ⟺ x·q ≥ p for positive integers — no float
    //    boundary risk.)
    // Both prune candidate OUTPUT volume — the frame every downstream
    // exchange (distinct, the two array-carrying verify joins) pays
    // for — at the cost of two small ints riding each prefix row.
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * t4 <= col("b.n") * 10000L &&
          col("b.n") * t4 <= col("a.n") * 10000L &&
          (least(col("a.n") - col("a.i"), col("b.n") - col("b.i")) + 1L) *
            (10000L + t4) >= (col("a.n") + col("b.n")) * t4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }

  /** (doc_id, 64-bit mask) per set, given a ≤64-token dictionary. */
  private def setMasks(w: DataFrame, dict: DataFrame): DataFrame = {
    val bits = dict.withColumn(
      "bit", row_number().over(Window.orderBy("tok")).cast("int") - 1)
    w.join(broadcast(bits), "tok")
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("mask"))
  }

  /** Exact jaccard from mask columns ma/mb; keeps pairs ≥ threshold. */
  private def scoreMaskPairs(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", bit_count(col("ma").bitwiseAND(col("mb"))).cast("long"))
      .withColumn("na", bit_count(col("ma")).cast("long"))
      .withColumn("nb", bit_count(col("mb")).cast("long"))
      .withColumn("jac",
        Exact.quant4(col("inter").cast("double") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")

  /** Exact Jaccard over candidate pairs; keeps pairs ≥ threshold.
    * Representation-adaptive, like parquet's dictionary encoding:
    *
    *  - realized vocabulary ≤ 64 tokens → each token set is a 64-bit
    *    BITMASK; intersection is `bit_count(a & b)`, pure per-row bit
    *    math with no fan-out at all. (Tiny-vocabulary corpora are a
    *    real case — category/tag columns, template-generated text —
    *    and on them the mask path turns a billion-row token join into
    *    a few million single-row ops.)
    *  - otherwise → per-pair SORTED-MERGE intersection: each side's
    *    token array is sorted once per DOCUMENT (narrow, amortized
    *    over that doc's candidate multiplicity), candidate pairs
    *    fetch both arrays by two equi-joins, and the native
    *    [[graft.plans.SortedIntersect]] expression counts |a ∩ b| by
    *    a two-pointer scan in whole-stage codegen. This replaced the
    *    round-1→6 exploded-token equi-join, which fanned every pair
    *    out to (pair, token) rows and paid a shuffle + aggregation
    *    exchange proportional to Σ_pairs |toks| — the candidate
    *    arrays cross the wire once here, as array payloads, and the
    *    group-count stage is gone. (Round 1 tried array transport
    *    with per-pair re-HASHING and lost; the merge scan does no
    *    hashing and no per-row allocation, which is what makes the
    *    per-pair shape the winner.)
    *
    * The branch choice (`smallVocab`) is passed down from the one
    * per-pipeline [[setStats]] probe — this method runs no eager jobs.
    *
    * Accepts candidates WITH possible duplicates (a pair matching in
    * several LSH bands / prefix tokens); dedup placement is
    * branch-specific: the mask path verifies per-row (duplicates are
    * harmless) and dedups AFTER the threshold filter, when the set is
    * smallest; the merge path MUST dedup first — a duplicated
    * candidate row would verify twice and emit a duplicate output
    * row.
    */
  private def verifyJaccard(
      candDup: DataFrame, toks: DataFrame, threshold: Double,
      smallVocab: Boolean, alreadyDistinct: Boolean = false): DataFrame = {
    if (smallVocab) {
      val w = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      val masks = setMasks(w, w.select("tok").distinct())
      scoreMaskPairs(
        candDup
          .join(masks.select(col("doc_id").as("doc_a"), col("mask").as("ma")), "doc_a")
          .join(masks.select(col("doc_id").as("doc_b"), col("mask").as("mb")), "doc_b"),
        threshold)
        .distinct()
    } else {
      // sorted ONCE per document — the per-pair merge scan's contract
      val sorted = toks.select(
        col("doc_id"), array_sort(col("toks")).as("ts"), col("n"))
      // a caller that already distinct'd (e.g. before persisting the
      // candidate cache) must not pay a second exchange+aggregate
      (if (alreadyDistinct) candDup else candDup.distinct())
        .join(sorted.select(col("doc_id").as("doc_a"), col("ts").as("ta"),
          col("n").as("na")), "doc_a")
        .join(sorted.select(col("doc_id").as("doc_b"), col("ts").as("tb"),
          col("n").as("nb")), "doc_b")
        .withColumn("inter", call_function("graft_sorted_inter", col("ta"), col("tb")))
        .withColumn("jac",
          Exact.quant4(col("inter").cast("double") / (col("na") + col("nb") - col("inter"))))
        .filter(col("jac") >= threshold)
        .select("doc_a", "doc_b", "jac")
    }
  }

  /** Prime modulus for the affine minhash family: 2^31 - 1. Base
    * hashes and coefficients live in [0, p), so a·h + b < 2^62 — no
    * 64-bit overflow in either engine (DuckDB errors on BIGINT
    * overflow rather than wrapping, so this bound is load-bearing
    * for the oracle twin, not just politeness).
    */
  val MinhashP: Long = 2147483647L

  /** Seeded affine coefficients (a_i, b_i), a_i ∈ [1, p), b_i ∈ [0, p).
    * Driver-side constants baked into both the Spark plan and the
    * DuckDB twin — public so SparkEntry can serialize them into SQL.
    */
  def minhashCoeffs(k: Int, seed: Long = 7L): Array[(Long, Long)] =
    graft.plans.MinHashSig.coefficients(k, seed)


  /** Signature columns h0..h{k-1} from a (doc_id, toks) frame, via
    * the native [[graft.plans.MinHashSig]] expression: one md5 per
    * token and k fused affine min-updates in a single codegen'd pass
    * over the token array. This is a narrow PROJECTION — the
    * round-6-and-earlier shape (explode → k separate `min`
    * aggregates) expanded every document into |tokens| rows and
    * shuffled the exploded frame just to fold it back; values are
    * bit-identical (the expression's compatibility contract), the
    * explode and the aggregation shuffle are simply gone.
    *
    * The array lands under one alias and elements are extracted in a
    * SECOND projection: CollapseProject never inlines a non-trivial
    * expression into k consuming references, so the signature is
    * computed once per row.
    */
  private def sigsFrom(toks: DataFrame, k: Int): DataFrame = {
    val sig = call_function("graft_minhash_sig", col("toks"), lit(k), lit(7L))
    toks.filter(size(col("toks")) > 0)
      .select(col("doc_id"), sig.as("_sig"))
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("_sig"), i + 1).as(s"h$i")): _*)
  }

  /** MinHash signature columns h0..h{k-1} per document. */
  def minhashSignatures(documents: DataFrame, k: Int = 16): DataFrame =
    sigsFrom(docTokens(documents), k)

  /** MinHash + banded LSH near-dup pairs, verified by exact Jaccard.
    * k signatures in `bands` bands of r = k/bands rows: docs sharing
    * any band key become candidates. Probability of a pair with
    * jaccard j becoming a candidate: 1-(1-j^r)^bands.
    *
    * r = 4 (k=16, bands=4) keeps candidate precision sane: a j=0.3
    * pair is a candidate with p≈0.032 (vs 0.31 at the round-1 r=2),
    * so the candidate set tracks genuinely similar pairs instead of
    * exploding quadratically on a dup-heavy corpus.
    */
  def minhashLshPairs(
      documents: DataFrame, threshold: Double = 0.5,
      k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val (sets, members) = canonicalSets(docTokens(documents))
    val setsAsDocs = sets.select(col("sid").as("doc_id"), col("toks"), col("n"))
    val stats = setStats(setsAsDocs)
    // signatures once per distinct token set — identical sets have
    // identical minhashes by definition
    val sigs = sigsFrom(setsAsDocs, k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (b * rows until (b + 1) * rows).map(i => col(s"h$i").cast("string")): _*)).as("bkey"))
    }
    val banded = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val setPairs = verifyJaccard(cand, setsAsDocs, threshold, stats.smallVocab)
      .select(col("doc_a").as("sid_a"), col("doc_b").as("sid_b"), col("jac"))
    expandSetPairs(setPairs, members)
  }

  /** FUZZY cross-corpus decontamination: near-dup pairs BETWEEN two
    * corpora only — each train doc paired with each holdout/eval doc
    * whose token-set Jaccard clears `threshold`. The fuzzy sibling of
    * [[containmentReportWhere]] (which catches verbatim phrase
    * containment): an eval item paraphrased into the crawl shares few
    * exact shingles but a high token-set Jaccard, and it is THIS
    * check that catches it before the eval ships.
    *
    * Same seeded affine minhash family and band rule as
    * [[minhashLshPairs]], but the candidate join is STRICTLY
    * train-side × eval-side — within-corpus pairs are unrepresentable
    * (the incremental-index old×old discipline), so a dup-heavy train
    * corpus costs nothing here and the candidate volume is bounded by
    * the eval set's band-bucket occupancy. Verify is the per-pair
    * sorted-merge intersection. Contract: doc_ids must be disjoint
    * across the two frames (they are slices of one id space in every
    * intended use).
    *
    * Output: (train_id, eval_id, jac), eval-contaminating pairs only.
    */
  def crossNearDups(
      train: DataFrame, holdout: DataFrame,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      checkIds: Boolean = true): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    def banded(toks: DataFrame): DataFrame = {
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws(",",
            (b * rows until (b + 1) * rows).map(i => col(s"h$i").cast("string")): _*)).as("bkey"))
      }
      sigsFrom(toks, k)
        .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    }
    // skippable for hot loop contexts where disjointness is structural
    // (e.g. monotone shard id ranges) — the check is one eager semi-join
    // job per call against unpersisted inputs
    if (checkIds) requireDisjointIds(train, holdout, "doc_id", "crossNearDups")
    // persisted (tracked): each side's tokenize+distinct subtree has
    // three consumers (its banded signatures, its verify arrays, its
    // n counts) — uncached, the corpus re-tokenizes per consumer
    // (plan-audited round-10)
    val tToks = persistTracked(docTokens(train))
    val hToks = persistTracked(docTokens(holdout))
    val cand = banded(tToks).as("a")
      .join(banded(hToks).as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    verifyJaccard(cand, tToks.unionByName(hToks), threshold, smallVocab = false)
      .select(col("doc_a").as("train_id"), col("doc_b").as("eval_id"), col("jac"))
      .orderBy("train_id", "eval_id")
  }

  /** MOSS-style WINNOWING-OVERLAP pairs — the dedup family member
    * tuned for PARTIAL overlap: two documents sharing any token run
    * of ≥ w+k−1 tokens are GUARANTEED to share a selected winnowing
    * fingerprint ([[TextOps.winnowFingerprints]]'s invariant), so
    * plagiarism-style containment that token-set Jaccard dilutes
    * (a paragraph lifted into a much longer page) still pairs. The
    * candidate unit is the selected fingerprint (~2/(w+1) of the
    * shingle count), not the shingle — the same guarantee at a
    * fraction of the join fan-out.
    *
    * Skew defense: fingerprints present in more than `maxDf`
    * documents are boilerplate, excluded before the pair join (the
    * t50 stop-shingle rule) — candidate volume is then driven by
    * rare-fingerprint df, never corpus². Output: (doc_a, doc_b,
    * shared, overlap = shared/min(|fp_a|,|fp_b|), quantized).
    */
  def winnowPairs(documents: DataFrame, k: Int = 3, w: Int = 4,
      minShared: Int = 2, maxDf: Int = 150): DataFrame = {
    val sets = persistTracked(TextOps.winnowSets(documents, k, w)
      .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
        explode(col("fp")).as("f")))
    val keep = sets.groupBy("f").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val pruned = sets.join(keep.select("f"), "f")
    pruned.as("a").join(pruned.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_fp").as("na"), col("b.n_fp").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        Exact.quant4(
          col("shared").cast("double") / least(col("na"), col("nb"))).as("overlap"))
      .orderBy("doc_a", "doc_b")
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components by
    * iterative min-label propagation — the step that turns pairwise
    * similarity into an actual dedup decision (keep one canonical doc
    * per component). Each iteration is one fully-distributed
    * join+aggregate sweep; the driver loop only checks convergence
    * (Pregel-style — iteration count is bounded by component
    * diameter, and near-dup graphs are dense near-cliques that
    * converge in 2–3 sweeps). `localCheckpoint` cuts lineage per
    * iteration so the plan doesn't grow with the loop.
    *
    * Output: (doc_id, cluster_id = min doc_id in component,
    * is_canonical) for every doc that appears in some pair.
    */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    propagateMin(pairs, "doc_a", "doc_b", maxIter,
      edges => edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")

  /** Duplicate clusters straight from documents, with the label
    * propagation running on the SET graph — one node per DISTINCT
    * token set — instead of the expanded doc-pair graph. Output is
    * IDENTICAL to `dedupClusters(jaccardPairs(documents))` (the gate
    * proves it against the same doc-level recursive-closure oracle):
    * co-members of a set share a node, cross-set pairs connect nodes,
    * and the component representative is each component's minimum
    * member doc — so the converged set label IS the component's
    * minimum doc id. On a dup-heavy corpus (exactly where clustering
    * matters) this shrinks the iterated joins by the
    * dup-multiplicity² factor and never materializes the doc-pair
    * expansion — the largest frame of the pairs pipeline — at all.
    * Multi-member sets with no cross-set edge (pure exact-dup groups)
    * bypass propagation entirely and label directly.
    *
    * The propagation core is min-label sweeps, NOT the big-star
    * contraction — MEASURED, round 14: swapping in
    * [[graft.ops.GraphOps.connectedComponentsBigStar]] (the round-13
    * advice) ran t49 at 25.2 s min / 304 MB shuffle vs 15.9 s min /
    * 126 MB for propagation on the identical sf0.1 corpus in the same
    * quiet window. The set graph here is TINY and near-clique-shaped
    * (propagation converges in 2–3 cheap sweeps) while big-star pays
    * two star joins + two canonicalize-distincts + a count-and-except
    * fixed-point probe per round regardless of graph size. Big-star
    * stays the right core for huge-diameter graphs (t146 gates it);
    * diameter-bounded propagation is the right core for dedup
    * clusters.
    */
  def jaccardClusters(
      documents: DataFrame, threshold: Double = 0.6, maxIter: Int = 20): DataFrame = {
    val (setPairs, members) = setPairsFrom(docTokens(documents), threshold)
    val minDoc = members.groupBy("sid")
      .agg(min("doc_id").as("mdoc"), count(lit(1)).as("nm"))
    val propagated = propagateMin(setPairs, "sid_a", "sid_b", maxIter,
      edges => edges.select(col("src").as("id")).distinct()
        .join(minDoc.select(col("sid").as("id"), col("mdoc").as("label")), "id"))
      .select(col("id").as("sid"), col("label"))
    val isolated = minDoc.filter(col("nm") >= 2)
      .join(propagated, Seq("sid"), "left_anti")
      .select(col("sid"), col("mdoc").as("label"))
    members.join(propagated.unionByName(isolated), "sid")
      .select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  private[ops] def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(true) // eager: materialized on return
    // A job runs inside the eager call, so a caller's lazy Dataset
    // cache can materialize during it and land in the persist-registry
    // delta — keep only RDDs that ARE checkpoints (plain caches report
    // isCheckpointed = false) so those caches are never freed out from
    // under their owners. (A lazy variant existed for the r17
    // multi-hop experiment; it lost and was removed with it.)
    val added = (sc.getPersistentRDDs.keySet.toSet -- before)
      .filter(id => sc.getPersistentRDDs.get(id).exists(_.isCheckpointed))
    (out, added)
  }

  private[ops] def freeRdds(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Iterative min-label propagation over an undirected pair frame:
    * the connected-components core shared by [[dedupClusters]] (doc
    * graph) and [[jaccardClusters]] (set graph). `seedFrom` builds
    * the initial (id, label) frame FROM the checkpointed edges so the
    * expensive pair subtree is evaluated exactly once.
    *
    * localCheckpoint persistence is RDD-level — invisible to the
    * CacheManager — so intermediate iteration frames are freed HERE,
    * eagerly, as soon as the next (eagerly materialized) checkpoint
    * supersedes them: storage held at any moment is one labels frame
    * + the edge list, not O(iterations) frames. Tracking is by
    * persistent-RDD-id delta around each checkpoint call (the
    * checkpoint API returns no handle to its RDD). The final labels
    * checkpoint stays alive — the caller's action reads it;
    * GraftCaches.release (or Bench, between queries) reclaims it.
    */
  private[ops] def propagateMin(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int,
      seedFrom: DataFrame => DataFrame): DataFrame = {
    // Materialize the pair frame ONCE before anything references it:
    // `edges` reads it twice (both edge directions), and the
    // pair-finding subtree above it (tokenize → candidates → verify)
    // is far too expensive to evaluate per reference.
    val (p, pIds) = checkpointTracked(pairs.select(col(aCol), col(bCol)))
    // NOTE (measured, round-6): pre-repartitioning the edge list by
    // src before a CHECKPOINT does NOT save the per-sweep edge
    // exchange — an RDD checkpoint erases outputPartitioning, so the
    // sweep joins re-exchanged the edge side anyway and the attempt
    // just added its own shuffle (+213 MB on the t49 gate corpus).
    // The fix (round-7, measured): a DataFrame-level CACHE instead.
    // InMemoryTableScanExec DOES report its cached plan's
    // partitioning, so hash(src) is established once here and every
    // sweep join's edge side — the largest frame in the loop — is
    // exchange-free; only the node-sized label frames move per sweep.
    // dropDuplicates AFTER repartition(src) adds no second shuffle:
    // same-(src,dst) rows are co-located under hash(src) —
    // HashPartitioning(src) satisfies ClusteredDistribution(src,dst)
    // — so the distinct aggregates in place and the cached
    // partitioning stays hash(src). Edges don't need a lineage cut
    // (they are built once, outside the loop), so losing the
    // checkpoint costs nothing.
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count() // eager: materialized before the pair frame is freed
    freeRdds(p, pIds) // edges is materialized; the raw pair frame is done
    var (labels, labelIds) = checkpointTracked(seedFrom(edges))
    var converged = false
    var i = 0
    // NOTE (r17, measured): multi-hop sweeps — chaining 2–3
    // propagation hops into one plan per lineage cut to amortize the
    // ~0.25 s/sweep driver barrier that dominates long-diameter runs
    // (t145 needs 58 sweeps of sub-100 ms stages) — were implemented
    // two ways (lazy-checkpoint intermediates; cached intermediates
    // with an eager chain-end checkpoint, entered only after 4
    // unconverged sweeps) and BOTH lost: chained plans forfeit AQE's
    // per-sweep runtime-stats broadcast decisions, so the hop joins
    // fall back to full exchanges (t49 shuffle 126 → 142 MB, min
    // 14.3 → 19.3 s; t145 min 10.9 → 13.7/31.9 s). One sweep per
    // barrier with eager checkpoints stands; the engine's answer for
    // diameter-bound graphs remains the big-star contraction
    // (connectedComponentsBigStar, gated t146 — 6.9 s on the same
    // graph t145 walks in 16.8 s).
    while (!converged && i < maxIter) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr"))
      // convergence detection rides along the propagation join — a
      // `changed` flag lands in the SAME checkpointed frame the next
      // iteration reads, so the check costs one cached scan instead
      // of a second full join per sweep.
      val (next, nextIds) = checkpointTracked(
        labels.join(prop, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
            (coalesce(col("nbr"), col("label")) < col("label")).as("changed")))
      converged = next.filter(col("changed")).isEmpty
      freeRdds(next, labelIds) // next is materialized; previous sweep done
      labels = next.drop("changed")
      labelIds = nextIds
      i += 1
    }
    // the final labels checkpoint is materialized — nothing reads
    // edges again; release the cached partitioned edge list now
    edges.unpersist(blocking = false)
    // fail LOUDLY on a hit iteration cap: labels that haven't
    // converged are silently-wrong component maps — the worst output.
    // (Iteration count is bounded by component diameter; near-clique
    // similarity graphs converge in 2–3 sweeps, long-path graphs
    // belong on the big-star contraction.)
    require(converged,
      s"min-label propagation did not converge within $maxIter sweeps — " +
        "component diameter exceeds the iteration bound; raise maxIter or use " +
        "GraphOps.connectedComponentsBigStar")
    labels
  }

  /** Exact-dedup fingerprint index: (fp, canonical_id) per DISTINCT
    * fingerprint in the ingested corpus — the aggregated form, so the
    * index is |distinct texts|, not |corpus|. Persist bucketed by fp
    * (`LakeWriter.commitBucketed` — the manifested protocol; legacy
    * plain-bucketed tables still read but no longer mix with
    * manifested writers) and the daily probe joins history
    * without shuffling it. The index must stay UNIQUE per fp — when
    * appending a shard, anti-join its frame against the existing
    * index first (an already-indexed fp keeps its older, smaller
    * canonical; a duplicate row would fan out the probe join).
    */
  def exactDedupIndex(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min("doc_id").as("canonical_id"))

  /** [[exactDedup]] for a NEW shard against an indexed history:
    * output is exactly `exactDedup(old ∪ new)` RESTRICTED to the new
    * shard's rows — canonical = min doc_id over history and shard —
    * without ever rescanning history documents. The global minimum
    * decomposes: least(indexed canonical, shard-local minimum), with
    * either side absent handled by coalesce. Contract: new doc_ids
    * are disjoint from indexed doc_ids.
    */
  def incrementalExactDedup(newDocs: DataFrame, index: DataFrame): DataFrame = {
    val fp = newDocs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    val localMin = fp.groupBy("fp").agg(min("doc_id").as("new_min"))
    val canon = localMin
      .join(index.select(col("fp"), col("canonical_id").as("old_min")), Seq("fp"), "left")
      .select(col("fp"),
        least(coalesce(col("old_min"), col("new_min")),
          col("new_min")).as("canonical_id"))
    fp.join(canon, "fp")
      .select(
        col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Persisted MinHash index over an already-ingested corpus — the
    * substrate of INCREMENTAL dedup. Two frames:
    *
    *  - `bands`: (doc_id, bkey) — one row per document per LSH band,
    *    where bkey = md5(band,"h_{br}..h_{br+r-1}") folds the band
    *    index into the key so a single-column equi-join is the whole
    *    candidate rule. Persist bucketed BY bkey: the daily new-shard
    *    probe then scans the history's buckets in place, exchange-free.
    *  - `toks`: (doc_id, toks, n) — distinct token sets, the exact-
    *    Jaccard verification input. Persist bucketed BY doc_id so the
    *    per-candidate semi-join never shuffles the history either.
    *
    * The index is append-only: shard N+1's own frames (the same
    * [[minhashIndexFrames]] output) are what gets appended after its
    * pairs are taken, so tomorrow's run sees today's shard as history.
    */
  final case class MinhashIndex(bands: DataFrame, toks: DataFrame)

  /** Index frames for one corpus shard: per-document banded signature
    * keys plus the token sets verification needs. Per-DOCUMENT, not
    * per-canonical-set: an index must stay valid as shards append, and
    * doc-keyed rows append trivially while set membership would need
    * rewriting. Empty docs are dropped (they can never pair).
    */
  def minhashIndexFrames(documents: DataFrame, k: Int = 16, bands: Int = 4): MinhashIndex = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    // persisted (tracked): bands and toks BOTH read this frame — and
    // in the in-query shape (gate t63; index build before a write)
    // the verify union does too. Unpersisted, the tokenize+md5
    // subtree ran once per consumer (plan-audited: 4 scans of the
    // corpus in one incremental query).
    val toks = persistTracked(docTokens(documents).filter(col("n") > 0))
    val sigs = sigsFrom(toks, k)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws(",",
        lit(b.toString) +: (b * rows until (b + 1) * rows).map(i => col(s"h$i").cast("string")): _*))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
    MinhashIndex(banded, toks.select("doc_id", "toks", "n"))
  }

  /** Persist an index as bucketed tables `<name>_bands` / `<name>_toks`
    * (bucketed by bkey / doc_id respectively — see [[MinhashIndex]]).
    * Use a LakeWriter with mode "append" to grow an existing index by
    * one shard.
    */
  def writeMinhashIndex(
      index: MinhashIndex, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit = {
    writer.commitBucketed(index.bands, s"${name}_bands", buckets, Seq("bkey"),
      replace = writer.replaces)
    writer.commitBucketed(index.toks, s"${name}_toks", buckets, Seq("doc_id"),
      replace = writer.replaces)
  }

  def readMinhashIndex(spark: SparkSession, name: String): MinhashIndex =
    MinhashIndex(
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_bands"),
      graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_toks"))

  /** Near-dup pairs involving a NEW shard against an indexed history —
    * the workflow a production pipeline actually runs daily: shard N+1
    * arrives, and re-canonicalizing the preceding 100 TB to find its
    * duplicates is not an option. Output is exactly
    * `minhashLshPairs(old ∪ new)` RESTRICTED to pairs with ≥1 new
    * side (same band-key candidate rule, same exact-Jaccard verify),
    * but old×old work is UNREPRESENTABLE by construction:
    *
    *  - candidates = newBands ⋈ indexBands (the probe side is the
    *    small shard; a bucketed index joins without shuffling history)
    *    ∪ newBands ⋈ newBands (the shard's internal dups);
    *  - verification reads history token sets ONLY for docs that are
    *    actually candidates (semi-join, bucket-local on a persisted
    *    index) plus the new shard's own.
    *
    * Contract: new doc_ids are disjoint from indexed doc_ids (a doc
    * re-ingested under its old id pairs with nothing, not itself).
    * The verify branch is pinned to the exploded-token path — no
    * corpus-shape probe: an index worth building has a large realized
    * vocabulary, and an eager probe per daily shard would cost more
    * than the branch it picks.
    *
    * Candidate generation lives in [[incrementalCandidates]].
    */
  def incrementalMinhashPairs(
      newDocs: DataFrame, index: MinhashIndex,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4): DataFrame = {
    val newIdx = minhashIndexFrames(newDocs, k, bands)
    // persisted (tracked): the shard's band frame joins twice (vs
    // index, vs itself) and the candidate frame feeds both the
    // history-toks semi-join and the verify join — recomputing either
    // per consumer would multiply the probe cost
    val newBands = persistTracked(newIdx.bands)
    // distinct BEFORE persist: a pair colliding in all 4 bands would
    // otherwise cache 4 rows and fan out every downstream consumer
    val cand = persistTracked(incrementalCandidates(newBands, index.bands).distinct())
    val candIds = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    // anti-join the history side against the shard's own doc_ids: a
    // REPLAYED batch (crash-recovery re-ingest under the same ids —
    // nearDupStream's documented recovery path) is already in the
    // index, and without this a replayed doc rides verifyToks twice
    // (once from history, once from the shard), fanning the verify
    // join out to duplicate rows per pair. The shard's copy wins.
    val oldNeeded = index.toks.join(candIds, Seq("doc_id"), "left_semi")
      .join(newIdx.toks.select("doc_id"), Seq("doc_id"), "left_anti")
    // verifyJaccard reads its toks frame twice (once per pair side)
    val verifyToks = persistTracked(oldNeeded.unionByName(newIdx.toks))
    verifyJaccard(cand, verifyToks, threshold, smallVocab = false, alreadyDistinct = true)
      .orderBy("doc_a", "doc_b")
  }

  /** Candidate pairs for the incremental probe: new×indexed plus
    * new×new. The indexed side appears in exactly ONE join, as the
    * build side of the new-shard probe — old×old candidacy has no
    * plan node that could produce it. Package-visible so the spec can
    * plan-assert the probe in isolation (bucketed index ⇒ zero
    * exchange on the indexed side).
    */
  private[graft] def incrementalCandidates(
      newBands: DataFrame, indexBands: DataFrame): DataFrame = {
    val candOld = newBands.as("a")
      .join(indexBands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val candNew = newBands.as("a")
      .join(newBands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    candOld.unionByName(candNew)
  }

  /** EXACT n-gram decontamination — the GPT-3 rule (Brown et al.
    * 2020, public): a train document is contaminated iff it shares
    * ANY run of `n` consecutive tokens with a heldout document
    * (`isTest`, default the doc_id ≡ 0 mod 20 fixture slice). The
    * third decontamination mode beside fuzzy containment
    * ([[containmentReport]]) and banded cross-corpus near-dup
    * ([[crossNearDups]]): exact hits catch verbatim leakage that
    * similarity thresholds can miss on long documents, and the rule
    * is cheap enough to run at full corpus scale.
    *
    * Scale shape: heldout n-grams are DISTINCT (the eval set is
    * always tiny next to train) and BROADCAST into a semi join —
    * train n-grams stream through map-side with no shuffle of the
    * corpus; at 100 TB the grams would be 64-bit hashes riding the
    * same plan. Output: every train doc as (doc_id, n_hit_grams,
    * contaminated) — instance counts, so a doc quoting one eval
    * sentence twice scores 2.
    */
  def ngramDecontaminate(documents: DataFrame, n: Int = 13,
      mod: Long = 20): DataFrame = {
    val base = documents.select(col("doc_id"),
      TextOps.tokens(col("text")).as("tk"))
    def grams(df: DataFrame): DataFrame = df
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), explode(TextOps.kgrams(col("tk"), n)).as("ng"))
    val evalG = grams(base.filter(col("doc_id") % mod === 0))
      .select("ng").distinct()
    val hits = grams(base.filter(col("doc_id") % mod =!= 0))
      .join(broadcast(evalG), Seq("ng"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    base.filter(col("doc_id") % mod =!= 0).select("doc_id")
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0L).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Decontamination: for each TEST document (doc_id ≡ 0 mod `mod` —
    * a deterministic holdout slice), the TRAIN document with the
    * highest n-gram containment |shingles(test) ∩ shingles(train)| /
    * |shingles(test)| — the standard "is my eval set inside the
    * training corpus" check of LLM data pipelines (containment, not
    * Jaccard: a short eval doc fully embedded in a long train doc
    * must score 1.0, which symmetric similarity hides).
    *
    * Plan: inverted-index equi-join on shingles with a STOP-SHINGLE
    * cap — shingles appearing in more than `dfCap` documents carry no
    * contamination signal and would dominate candidate volume, so
    * they are dropped globally (and the containment denominator
    * counts only kept shingles; the oracle twin mirrors both rules).
    * Candidate volume is Σ df² over kept shingles — bounded by
    * dfCap·|corpus shingles| instead of |test|·|train|.
    */
  def containmentReport(
      documents: DataFrame, n: Int = 3,
      mod: Long = 20, dfCap: Long = 150): DataFrame =
    containmentReportWhere(documents, col("doc_id") % mod === 0, n, dfCap)

  /** [[containmentReport]] with an arbitrary holdout predicate — the
    * mod-slice default is fixture-bound; a real decontamination run
    * marks its eval set by source, id list, or date (`isTest` is any
    * Column over the document row).
    */
  def containmentReportWhere(
      documents: DataFrame, isTest: Column,
      n: Int = 3, dfCap: Long = 150): DataFrame = {
    val sh = documents
      .select(col("doc_id"), isTest.as("_is_test"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("_is_test"),
        explode(TextOps.shinglesFromTokens(col("tk"), n)).as("s"))
    // shingles are distinct per doc, so count(*) per shingle == doc freq
    val keep = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("s")
    val kept = sh.join(keep, "s")
    val test = kept.filter(col("_is_test"))
    val train = kept.filter(!col("_is_test"))
    val testN = test.groupBy("doc_id").agg(count(lit(1)).as("tn"))
    val inter = test.select(col("doc_id").as("test_id"), col("s"))
      .join(train.select(col("doc_id").as("train_id"), col("s")), "s")
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(testN.select(col("doc_id").as("test_id"), col("tn")), "test_id")
      .withColumn("containment",
        Exact.quant4(col("inter").cast("double") / col("tn")))
    val w = Window.partitionBy("test_id").orderBy(col("containment").desc, col("train_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("test_id").as("doc_id"), col("train_id"), col("containment"))
      .orderBy("doc_id")
  }

  /** 60-bit SimHash per document from md5-derived token hashes: bit j
    * of the signature is the sign of Σ_tokens (2·bit_j(h(token)) - 1).
    * Near-dup pairs found by 4-chunk pigeonhole LSH (hamming ≤ 3 ⇒ at
    * least one 15-bit chunk identical), verified by exact hamming.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = docTokens(documents)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      // 60 bits of md5 as a long (15 hex chars)
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("j"))
      .withColumn("bit", expr("shiftright(h, j) & CAST(1 AS BIGINT)"))
      .groupBy("doc_id", "j")
      .agg(sum(col("bit") * 2 - 1).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L)).as("simhash"))
  }

  /** Exact duplicated-SUBSTRING detection (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * workflow, re-expressed as relational passes instead of a suffix
    * array): every token `k`-gram occurring more than once in the
    * corpus marks its positions as duplicated text; adjacent marked
    * positions per document merge into MAXIMAL spans (gaps-and-
    * islands). Output: one row per span — (doc_id, span_start
    * [1-based token position], n_grams, span_tokens = covered token
    * count of the gram run).
    *
    * Scale shape: one narrow tokenize+shingle pass, ONE shuffle on a
    * 16-byte gram fingerprint for the occurrence count (partial agg
    * pushes the count map-side), a fingerprint-keyed join back (AQE
    * may broadcast the dup-gram side — on real corpora the >1-
    * occurrence gram dictionary is far smaller than the corpus), and
    * a per-document window for the island merge. The corpus-sized
    * suffix array the reference workflow builds on one machine is
    * exactly what does NOT scale to 100 TB; gram-fingerprint shuffles
    * do — this is the same shape the winnowing and minhash ops use.
    */
  def duplicatedSpans(documents: DataFrame, k: Int = 5): DataFrame = {
    // bound token-array reference — see TextOps.shinglesFromTokens for
    // why the tokenizer must not ride inline into the kgrams lambda
    val grams = documents
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col("doc_id"), posexplode(TextOps.kgrams(col("tk"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        md5(col("col")).as("gfp"))
    val dupGrams = grams.groupBy("gfp").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("gfp")
    val hits = grams.join(dupGrams, "gfp").select("doc_id", "pos")
    // gaps-and-islands: consecutive positions share (pos - row_number)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(
        min("pos").as("span_start"),
        count(lit(1)).as("n_grams"),
        (max("pos") - min("pos") + k).as("span_tokens"))
      .select("doc_id", "span_start", "n_grams", "span_tokens")
      .orderBy("doc_id", "span_start")
  }

  /** The REMOVAL half of the Lee et al. substring-dedup workflow
    * ([[duplicatedSpans]] is the detection half): every token
    * position covered by a duplicated span is dropped from every
    * document — the policy the paper's pipeline applies (all marked
    * occurrences go; the surviving text around them is what trains) —
    * and documents are rebuilt from their surviving tokens in order.
    * Output: (doc_id, n_tokens, n_removed, clean_text) over the
    * token-normalized text; docs shorter than one k-gram pass through
    * untouched.
    *
    * Scale shape: [[duplicatedSpans]]'s passes, plus a narrow
    * span→position explode (output-bounded: Σ span_tokens), a
    * left-anti join on (doc_id, pos), and one reassembly groupBy —
    * document tokens cross the wire once, like [[paragraphDedup]].
    */
  def removeDuplicatedSpans(documents: DataFrame, k: Int = 5): DataFrame = {
    val toks = documents
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("tok"))
    val covered = duplicatedSpans(documents, k)
      .select(col("doc_id"),
        explode(sequence(col("span_start"),
          col("span_start") + col("span_tokens") - 1)).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    toks
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .join(
        kept.groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          concat_ws(" ",
            transform(
              array_sort(collect_list(struct(col("pos"), col("tok")))),
              x => x.getField("tok"))).as("clean_text")),
        Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(documents)
    val chunked = sh.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 15).bitwiseAND((1L << 15) - 1).as("ckey"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.ckey").as("ckey"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Shared boilerplate paragraphs for the planted-paragraph gate
    * fixture — public so the oracle twin interpolates the SAME strings
    * (single source of truth, the s38/t67 precedent).
    */
  val BoilerParagraphs: Seq[String] = Seq(
    "subscribe to our newsletter for updates",
    "all rights reserved contact support for help",
    "click here to read the full article",
    "share this story with your friends")

  /** Planted-paragraph corpus: the gate tables carry single-block
    * texts (no newlines), so paragraph-level dedup would be vacuous
    * over them. This splices deterministic structure in-query — a
    * prefix paragraph, one of four SHARED boilerplate paragraphs
    * (selected by doc_id mod 4), and the remainder — giving the
    * corpus exactly the shape web-crawl text has: per-page content
    * interleaved with site-wide chrome. Pure column arithmetic, so
    * the DuckDB twin rebuilds the identical corpus from the same
    * constants.
    */
  def plantParagraphs(documents: DataFrame): DataFrame = {
    val boiler = element_at(
      lit(BoilerParagraphs.toArray),
      (col("doc_id") % BoilerParagraphs.size + 1).cast("int"))
    documents.select(
      col("doc_id"),
      concat(
        substring(col("text"), 1, 80), lit("\n\n"),
        boiler, lit("\n\n"),
        substring(col("text"), 81, 1000000)).as("text"))
  }

  /** Paragraph-level exact dedup — the Dolma/CCNet curation pass:
    * every paragraph (blank-line-delimited block) is kept at its
    * FIRST global occurrence (ordered by doc_id, then position) and
    * removed everywhere else, including repeats within one document;
    * documents are then reassembled from their surviving paragraphs
    * in original order. This is what strips site-wide boilerplate
    * (nav text, cookie banners, footers) that document-level dedup
    * can never see, because every page differs somewhere.
    *
    * Output: (doc_id, n_paras, n_kept, clean_text) — empty paragraphs
    * never count, and a document whose every paragraph was claimed
    * earlier survives with n_kept = 0 and an empty clean_text (the
    * downstream length filter is a separate policy decision).
    *
    * Scale shape: explode is narrow; the first-occurrence table is a
    * groupBy on the 128-bit paragraph fingerprint with a partial-
    * aggregated min(struct(doc_id, pos)) — map-side combine absorbs
    * mega-dup paragraphs (a cookie banner on a billion pages arrives
    * at the reduce side as one row per map partition, not a billion;
    * the window-rank formulation would serialize that key on one
    * task). The join back on fp is AQE-skew-splittable, and the
    * reassembly groupBy shuffles (pos, para) pairs — document text
    * crosses the wire once, the unavoidable minimum for a rewrite op.
    */
  def paragraphDedup(documents: DataFrame): DataFrame = {
    val paras = paragraphs(documents)
    val firsts = paras
      .groupBy("pfp")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
    assembleParagraphs(paras, firsts)
  }

  /** (doc_id, pos, para, pfp) — non-empty paragraph occurrences. */
  private def paragraphs(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(split(col("text"), "\n\n")).as(Seq("pos", "para")))
      .filter(length(col("para")) > 0)
      .withColumn("pfp", md5(col("para")))

  /** Join occurrences to their global-first table and reassemble each
    * document from its surviving paragraphs.
    */
  private def assembleParagraphs(paras: DataFrame, firsts: DataFrame): DataFrame =
    paras.join(firsts, "pfp")
      .withColumn("kept",
        col("doc_id") === col("f.doc_id") && col("pos") === col("f.pos"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws("\n\n",
          transform(
            array_sort(collect_list(when(col("kept"), struct(col("pos"), col("para"))))),
            x => x.getField("para"))).as("clean_text"))
      .orderBy("doc_id")

  /** First-occurrence paragraph index — (pfp, f struct(doc_id, pos))
    * — the substrate of INCREMENTAL paragraph dedup, the paragraph-
    * level twin of [[exactDedupIndex]]. Persist bucketed BY pfp
    * (`LakeWriter.commitBucketed(index, name, n, Seq("pfp"))` — the
    * manifested protocol the streaming intake uses) and the
    * daily shard probe joins history in place; append the shard's own
    * novel-paragraph firsts after its pass so tomorrow sees today.
    */
  def paragraphIndex(documents: DataFrame): DataFrame =
    paragraphs(documents)
      .groupBy("pfp")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))

  /** [[paragraphDedup]] for a NEW shard against an indexed history:
    * identical output to the full recompute restricted to shard docs
    * — the global first occurrence per paragraph decomposes as
    * least(indexed first, shard-local first), both (doc_id, pos)
    * lexicographic — but history documents are never re-read, never
    * re-split, never shuffled: the only thing history contributes is
    * one index row per DISTINCT paragraph the shard actually shares.
    * Contract: shard doc_ids disjoint from indexed doc_ids.
    *
    * `indexWins = true` makes the INDEX authoritative instead: a
    * paragraph the index already claims is stripped from every shard
    * doc even when the shard carries a smaller doc_id. That is the
    * STREAMING contract ([[graft.streaming.EventStream
    * .paragraphDedupStream]]): batch N already emitted the paragraph,
    * so a backfilled smaller id must not re-emit it — arrival order,
    * not id order, decides firstness. The default (least) is the
    * batch contract, where output must equal the full recompute.
    */
  def incrementalParagraphDedup(
      newDocs: DataFrame, index: DataFrame, indexWins: Boolean = false): DataFrame = {
    val paras = paragraphs(newDocs)
    val localFirst = paras
      .groupBy("pfp")
      .agg(min(struct(col("doc_id"), col("pos"))).as("nf"))
    val resolved =
      if (indexWins) coalesce(col("of"), col("nf")) else least(col("of"), col("nf"))
    val firsts = localFirst
      .join(index.select(col("pfp"), col("f").as("of")), Seq("pfp"), "left")
      .select(col("pfp"), resolved.as("f"))
    assembleParagraphs(paras, firsts)
  }
}
