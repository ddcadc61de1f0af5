package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. All pure Column
  * expressions (codegen'd, no UDFs) — each stays inside whole-stage
  * codegen and runs as a single narrow pass over the corpus, which is
  * the only shape that survives 100 TB.
  *
  * Portability contract with the DuckDB oracle: tokenization is
  * `regexp_extract_all(lower(text), '[a-z0-9]+')`, hashing is `md5`
  * hex strings (identical in every engine), ratios are exact integer
  * divisions rounded at the end.
  */
object TextOps {

  /** FUZZY KEY MATCH — entity resolution's workhorse: pairs of names
    * within `maxDist` Levenshtein edits, found via BLOCKED candidates
    * (equal `blockKey`, e.g. a suffix the expected typo class does
    * not touch) then exact edit-distance verify. The block is what
    * makes it a 100 TB operator: candidates are an equi-join on the
    * block key — never all-pairs — and the O(len²) DP runs only on
    * block-mates. Levenshtein is the classic integer DP in both
    * engines, so the distances (and the gate) are engine-exact.
    * Input: (key, name). Output: (key_a, key_b, dist), key_a < key_b.
    */
  def fuzzyMatch(named: DataFrame, blockKey: Column,
      maxDist: Int = 2): DataFrame = {
    val blocked = named.withColumn("_blk", blockKey)
    blocked.as("a")
      .join(blocked.as("b"),
        col("a._blk") === col("b._blk") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
      .orderBy("key_a", "key_b")
  }

  /** [[fuzzyMatch]] with MULTIPLE complementary blocking passes — the
    * standard recall fix for single-block fuzzy matching: a typo
    * INSIDE the block-key region makes the pair invisible to that
    * block (a first-character typo escapes a prefix block, a
    * last-character typo escapes a suffix block), so candidates are
    * unioned from every block (e.g. name-without-first-char AND
    * name-without-last-char), deduped, and verified ONCE. Each pass
    * stays an equi-join on its block key — never all-pairs — so k
    * blocks cost k candidate joins plus one shared verify; candidate
    * dedup happens BEFORE the O(len²) Levenshtein DP, so a pair found
    * by both blocks is verified once. Output: (key_a, key_b, dist),
    * key_a < key_b, pairs within `maxDist` edits that at least one
    * block surfaced.
    */
  def fuzzyMatchMultiBlock(named: DataFrame, blockKeys: Seq[Column],
      maxDist: Int = 2): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val base = named.select(col("key"), col("name"))
    val cands = blockKeys.map { bk =>
      val blocked = base.withColumn("_blk", bk)
      blocked.as("a")
        .join(blocked.as("b"),
          col("a._blk") === col("b._blk") && col("a.key") < col("b.key"))
        .select(col("a.key").as("key_a"), col("b.key").as("key_b"))
    }.reduce(_ unionByName _).distinct()
    cands
      .join(base.select(col("key").as("key_a"), col("name").as("name_a")), "key_a")
      .join(base.select(col("key").as("key_b"), col("name").as("name_b")), "key_b")
      .select(col("key_a"), col("key_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .orderBy("key_a", "key_b")
  }

  /** ENTITY-ID ASSIGNMENT over fuzzy pairs — the operator users
    * actually join on: every key gets an `entity_id` (the minimum key
    * of its connected component over the verified pairs — a
    * deterministic canonical representative), keys with no fuzzy
    * match get themselves. Components come from the same distributed
    * min-label propagation the dedup clusters use
    * ([[graft.ops.Dedup.dedupClusters]] — one shared core, so the two
    * families can't drift); the singleton fill-in is a left join on
    * the key, nothing corpus-sized beyond the pair graph moves.
    * Input: `named` = (key, name) universe, `pairs` = (key_a, key_b)
    * from [[fuzzyMatch]]/[[fuzzyMatchMultiBlock]].
    * Output: (key, entity_id, is_canonical), one row per distinct key.
    */
  def entityIds(named: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = Dedup.dedupClusters(
      pairs.select(col("key_a").as("doc_a"), col("key_b").as("doc_b")))
    named.select(col("key")).distinct()
      .join(clusters.select(col("doc_id").as("key"), col("cluster_id")),
        Seq("key"), "left")
      .select(col("key"),
        coalesce(col("cluster_id"), col("key")).as("entity_id"))
      .withColumn("is_canonical", col("key") === col("entity_id"))
      .orderBy("key")
  }

  /** Canonical token list (lowercased alphanumeric runs). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** POSITIONAL PHRASE SEARCH — exact adjacent-term matching over a
    * positional inverted index, the IR operator BM25 can't express
    * ("term A immediately followed by term B"): posexplode builds
    * (doc_id, pos, tok) postings, the phrase becomes a CHAIN of
    * equi-joins on (doc_id, pos − k) — each join consumes only the
    * k-th term's posting list (term-selective, shuffle-partitioned
    * by doc), never a scan of the text. Positions are reported
    * 1-based. Output: (doc_id, n_hits, first_pos) for matching docs.
    */
  def phraseSearch(documents: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val pos = documents.select(col("doc_id"),
      posexplode(tokens(col("text")))).toDF("doc_id", "pos", "tok")
    val first = pos.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val hits = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (term, k)) =>
        acc.join(pos.filter(col("tok") === term)
          .select(col("doc_id"), (col("pos") - k).as("pos")),
          Seq("doc_id", "pos"))
    }
    hits.groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        (min("pos") + 1).cast("long").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Raw word n-gram sequence — in document order, WITH multiplicity
    * — the shared core of the shingle family ([[shinglesFromTokens]]
    * distincts it, [[repetitionScores]] sorts it, [[winnowSets]]
    * hashes it; one definition so a tokenizer or separator change
    * cannot silently desync the ops from their oracle twins). Callers
    * guard `size(tk) >= n` (Spark's `sequence` descends otherwise).
    */
  private[ops] def kgrams(tk: Column, n: Int): Column =
    transform(
      sequence(lit(1), size(tk) - (n - 1)),
      i => concat_ws(" ", slice(tk, i, lit(n))))

  /** Word n-gram shingles (distinct, space-joined) — the unit for
    * n-gram Jaccard dedup: order-sensitive where token sets aren't,
    * so reshuffled near-copies stop looking identical. Documents with
    * fewer than `n` tokens produce an empty array (no shingles — the
    * guard avoids Spark's descending `sequence` when size < n).
    *
    * `tk` MUST be a materialized token-array column (project
    * [[tokens]] into a named column first), never the tokenizer
    * expression inline: higher-order lambdas are CodegenFallback
    * (interpreted), and a free subtree inside the lambda body is
    * re-evaluated once PER ELEMENT — an inline `tokens(text)` here
    * turns O(n) shingling into O(n²) regexp extractions per document
    * (measured 5–10× wall-clock on the shingle family). A bound
    * reference survives because CollapseProject refuses to re-inline
    * a non-cheap expression referenced more than once.
    */
  def shinglesFromTokens(tk: Column, n: Int = 3): Column =
    when(size(tk) >= n, array_distinct(kgrams(tk, n)))
      .otherwise(array().cast("array<string>"))

  /** BPE-ish sub-word tokenization: contractions, space-prefixed
    * letter runs, digit runs, punctuation runs — the GPT-2-shaped
    * regex family, restricted to RE2-safe constructs so the DuckDB
    * oracle tokenizes identically. Counts from this are the closer
    * proxy for LLM token budgets than whitespace words.
    */
  val bpeishPattern: String = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpeishPattern), lit(0))

  /** BPE-ish token counts per source (the LLM-budget twin of
    * [[tokenCounts]]).
    */
  def bpeishTokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), size(bpeishTokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(
        sum("n").as("total_tokens"),
        Exact.meanOfLong(col("n")).as("avg_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Repetition scoring: share of the document covered by its single
    * most frequent word n-gram — boilerplate/template text scores
    * high, natural prose low. The standard "repeated n-gram fraction"
    * filter of training-data pipelines, as ONE NARROW PASS: the
    * per-doc shingle multiset (NOT distinct — repetition is the
    * point) is sorted per row, so the max multiplicity of any shingle
    * equals the max run length of equal neighbors — computed by a
    * single `aggregate()` fold over the sorted array. No explode, no
    * shuffle: the only exchange left is the final presentation sort.
    * The DuckDB twin keeps its groupBy formulation — max run length
    * of a sorted multiset and max group count are the same number.
    */
  def repetitionScores(documents: DataFrame, n: Int = 3): DataFrame = {
    // all shingles WITH multiplicity, sorted so equal ones are
    // adjacent; `tk` is a bound reference, NOT the inline tokenizer —
    // see [[shinglesFromTokens]] for why (interpreted lambda would
    // re-tokenize per element)
    val tk = col("tk")
    val sh = when(size(tk) >= n, array_sort(kgrams(tk, n)))
      .otherwise(array().cast("array<string>"))
    // native codegen'd scan when the graft extensions are installed
    // (GraftSession always installs them); else the composable
    // `aggregate()` fold — same left-to-right scan, identical result.
    // Shingles are never empty strings, so "" is a safe prev sentinel.
    // Resolved against the session that OWNS the input frame, not
    // SparkSession.active — a frame built while another session is
    // active must not silently lose the native path.
    val session = documents.sparkSession
    val best: Column =
      if (session.catalog.functionExists("graft_max_sorted_run"))
        call_function("graft_max_sorted_run", col("sh"))
      else {
        val st = aggregate(
          col("sh"),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => {
            val run = when(x === acc.getField("prev"), acc.getField("run") + lit(1L))
              .otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          })
        st.getField("best")
      }
    documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), sh.as("sh"))
      .select(
        col("doc_id"),
        best.as("top_count"),
        size(col("sh")).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0)
      .select(
        col("doc_id"), col("top_count"), col("n_shingles"),
        Exact.quant4(col("top_count").cast("double") / col("n_shingles")).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Normalized text: lowercase, non-alphanumeric collapsed to single
    * spaces, trimmed — the canonical form for exact-dup fingerprints.
    */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Character maps for UNICODE normalization (the CCNet-style
    * cleanup a web corpus needs BEFORE tokenization/dedup — "Café"
    * and "Cafe", curly and straight quotes, en/em dashes must not
    * count as different content): common Latin-1/Latin-Extended
    * accents fold to ASCII, typographic dashes/quotes to their ASCII
    * forms. One flat 1:1 table applied by `translate` (codegen'd, no
    * UDF, and the IDENTICAL builtin exists in the oracle engine) —
    * a public constant so the twin interpolates the same table.
    */
  val UnicodeFoldFrom: String =
    "àáâãäå" + // à á â ã ä å
    "èéêë" +             // è é ê ë
    "ìíîï" +             // ì í î ï
    "òóôõö" +       // ò ó ô õ ö
    "ùúûü" +             // ù ú û ü
    "çñý" +                   // ç ñ ý
    "–—‘’“”"   // – — ' ' " "
  val UnicodeFoldTo: String =
    "aaaaaa" + "eeee" + "iiii" + "ooooo" + "uuuu" + "cny" + "--''\"\""

  /** Unicode-normalized text: lowercase (folds accented UPPERCASE to
    * the lowercase forms the table covers), accent/typography fold,
    * whitespace collapse, trim. A narrow codegen'd pass — the
    * normalization stage of a crawl pipeline, upstream of
    * [[fingerprint]]-style dedup.
    */
  def normalizeUnicode(text: Column): Column =
    trim(regexp_replace(
      translate(lower(text), UnicodeFoldFrom, UnicodeFoldTo), "\\s+", " "))

  /** Per-document unicode normalization report: (doc_id, norm_text,
    * n_chars) over [[normalizeUnicode]].
    */
  def normalizeTexts(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), normalizeUnicode(col("text")).as("norm_text"))
      .withColumn("n_chars", length(col("norm_text")).cast("long"))
      .orderBy("doc_id")

  /** Deterministic 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Language ID by marker-token counting — an n-gram/stopword
    * heuristic. Returns the language with the highest marker hit
    * count; precedence order breaks ties deterministically.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => array_contains(lit(markers.toArray), t))).cast("long")
    }

  def predictLangFromTokens(tk: Column): Column = {
    val scores = langScores(tk)
    val best = greatest(scores.map(_._2): _*)
    // first language (in declared precedence) achieving the max score
    scores.reverse.foldLeft(lit("unknown")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  def predictLang(text: Column): Column = predictLangFromTokens(tokens(text))

  /** Confusion counts: declared lang vs heuristic prediction. The
    * token array is materialized once — the four language scores are
    * separate `filter` lambdas, each of which would otherwise
    * re-evaluate an inline tokenizer.
    */
  def langIdReport(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), tokens(col("text")).as("tk"))
      .withColumn("pred_lang", predictLangFromTokens(col("tk")))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")

  /** Per-document quality metrics + a composite score. All arithmetic
    * is integer-derived then divided once — deterministic across
    * engines; rounded at the end for hash-stable output.
    */
  def qualityScores(documents: DataFrame): DataFrame = {
    // four metrics over one MATERIALIZED token array (each would
    // otherwise re-run the tokenizer — see shinglesFromTokens)
    val toks = col("tk")
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
    val stopList = lit(Array("the", "a", "of", "and", "is", "to", "in"))
    val nStop = size(filter(toks, t => array_contains(stopList, t))).cast("long")
    documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), nTok.as("n_tokens"), nUniq.as("n_uniq"), sumLen.as("sum_len"), nStop.as("n_stop"))
      .filter(col("n_tokens") > 0)
      .select(
        col("doc_id"), col("n_tokens"), col("n_uniq"),
        Exact.quant4(col("sum_len").cast("double") / col("n_tokens")).as("avg_token_len"),
        Exact.quant4(col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
        Exact.quant4(col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        Exact.quant4(
          col("n_uniq").cast("double") / col("n_tokens") * 0.5
            + least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * 0.3
            + (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) * 0.2)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  /** Token counts per source — the "how many tokens is this corpus"
    * question every training pipeline asks. Single narrow pass + tiny
    * aggregation.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(
        sum("n").as("total_tokens"),
        Exact.meanOfLong(col("n")).as("avg_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Deterministic train/val/test split assignment by CONTENT hash
    * (16 bits of the normalized-text md5, mod 10 → 8/1/1): stable
    * under re-ingestion and row reordering, and exact duplicates land
    * in the same split by construction — the property that matters
    * for leakage (id-based splits scatter dups across splits). Pure
    * narrow pass + tiny aggregate; reports per (source, split) doc
    * and char counts.
    */
  def splitAssign(documents: DataFrame): DataFrame = {
    val bucket = conv(substring(fingerprint(col("text")), 1, 4), 16, 10).cast("long") % 10
    documents
      .withColumn("split",
        when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source", "split")
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * word k-gram, then keep the MINIMUM hash of each length-`w`
    * sliding window over the hash sequence — the rolling-hash
    * document fingerprinting scheme: any shared substring of
    * ≥ w+k-1 tokens between two documents is guaranteed to share a
    * selected fingerprint, at ~2/(w+1) of the shingle count stored.
    * Reports per document: shingle count, selected-fingerprint count,
    * and the min/max selected hash (60-bit md5-prefix integers —
    * engine-portable). Pure per-row array expressions, one narrow
    * pass; documents shorter than one window keep their single
    * minimum.
    */
  def winnowFingerprints(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnowSets(documents, k, w)
      .select(col("doc_id"), col("n_shingles"),
        size(col("fp")).cast("long").as("n_fp"),
        array_min(col("fp")).as("fp_min"),
        array_max(col("fp")).as("fp_max"))
      .orderBy("doc_id")

  /** (doc_id, n_shingles, fp array) — the selected-fingerprint sets
    * behind [[winnowFingerprints]]; the spec asserts the winnowing
    * guarantee on them directly.
    */
  private[ops] def winnowSets(documents: DataFrame, k: Int, w: Int): DataFrame = {
    // bound references (tk, hs) — see [[shinglesFromTokens]] for why
    // inline subtrees inside higher-order lambdas are re-evaluated
    // per element
    val tk = col("tk")
    val hashes = when(size(tk) >= k,
      transform(kgrams(tk, k),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
      .otherwise(array().cast("array<long>"))
    val hs = col("hs")
    // native codegen'd sliding minima when the graft extensions are
    // installed (GraftSession always installs them): the composable
    // slice-per-window form is interpreted and O(m·w) allocations.
    // Same values in the same order FOR NULL-FREE input (the md5-
    // derived hashes here are non-null by construction; with nulls
    // the native form windows the compacted sequence while the
    // fallback windows original positions) — gate hashes never move.
    val windowMins: Column =
      if (documents.sparkSession.catalog.functionExists("graft_window_min"))
        call_function("graft_window_min", hs, lit(w))
      else
        when(size(hs) >= w,
          transform(sequence(lit(1), size(hs) - (w - 1)),
            i => array_min(slice(hs, i, lit(w)))))
          .otherwise(array(array_min(hs)))
    val sel = array_distinct(windowMins)
    documents
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), hashes.as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"), sel.as("fp"))
  }

  /** Content fingerprint + coarse length bucket per document. */
  /** PII patterns — restricted to the regex subset where Java
    * (Spark) and RE2 (DuckDB) agree exactly: character classes,
    * bounded quantifiers, grouping. No lookaround, no backrefs, no
    * \b (RE2's is ASCII-only and Java's isn't — a corpus with
    * non-ASCII word chars would diverge).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction — the scrub every shipped training corpus runs:
    * emails, phone-shaped numbers, IPv4 literals replaced by typed
    * placeholders, with per-type counts for audit. Order is part of
    * the contract (email → phone → IP, counts taken on the text AS
    * REDACTED SO FAR) because the pattern domains overlap: a
    * dot-separated phone is also a 4-octet digit run, so phone must
    * claim it before the IP pass sees it. Pure codegen'd Columns —
    * three regex passes, one narrow stage, no shuffle.
    */
  def redactPii(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("_t1", regexp_replace(col("text"), EmailRe, "[EMAIL]"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("_t1"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("_t2", regexp_replace(col("_t1"), PhoneRe, "[PHONE]"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("_t2"), lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("redacted", regexp_replace(col("_t2"), Ipv4Re, "[IP]"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .orderBy("doc_id")

  /** Character-window chunk EXTRACTION with overlap — the slicing op
    * an embedding pipeline runs downstream of [[graft.ops.CorpusOps
    * .chunkPlan]]'s sizing math: one output row per (doc, window),
    * windows starting every `width - overlap` characters until the
    * document is exhausted (the tail chunk is simply shorter; a
    * substring never pads). Pure explode + substring column math —
    * one narrow pass, chunk count per doc is ⌈len/stride⌉, and the
    * 1-based substring semantics are identical in DuckDB, so the
    * twin is the same arithmetic verbatim.
    */
  /** Default chunk geometry — public so the oracle twin interpolates
    * the SAME constants instead of repeating literals.
    */
  val DefaultChunkWidth = 200
  val DefaultChunkOverlap = 50

  def chunkTexts(
      documents: DataFrame,
      width: Int = DefaultChunkWidth, overlap: Int = DefaultChunkOverlap): DataFrame = {
    require(width > overlap && overlap >= 0, "need width > overlap >= 0")
    val stride = width - overlap
    documents
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") > 0)
      .withColumn("start", explode(sequence(lit(1), col("len"), lit(stride))))
      .select(
        col("doc_id"),
        (((col("start") - 1) / stride).cast("long")).as("chunk_id"),
        col("start").cast("long").as("start"),
        expr(s"substring(text, start, $width)").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Hashed-feature linear classifier SERVING — the fasttext-shaped
    * model-based quality filter every modern corpus pipeline runs
    * after the rule-based pass ([[graft.ops.CorpusOps.gopherFilter]]):
    * tokens hash into `nBuckets` feature buckets (the hashing trick —
    * vocabulary-free, so the model table has fixed size no matter the
    * corpus), each bucket carries a trained weight, and a document's
    * score is its mean token weight. Serving is a narrow explode +
    * one equi-join on bucket + a partial-agg groupBy — the weight
    * table joins like any dimension (broadcast when it fits).
    *
    * Portability: weights are INTEGER (w_int ∈ [0, P); a real model
    * quantizes its floats the same way), summed exactly as longs;
    * the only float ops are the final divisions — score =
    * (Σw)/(n·P) − 0.5, quantized — so the gate is bit-exact. Docs
    * with zero tokens have no features and drop (explode semantics).
    */
  val ClassifierP = 2147483647L // 2^31 − 1 (Mersenne), shared with the twin
  val ClassifierA = 1103515245L
  val ClassifierB = 12345L

  /** Deterministic pseudo-weight table for the gate fixture — a
    * PRODUCTION caller loads trained weights with this same
    * (bucket, w_int) schema instead.
    */
  def hashedWeightTable(
      spark: org.apache.spark.sql.SparkSession, nBuckets: Int = 4096): DataFrame =
    spark.range(nBuckets).select(
      col("id").as("bucket"),
      ((col("id") * ClassifierA + ClassifierB) % ClassifierP).as("w_int"))

  /** 60-bit md5-prefix token hash mod nBuckets — the same portable
    * hash family the minhash signatures use.
    */
  private def featureBucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % nBuckets

  def classifierScores(
      documents: DataFrame, weights: DataFrame, nBuckets: Int = 4096): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), featureBucket(col("tok"), nBuckets).as("bucket"))
      .join(weights, "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w_int").as("s"))
      .select(
        col("doc_id"), col("n_tokens"),
        Exact.quant4(
          col("s").cast("double") / col("n_tokens") / lit(ClassifierP.toDouble) - 0.5)
          .as("score"))
      .withColumn("keep", col("score") > 0.0)
      .orderBy("doc_id")

  def fingerprints(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        (col("n_chars") - col("n_chars") % 100).as("len_bucket"))
      .orderBy("doc_id")
}
