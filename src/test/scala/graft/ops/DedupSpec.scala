package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup family on a planted corpus: exact dups (normalization
  * variants), near-dups (one-token edits), and unrelated docs.
  * Everything here is deterministic — md5-derived hashing, no PRNG —
  * so assertions are exact, not statistical.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = (1 to 60).map(i => if (i == 30) "EDITED" else s"tok$i").mkString(" ")
  private val other = (100 to 160).map(i => s"zzz$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, base),
    (2L, base.toUpperCase + "!!!"),   // exact dup after normalization
    (3L, nearDup),                    // jaccard 59/61 ≈ 0.967 vs doc 1
    (4L, other)
  ).toDF("doc_id", "text")

  test("exactDedup canonicalizes normalization variants to min doc_id") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.toSeq == Seq(
      Row(1L, 1L, false), Row(2L, 1L, true), Row(3L, 3L, false), Row(4L, 4L, false)))
  }

  test("jaccardPairs finds planted near-dups via prefix filter, exact scores") {
    val out = Dedup.jaccardPairs(docs, threshold = 0.6).collect()
    // pairs among {1,2,3}: (1,2) j=1.0, (1,3)=(2,3) j=59/61
    val j = math.floor(59.0 / 61.0 * 10000.0 + 0.5) / 10000.0
    assert(out.toSeq == Seq(
      Row(1L, 2L, 1.0), Row(1L, 3L, j), Row(2L, 3L, j)))
  }

  test("minhashLshPairs agrees with exact jaccard on high-similarity pairs") {
    val out = Dedup.minhashLshPairs(docs, threshold = 0.5).collect()
    // deterministic md5 minhash: the j≈0.97 planted pairs must bucket together
    val j = math.floor(59.0 / 61.0 * 10000.0 + 0.5) / 10000.0
    assert(out.toSeq == Seq(
      Row(1L, 2L, 1.0), Row(1L, 3L, j), Row(2L, 3L, j)))
  }

  test("crossNearDups emits only train×eval pairs, oriented, with exact scores") {
    // train: 1 (base), 2 (base variant — a WITHIN-train near-dup of 1)
    // eval: 11 (near-dup of train 1), 12 (unrelated)
    val train = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val eval_ = Seq(
      (11L, base.replace("tok7", "SWAPPED")),
      (12L, other)).toDF("doc_id", "text")
    val out = Dedup.crossNearDups(train, eval_, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val j1 = math.floor(59.0 / 61.0 * 10000.0 + 0.5) / 10000.0 // 1 vs 11: 59/61
    val j2 = math.floor(58.0 / 62.0 * 10000.0 + 0.5) / 10000.0 // 2 vs 11: 58/62
    assert(out == Seq((1L, 11L, j1), (2L, 11L, j2)),
      s"cross pairs only, train side first: $out")
    assert(!out.exists(p => p._1 == 1L && p._2 == 2L),
      "the within-train near-dup pair must be unrepresentable")
  }

  test("crossNearDups fails loudly when the doc_id-disjointness contract is violated") {
    val train = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val eval_ = Seq((2L, other), (11L, base)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.crossNearDups(train, eval_, threshold = 0.5)
    }
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  test("winnowPairs: a lifted paragraph pairs even when token-set jaccard " +
      "is too diluted for the jaccard family to see") {
    val para = (1 to 12).map(i => s"lift$i").mkString(" ")
    val long = para + " " + (1 to 80).map(i => s"pad$i").mkString(" ")
    val d = Seq(
      (1L, para),                                        // the source paragraph
      (2L, long),                                        // lifted into a long page
      (3L, (100 to 160).map(i => s"zz$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"only the containment pair, found: $pairs")
    assert(pairs.head._3 >= 2, "the 12-token run must share >= 2 fingerprints")
    // the jaccard family CANNOT see this pair at any usual threshold:
    // |inter| = 12, |union| = 92 → j ≈ 0.13
    assert(Dedup.jaccardPairs(d, threshold = 0.6).collect().isEmpty,
      "token-set jaccard dilutes the lifted paragraph below threshold")
  }

  test("bitmask fast path (vocab <= 64) agrees with exact jaccard") {
    val small = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "f g h i j")
    ).toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(small, threshold = 0.5).collect()
    // only (1,2) qualifies: inter 4, union 6
    assert(out.toSeq == Seq(Row(1L, 2L, math.floor(4.0 / 6.0 * 10000.0 + 0.5) / 10000.0)))
  }

  test("simhashPairs: exact dups at hamming 0, near-dups within 3, others out") {
    val out = Dedup.simhashPairs(docs).collect()
    val asMap = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(asMap.get((1L, 2L)).contains(0L)) // identical token sets
    assert(!asMap.keySet.exists { case (a, b) => a == 4L || b == 4L }) // unrelated doc never pairs
  }

  test("dedupClusters finds connected components: chain, clique, pair") {
    // chain 1-2-3-4-5 (worst case: diameter 4), clique {10,11,12}, pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    Seq(1L, 2L, 3L, 4L, 5L).foreach(d => assert(out(d)._1 == 1L, s"doc $d"))
    Seq(10L, 11L, 12L).foreach(d => assert(out(d)._1 == 10L))
    Seq(20L, 21L).foreach(d => assert(out(d)._1 == 20L))
    assert(out.count(_._2._2) == 3) // one canonical per component
  }

  test("simhash signature is stable and 60-bit bounded") {
    val sigs = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L)) // same token set → same signature
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 60)))
  }

  test("jaccardClusters (set graph) equals dedupClusters over expanded doc pairs") {
    // mixed case: exact-dup group {1,2} (one set, no cross edge needed),
    // near-dup chain via doc 3, unrelated doc 4
    val viaDocGraph = Dedup.dedupClusters(Dedup.jaccardPairs(docs, threshold = 0.6))
      .collect().toSeq
    val viaSetGraph = Dedup.jaccardClusters(docs, threshold = 0.6).collect().toSeq
    assert(viaSetGraph == viaDocGraph)
    // and a corpus whose only duplicates are EXACT (isolated multi-
    // member set, no propagation edges at all)
    val exactOnly = Seq(
      (1L, "same text here"), (2L, "SAME text here!"), (3L, "different words entirely")
    ).toDF("doc_id", "text")
    val a = Dedup.dedupClusters(Dedup.jaccardPairs(exactOnly, 0.9)).collect().toSeq
    val b = Dedup.jaccardClusters(exactOnly, 0.9).collect().toSeq
    assert(b == a)
    assert(b.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 1L), (2L, 1L)))
  }

  test("cache lifecycle: storage returns to baseline after release") {
    import graft.core.GraftCaches
    GraftCaches.release(spark)
    assert(GraftCaches.storageEmpty(spark))
    // full pipeline: canonicalSets persists, dedupClusters checkpoints
    Dedup.dedupClusters(Dedup.jaccardPairs(docs, threshold = 0.6)).collect()
    assert(!GraftCaches.storageEmpty(spark)) // frames live until released
    Dedup.releaseCaches()                    // scoped: tracked persists
    GraftCaches.release(spark)               // final labels checkpoint
    assert(GraftCaches.storageEmpty(spark))
  }

  test("containmentReport surfaces the train doc containing a test doc") {
    import spark.implicits._
    // doc 0 is a TEST doc (id % 20 == 0) fully embedded in train doc 1
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "prefix alpha beta gamma delta suffix words here"),
      (21L, "totally different content with other words going on")).toDF("doc_id", "text")
    val out = Dedup.containmentReport(docs).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L)      // the test doc
    assert(out(0).getLong(1) == 1L)      // its containing train doc
    assert(out(0).getDouble(2) == 1.0)   // every test shingle present
  }

  test("containmentReportWhere takes an arbitrary holdout predicate") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // holdout marked by SOURCE, not id arithmetic — doc 7 (eval) is
    // embedded in train doc 8; the mod-20 rule would call NEITHER a
    // test doc
    val docs = Seq(
      (7L, "eval", "alpha beta gamma delta"),
      (8L, "web", "prefix alpha beta gamma delta suffix words here"),
      (9L, "web", "totally different content with other words going on")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.containmentReportWhere(docs, col("source") === "eval").collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getDouble(2)) == ((7L, 8L, 1.0)))
  }

  test("duplicatedSpans: cross-doc shared run merges to one maximal span; " +
      "within-doc repeat yields two point spans; unique doc yields none") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val rep = (1 to 5).map(i => s"m$i").mkString(" ")
    val spanDocs = Seq(
      // docs 1,2 share an 8-token run at positions 6..13 → 4 dup
      // 5-grams at positions 6..9 → one span (6, 4 grams, 8 tokens)
      (1L, (1 to 5).map(i => s"u$i").mkString(" ") + " " + shared + " " +
        (1 to 5).map(i => s"v$i").mkString(" ")),
      (2L, (1 to 5).map(i => s"w$i").mkString(" ") + " " + shared + " " +
        (1 to 5).map(i => s"x$i").mkString(" ")),
      // doc 3: all-unique tokens → no duplicated grams
      (3L, (1 to 20).map(i => s"q$i").mkString(" ")),
      // doc 4 repeats a 5-gram at positions 6 and 16 → two 1-gram spans
      (4L, (1 to 5).map(i => s"r$i").mkString(" ") + " " + rep + " " +
        (1 to 5).map(i => s"k$i").mkString(" ") + " " + rep + " " +
        (1 to 5).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(spanDocs, k = 5).collect()
    assert(out.toSeq == Seq(
      Row(1L, 6L, 4L, 8L), Row(2L, 6L, 4L, 8L),
      Row(4L, 6L, 1L, 5L), Row(4L, 16L, 1L, 5L)))
  }

  test("removeDuplicatedSpans strips exactly the covered tokens, everywhere") {
    import org.apache.spark.sql.Row
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val spanDocs = Seq(
      (1L, (1 to 5).map(i => s"u$i").mkString(" ") + " " + shared + " " +
        (1 to 5).map(i => s"v$i").mkString(" ")),
      (2L, (1 to 5).map(i => s"w$i").mkString(" ") + " " + shared + " " +
        (1 to 5).map(i => s"x$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"q$i").mkString(" ")), // unique → untouched
      (4L, "too short")                               // < k tokens → untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(spanDocs, k = 5).collect()
    // docs 1,2: the 8 shared tokens (positions 6..13) are removed from BOTH
    assert(out.toSeq == Seq(
      Row(1L, 18L, 8L, (1 to 5).map(i => s"u$i").mkString(" ") + " " +
        (1 to 5).map(i => s"v$i").mkString(" ")),
      Row(2L, 18L, 8L, (1 to 5).map(i => s"w$i").mkString(" ") + " " +
        (1 to 5).map(i => s"x$i").mkString(" ")),
      Row(3L, 20L, 0L, (1 to 20).map(i => s"q$i").mkString(" ")),
      Row(4L, 2L, 0L, "too short")))
  }

  test("paragraphDedup keeps first global occurrence, removes later repeats " +
      "(cross-doc, within-doc), reassembles in order") {
    val pdocs = Seq(
      (1L, "alpha one\n\nshared boiler\n\nunique tail one"),
      (2L, "beta two\n\nshared boiler\n\nunique tail two"),
      (3L, "shared boiler\n\nshared boiler"), // both claimed by doc 1
      (4L, "alpha one")                       // claimed by doc 1's first para
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pdocs).collect()
    assert(out.toSeq == Seq(
      Row(1L, 3L, 3L, "alpha one\n\nshared boiler\n\nunique tail one"),
      Row(2L, 3L, 2L, "beta two\n\nunique tail two"),
      Row(3L, 2L, 0L, ""),
      Row(4L, 1L, 0L, "")))
  }

  test("paragraphDedup ignores empty paragraphs; within-doc earlier position wins") {
    val pdocs = Seq(
      (1L, "a\n\n\n\nb"), // middle split is empty → 2 paragraphs
      (2L, "b\n\na")      // both already claimed by doc 1
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pdocs).collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 2L, "a\n\nb"), Row(2L, 2L, 0L, "")))
  }

  test("incrementalParagraphDedup == full recompute restricted to the shard") {
    import org.apache.spark.sql.functions._
    val planted = Dedup.plantParagraphs(docs)
    val shard = planted.filter(col("doc_id") % 2 === 0)
    val history = planted.filter(col("doc_id") % 2 =!= 0)
    val inc = Dedup.incrementalParagraphDedup(shard, Dedup.paragraphIndex(history))
    val full = Dedup.paragraphDedup(planted).filter(col("doc_id") % 2 === 0)
    assert(inc.collect().toSeq == full.collect().toSeq)
    // a paragraph the history already claims must NOT be kept by the
    // shard even when the shard doc would be its local first
    val hist2 = Seq((1L, "shared para\n\nhist only")).toDF("doc_id", "text")
    val shard2 = Seq((10L, "shared para\n\nshard only")).toDF("doc_id", "text")
    val out = Dedup.incrementalParagraphDedup(shard2, Dedup.paragraphIndex(hist2))
      .collect()
    assert(out.toSeq == Seq(
      org.apache.spark.sql.Row(10L, 2L, 1L, "shard only")))
  }

  test("incrementalParagraphDedup indexWins: an indexed paragraph beats a smaller backfilled id") {
    import org.apache.spark.sql.Row
    val hist = Seq((100L, "banner text\n\nhist content")).toDF("doc_id", "text")
    val backfill = Seq((50L, "banner text\n\nbackfill content")).toDF("doc_id", "text")
    val idx = Dedup.paragraphIndex(hist)
    // batch rule (least): the smaller backfilled id would claim the banner
    val batch = Dedup.incrementalParagraphDedup(backfill, idx).collect()
    assert(batch.toSeq == Seq(Row(50L, 2L, 2L, "banner text\n\nbackfill content")))
    // stream rule (indexWins): arrival order decides — the banner stays stripped
    val stream = Dedup.incrementalParagraphDedup(backfill, idx, indexWins = true).collect()
    assert(stream.toSeq == Seq(Row(50L, 2L, 1L, "backfill content")))
  }

  test("paragraphDedup on plantParagraphs: every distinct paragraph survives exactly once") {
    import org.apache.spark.sql.functions._
    val planted = Dedup.plantParagraphs(docs)
    val paras = planted
      .select(col("doc_id"), explode(split(col("text"), "\n\n")).as("para"))
      .filter(length(col("para")) > 0)
    val out = Dedup.paragraphDedup(planted)
    assert(out.agg(sum("n_kept")).head.getLong(0) == paras.select("para").distinct.count)
    assert(out.agg(sum("n_paras")).head.getLong(0) == paras.count)
  }

  test("ngramDecontaminate: a 13-token verbatim run flags exactly; " +
      "12 tokens do not; repeats count with multiplicity") {
    val evalText = (1 to 20).map(i => s"w$i").mkString(" ") // doc 0: heldout
    val run13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, evalText),
      (1L, "prefix " + run13), // one 13-run → contaminated, 1 hit
      (2L, "prefix " + (1 to 12).map(i => s"w$i").mkString(" ")), // 12 only
      (3L, "totally different content entirely over here right now " +
        "with plenty of tokens to clear the length floor easily " +
        "one two three four"),
      (4L, run13 + " gap " + run13) // two disjoint runs → 2 hits
    ).toDF("doc_id", "text")
    val out = Dedup.ngramDecontaminate(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((2L, true)))
  }
}
