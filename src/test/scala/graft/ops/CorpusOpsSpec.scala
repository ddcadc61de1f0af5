package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("stratifiedSample takes exactly `quota` docs per stratum, deterministically") {
    val d = docs((1L to 20L).map(i =>
      (i, if (i <= 10) "a" else "b", s"document number $i with words")): _*)
    val s1 = CorpusOps.stratifiedSample(d, quota = 3).collect()
    val s2 = CorpusOps.stratifiedSample(d, quota = 3).collect()
    assert(s1.toSeq == s2.toSeq) // reproducible
    val bySource = s1.groupBy(_.getString(0))
    assert(bySource("a").length == 3 && bySource("b").length == 3)
    assert(bySource("a").map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)) // ranks
  }

  test("stratifiedSample is content-keyed: reordering rows changes nothing") {
    val d = docs((1L to 12L).map(i => (i, "s", s"text payload $i")): _*)
    val shuffled = docs((1L to 12L).reverse.map(i => (i, "s", s"text payload $i")): _*)
    val a = CorpusOps.stratifiedSample(d, 4).collect().map(_.getLong(2)).toSeq
    val b = CorpusOps.stratifiedSample(shuffled, 4).collect().map(_.getLong(2)).toSeq
    assert(a == b)
  }

  test("stratifiedSample pre-filter bounds the window input to ~quota rows per stratum") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = docs((1L to 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", s"payload text $i")): _*)
    val h = d.select(col("doc_id"), col("source"),
      TextOps.fingerprint(col("text")).as("h"))
    val survivors = CorpusOps.hashBounded(h, quota = 5)
    val bySrc = survivors.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 200-row strata are cut to ≈quota before any window ranks them
    assert(bySrc.keySet == Set("a", "b"))
    assert(bySrc.values.forall(c => c >= 5 && c <= 10), s"survivors: $bySrc")
    // and the bounded sample equals the unfiltered windowed formulation
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    val expected = h.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5).select("source", "rnk", "doc_id", "h")
      .orderBy("source", "rnk").collect()
    assert(CorpusOps.stratifiedSample(d, 5).collect().toSeq == expected.toSeq)
  }

  test("stratifiedSample keeps the whole stratum when it is smaller than the quota") {
    val d = docs((1L, "tiny", "one doc"), (2L, "tiny", "two doc"), (3L, "tiny", "three doc"))
    val out = CorpusOps.stratifiedSample(d, quota = 5).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("tokenOffsets: >1 chunk for a single-source corpus, same numbers as a window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = docs((1L to 200L).map(i => (i, "solo", s"tok$i word$i extra$i")): _*)
    val slim = d.select(col("source"), col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val off = CorpusOps.tokenOffsets(slim, Seq("source"), parts = 8)
    // the single stratum spreads across chunks — no one-task serialization
    assert(off.select("pid").distinct().count() > 1)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = slim
      .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select("doc_id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = off.select("doc_id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("tokenOffsets: strata straddling chunk boundaries keep exact per-stratum offsets") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // interleaved sources (i % 5) so every range chunk contains several
    // strata — the regression that cross-contaminated local sums
    val d = docs((1L to 300L).map(i => (i, s"src${i % 5}", s"w$i x$i y$i z$i")): _*)
    val slim = d.select(col("source"), col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val got = CorpusOps.tokenOffsets(slim, Seq("source"), parts = 7)
      .select("doc_id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = slim
      .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select("doc_id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("tokenOffsets equals the windowed running total on randomized corpora") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val rows = (1L to 150L).map(i =>
        (i, s"src${rng.nextInt(4)}", rng.nextInt(40).toLong))
      val slim = rows.toDF("doc_id", "source", "n_tokens")
      val parts = 2 + rng.nextInt(9)
      val got = CorpusOps.tokenOffsets(slim, Seq("source"), parts)
        .select("doc_id", "offset").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = slim
        .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
        .select("doc_id", "offset").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed parts=$parts")
      graft.core.GraftCaches.release(spark)
    }
  }

  test("tfidfTopTerms ranks rare terms above common ones") {
    val d = docs(
      (1L, "s", "shared shared shared zebra"),
      (2L, "s", "shared common words here"),
      (3L, "s", "shared common words there"))
    val out = CorpusOps.tfidfTopTerms(d, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // doc 1: zebra df=1 beats shared (tf=3, df=3 → score 1.0 = tie w/ zebra 1/1;
    // tie broken by term asc → "shared"... so check doc 2/3 instead)
    assert(out(2L) == "here")   // df=1 → score 1.0, beats common (1/2) and words (1/2)
    assert(out(3L) == "there")
  }

  test("tfidfTopTerms score is tf/df and ranking is dense top-k per doc") {
    val d = docs((1L, "s", "x x y"), (2L, "s", "y z"))
    val rows = CorpusOps.tfidfTopTerms(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // doc1: x tf=2 df=1 → 2.0 ; y tf=1 df=2 → 0.5
    assert(rows.contains((1L, 1L, "x", 2.0)))
    assert(rows.contains((1L, 2L, "y", 0.5)))
    // doc2: z tf=1 df=1 → 1.0 ; y → 0.5
    assert(rows.contains((2L, 1L, "z", 1.0)))
    assert(rows.contains((2L, 2L, "y", 0.5)))
  }

  test("packSequences assigns a doc to the sequence of its first token and conserves tokens") {
    // tokens: 3, 4, 2, 5 → offsets 0,3,7,9 → with seqLen=5: seqs 0,0,1,1
    val d = docs(
      (1L, "s", "a b c"),
      (2L, "s", "d e f g"),
      (3L, "s", "h i"),
      (4L, "s", "j k l m n"))
    val out = CorpusOps.packSequences(d, seqLen = 5L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((0L, 2L, 7L, 1L, 2L), (1L, 2L, 7L, 3L, 4L)))
    assert(out.map(_._3).sum == 14L) // every token lands in exactly one sequence
  }

  test("packSequences packs each source independently") {
    val d = docs((1L, "a", "x y z"), (2L, "b", "x y z"))
    val out = CorpusOps.packSequences(d, seqLen = 2L).collect()
    assert(out.map(_.getString(0)).toSet == Set("a", "b"))
    assert(out.forall(_.getLong(1) == 0L)) // both start their own seq 0
  }

  test("mixtureSample downsamples toward the per-source budget deterministically") {
    val d = docs((1L to 100L).map(i =>
      (i, if (i <= 80) "big" else "small", s"text of doc $i")): _*)
    val out = CorpusOps.mixtureSample(d, budget = 20).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 2 sources → target 10 each
    assert(out("big")._1 == 80 && out("big")._2 == 10)
    assert(out("small")._1 == 20 && out("small")._2 == 10)
    // the hash slice keeps a strict subset of the big source
    assert(out("big")._3 > 0 && out("big")._3 < 80)
    // reproducible under row reordering (content-keyed)
    val shuffled = docs((1L to 100L).reverse.map(i =>
      (i, if (i <= 80) "big" else "small", s"text of doc $i")): _*)
    assert(CorpusOps.mixtureSample(shuffled, 20).collect().toSeq ==
      CorpusOps.mixtureSample(d, 20).collect().toSeq)
    // a source smaller than its target keeps everything (rate caps at 1)
    val tiny = docs((1L, "t", "alpha"), (2L, "t", "beta"))
    assert(CorpusOps.mixtureSample(tiny, budget = 200).collect()(0).getLong(3) == 2L)
  }

  test("mixtureSampleTemperature gives rare sources a super-proportional share") {
    // n = 100 vs 400: sqrt weights 1e7 vs 2e7 → targets 33 / 66 of
    // budget 100 — the rare source holds 33% where proportional
    // sampling would give it 20%
    val d = docs((1L to 500L).map(i =>
      (i, if (i <= 100) "rare" else "big", s"text of doc $i")): _*)
    val out = CorpusOps.mixtureSampleTemperature(d, budget = 100).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("rare") == ((100L, 10000000L, 33L, out("rare")._4)))
    assert(out("big") == ((400L, 20000000L, 66L, out("big")._4)))
    // the hash slice lands near each target and is a strict subset
    assert(out("rare")._4 > 0 && out("rare")._4 < 100)
    assert(out("big")._4 > 0 && out("big")._4 < 400)
    // content-keyed: row order changes nothing
    val shuffled = docs((1L to 500L).reverse.map(i =>
      (i, if (i <= 100) "rare" else "big", s"text of doc $i")): _*)
    assert(CorpusOps.mixtureSampleTemperature(shuffled, 100).collect().toSeq ==
      CorpusOps.mixtureSampleTemperature(d, 100).collect().toSeq)
  }

  test("tfidfSearch ranks the on-topic document first, bounded by k") {
    val d = docs(
      (1L, "s", "spark window agg join shuffle"),
      (2L, "s", "lorem ipsum dolor sit amet lorem"),
      (3L, "s", "spark window partition order"),
      (4L, "s", "completely different words entirely"),
      (5L, "s", "window window window spark agg"))
    val out = CorpusOps.tfidfSearch(d, "spark window agg", k = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // dense ranks
    // the docs sharing the query's terms outrank the unrelated ones
    val top = out.map(_.getLong(1)).toSet
    assert(Set(1L, 3L, 5L).intersect(top).size == 3,
      s"on-topic docs must fill the top-3, got ${out.toSeq}")
    // scores are quantized cosines in (0, 1]
    out.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }

  test("shuffleOrder is a seeded total permutation with no corpus-wide window") {
    val d = docs((1L to 300L).map(i => (i, "s", s"doc $i")): _*)
    val out = CorpusOps.shuffleOrder(d)
    val pos = out.collect().map(r => r.getLong(0) -> r.getLong(1))
    // a permutation: every position 1..N exactly once
    assert(pos.map(_._2).sorted.toSeq == (1L to 300L))
    // deterministic under the same seed; different under another
    assert(CorpusOps.shuffleOrder(d).collect().toSeq == out.collect().toSeq)
    val other = CorpusOps.shuffleOrder(d, seed = 7L).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(other.toMap != pos.toMap, "a new seed must reshuffle")
    assert(other.map(_._2).sorted.toSeq == (1L to 300L))
    // the scale claim: every corpus-sized window is PARTITIONED — the
    // only unpartitioned window may be the ≤65,536-row bucket-offset
    // sum (AQE off so WindowExec nodes are visible, not in stages)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val windows = CorpusOps.shuffleOrder(d).queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
      assert(unpartitioned.forall(w => !w.toString.contains("hkey")),
        s"corpus-sized window must not be global:\n${unpartitioned.mkString("\n")}")
      assert(windows.exists(_.partitionSpec.nonEmpty),
        "the per-document rank must ride a PARTITIONED window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("vocabulary ranks tokens by occurrence with dense ids and stable ties") {
    val d = docs(
      (1L, "s", "b b b a a c"),
      (2L, "s", "a b d"))
    val out = CorpusOps.vocabulary(d, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // b: 4, a: 3, then c/d tie at 1 → token order keeps c
    assert(out.toSeq == Seq((1L, "b", 4L), (2L, "a", 3L), (3L, "c", 1L)))
  }

  test("vocabulary top-k compiles to TakeOrderedAndProject, not a global sort") {
    val d = docs((1L to 50L).map(i => (i, "s", s"tok$i word$i")): _*)
    val plan = CorpusOps.vocabulary(d, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("cooccurrence ranks tight collocations above frequent-but-independent pairs") {
    // "alpha beta" always adjacent (4×); "x"/"y" frequent but loosely coupled
    val d = docs(
      (1L, "s", "alpha beta x x x x y y y y"),
      (2L, "s", "alpha beta x x x x y y y y"),
      (3L, "s", "alpha beta x x x y y y"),
      (4L, "s", "alpha beta x y"))
    val out = CorpusOps.cooccurrence(d, window = 2, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the collocation is the top pair
    assert(out.head._1 == "alpha" && out.head._2 == "beta" && out.head._3 == 4L)
  }

  test("cooccurrence window bounds the pair fan-out") {
    val d = docs((1L, "s", "a b c d e"))
    // window 1: only adjacent pairs
    val w1 = CorpusOps.cooccurrence(d, window = 1, k = 50).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(w1 == Set(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")))
  }

  test("chunkPlan counts stride windows and tail padding exactly") {
    val d = docs(
      (1L, "s", (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "s", (1 to 5).map(i => s"t$i").mkString(" ")),  // 5 toks
      (3L, "s", "a b c"),                                  // 3 toks < win
      (4L, "s", "!!!"))                                    // 0 tokens
    val r = CorpusOps.chunkPlan(d, win = 4L, stride = 2L).collect()(0)
    assert(r.getLong(1) == 4L)  // n_docs
    assert(r.getLong(2) == 18L) // n_tokens
    // chunks: 10→1+ceil(6/2)=4; 5→1+ceil(1/2)=2; 3→1; 0→0
    assert(r.getLong(3) == 7L)
    // pads: 10→(3·2+4)-10=0; 5→(1·2+4)-5=1; 3→4-3=1; 0→0
    assert(r.getLong(4) == 2L)
  }

  test("boilerplateShingles surfaces the planted template text first") {
    val footer = "all rights reserved worldwide"
    val d = docs(
      (1L, "s", s"unique alpha content one $footer"),
      (2L, "s", s"unique beta content two $footer"),
      (3L, "s", s"unique gamma content three $footer"),
      (4L, "s", "totally unrelated words here"))
    val out = CorpusOps.boilerplateShingles(d, n = 3, minDf = 2L, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the footer's shingles appear in 3 docs; nothing else repeats
    assert(out.nonEmpty)
    assert(out.head._1 == 1L && out.head._3 == 3L)
    assert(out.forall(_._2.split(" ").length == 3))
    assert(out.head._2 == "all rights reserved") // (df 3, lexicographic first)
  }

  test("corpusBuild composes dedup, filter, split and packing in one pipeline") {
    val good = ("the quick brown fox of the hills is happy to run in sunny fields " * 2).trim
    val d = docs(
      (1L, "s", good),
      (2L, "s", good.toUpperCase + "!!!"), // exact dup of 1 → dropped by dedup
      (3L, "s", "tiny doc"))               // fails the token-count rule
    val out = CorpusOps.corpusBuild(d).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "s")
    assert(Set("train", "val", "test").contains(r.getString(1)))
    assert(r.getLong(2) == 0L) // seq_id
    assert(r.getLong(3) == 1L) // only the canonical survivor packs
    assert(r.getLong(4) == 28L) // its full token count
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L) // doc range = {1}
  }

  test("gopherFilter flags each rule independently") {
    val stopRich = ("the quick brown fox of the hills is happy to run in " * 3).trim
    val d = docs(
      (1L, "s", stopRich),                          // passes everything
      (2L, "s", "tiny doc"),                        // fails ok_len (2 tokens)
      (3L, "s", ("a b c d e f g h i j " * 3).trim), // 30 toks, mean len 1 → fails ok_word_len
      (4L, "s", ("verylongwords without anycommon stopwordshere atall moretext " * 4).trim))
    val out = CorpusOps.gopherFilter(d, minTokens = 5L, maxTokens = 100L).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(out(1L) == (true, true, true, true, true))
    assert(out(2L)._1 == false && out(2L)._5 == false)
    assert(out(3L)._2 == false && out(3L)._5 == false)
    assert(out(4L)._3 == false && out(4L)._5 == false) // no 2 distinct stopwords
  }

  test("gopherFilter type-token ratio screens heavy repetition") {
    val d = docs((1L, "s", ("the of is " * 20).trim)) // 60 tokens, 3 uniq → ttr 0.05
    val r = CorpusOps.gopherFilter(d, minTokens = 5L, maxTokens = 100L).collect()(0)
    assert(r.getBoolean(5) == false) // ok_ttr
    assert(r.getBoolean(6) == false) // keep
  }

  /** Reference single-node BPE (Sennrich et al. 2016, word-type
    * weighted, greedy leftmost merge application) — the oracle for
    * [[CorpusOps.bpeTrain]]'s distributed loop.
    */
  private def referenceBpe(
      texts: Seq[String], nMerges: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, cnt) =>
        sym.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + cnt
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), freq) = counts.toSeq.minBy { case ((x, y), c) => (-c, s"$x $y") }
        merges += ((rank, a, b, freq))
        words = words.map { case (sym, cnt) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          sym.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b) out(out.size - 1) = a + b
            else out += x
          }
          out.toVector -> cnt
        }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        rank += 1
      }
    }
    merges.toSeq
  }

  test("bpeTrain reproduces the reference merge sequence, including greedy overlaps") {
    val texts = Seq(
      "low lower lowest low low",
      "new newer newest new newer",
      "aaa aaaa banana bandana") // overlap + repeated-letter stress
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }: _*)
    val got = CorpusOps.bpeTrain(d, nMerges = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = referenceBpe(texts, 8)
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("bpeTrain stops early when no pair remains") {
    val d = docs((1L, "s", "a b c")) // single-char words: no pairs at all
    assert(CorpusOps.bpeTrain(d, nMerges = 5).collect().isEmpty)
  }

  test("bpeTrain delta pair-count maintenance equals the full recount " +
      "(A/B on the real corpus, 25 merges)") {
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001").documents
    def table(deltaCounts: Boolean) =
      CorpusOps.bpeTrain(d, nMerges = 25, deltaCounts = deltaCounts)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val delta = table(deltaCounts = true)
    val full = table(deltaCounts = false)
    assert(delta.size == 25)
    assert(delta == full,
      "the delta update must maintain the EXACT pair counts the full " +
        "recount computes — any divergence is a retraction bug")
  }

  /** Reference single-node BPE ENCODE: apply merges in rank order,
    * greedy leftmost within each word — the application-side twin of
    * [[referenceBpe]].
    */
  private def referenceEncode(
      text: String, merges: Seq[(String, String)]): Vector[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector.flatMap { w =>
      var sym = w.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        sym.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) out(out.size - 1) = a + b
          else out += x
        }
        sym = out.toVector
      }
      sym
    }

  test("bpeEncode round-trips the trained merges, incl. greedy overlaps and batching") {
    val texts = Seq(
      "low lower lowest low low",
      "new newer newest new newer",
      "aaa aaaa banana bandana")
    val d = docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }: _*)
    val merges = CorpusOps.bpeTrain(d, nMerges = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = CorpusOps.bpeEncode(d, merges).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toVector, r.getLong(2)))
    val want = texts.zipWithIndex.map { case (t, i) =>
      val enc = referenceEncode(t, merges)
      (i.toLong, enc, enc.size.toLong)
    }
    assert(got.toSeq == want)
    // a 2-merge batch size exercises the multi-checkpoint path — same answer
    val batched = CorpusOps.bpeEncode(d, merges, mergeBatch = 2).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toVector, r.getLong(2)))
    assert(batched.toSeq == want)
  }

  test("incrementalCorpusBuild: index drops history dups, local min drops shard dups") {
    // 24-token texts that pass every gopher rule
    def text(tag: String) =
      s"the quick brown $tag fox jumps over the lazy dog and it is happy " +
        s"to be out in the warm sun with a friend"
    val day1 = docs((1L, "s", text("alpha")), (2L, "s", text("beta")))
    val idx = graft.ops.Dedup.exactDedupIndex(day1)
    val shard = docs(
      (10L, "s", text("gamma")),  // novel
      (11L, "s", text("alpha")),  // exact copy of doc 1 → index must drop
      (12L, "s", text("delta")),  // novel, duplicated in-shard below
      (13L, "s", text("delta")))  // intra-shard copy → local min rule drops
    val m = CorpusOps.incrementalCorpusBuild(shard, idx, seqLen = 50L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // survivors: 10 and 12 only (24 tokens each); doc 11 and 13 dropped
    assert(m.map(_._4).sum == 2L, s"expected 2 packed docs, got: ${m.toSeq}")
    assert(m.map(_._5).sum == 48L)
    val ids = m.flatMap(r => Seq(r._6, r._7)).toSet
    assert(ids.subsetOf(Set(10L, 12L)), s"dup survived: ${m.toSeq}")
    // and a re-delivered shard (same docs, later ids) packs NOTHING novel
    // once the shard's own fps join the index — the daily-loop invariant
    val idx2 = idx.unionByName(
      graft.ops.Dedup.exactDedupIndex(shard).join(idx.select("fp"), Seq("fp"), "left_anti"))
    val replay = docs((20L, "s", text("gamma")), (21L, "s", text("delta")))
    assert(CorpusOps.incrementalCorpusBuild(replay, idx2, seqLen = 50L).collect().isEmpty)
  }

  test("incrementalCorpusBuildNearDup: history-authoritative drops + shard clusters") {
    // distinct docs share only the 8-token stopword frame (jac ≈ 8/24
    // ≈ 0.33 ≪ 0.9); copies are exact (jac 1.0, bands identical — LSH
    // capture guaranteed)
    def text(tag: String) =
      s"the ${tag}one ${tag}two ${tag}three and ${tag}four ${tag}five of ${tag}six " +
        s"${tag}seven is ${tag}eight ${tag}nine to ${tag}ten ${tag}eleven in " +
        s"${tag}twelve a ${tag}thirteen ${tag}fourteen ${tag}fifteen ${tag}sixteen"
    // history doc 1; shard doc 0 is an exact near-dup with a SMALLER id —
    // history must still win (the batch least() rule would keep 0)
    val history = docs((1L, "s", text("alpha")), (2L, "s", text("beta")))
    val idx = graft.ops.Dedup.minhashIndexFrames(history)
    val shard = docs(
      (0L, "s", text("alpha")),   // dup of history 1 → dropped despite 0 < 1
      (10L, "s", text("gamma")),  // novel
      (11L, "s", text("gamma")),  // shard-internal cluster with 10 → dropped
      (12L, "s", text("delta")))  // novel singleton
    val m = CorpusOps.incrementalCorpusBuildNearDup(shard, idx, threshold = 0.9, seqLen = 50L)
      .collect().map(r => (r.getLong(3), r.getLong(5), r.getLong(6)))
    // survivors: 10 (cluster min) and 12; docs 0 and 11 dropped
    assert(m.map(_._1).sum == 2L, s"expected 2 packed docs, got: ${m.toSeq}")
    val ids = m.flatMap(r => Seq(r._2, r._3)).toSet
    assert(ids.subsetOf(Set(10L, 12L)), s"wrong survivors: ${m.toSeq}")
  }

  test("hashedTfIdfVectors: exact linear-idf weights, zero for ubiquitous terms") {
    // N=2: 'a' (df 1) weighs tf·(2−1); 'b' (df 2, in every doc) weighs 0
    val d = docs((1L, "s", "a a b"), (2L, "s", "b c"))
    val out = CorpusOps.hashedTfIdfVectors(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L).size == 64 && out(2L).size == 64)
    assert(out(1L).sum == 1.0)  // (2·1)/2 from 'a'; 'b' contributes 0
    assert(out(2L).sum == 0.5)  // (1·1)/2 from 'c'
    assert(out(1L).count(_ != 0.0) == 1 && out(2L).count(_ != 0.0) == 1)
  }

  test("hashedTfIdfVectors compose with graft_dot: near-copies score high") {
    val d = docs(
      (1L, "s", "solar panels convert sunlight into clean renewable energy today"),
      (2L, "s", "solar panels convert sunlight into clean renewable power today"),
      (3L, "s", "medieval cathedrals feature flying buttresses and stained glass"))
    val v = CorpusOps.hashedTfIdfVectors(d)
    import org.apache.spark.sql.functions.{col, call_function, sqrt}
    val pairs = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (call_function("graft_dot", col("a.vec"), col("b.vec")) /
          (sqrt(call_function("graft_dot", col("a.vec"), col("a.vec"))) *
            sqrt(call_function("graft_dot", col("b.vec"), col("b.vec"))))).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) > 0.7, s"near-copies should score high: $pairs")
    assert(pairs((1L, 3L)) < 0.3 && pairs((2L, 3L)) < 0.3, s"unrelated low: $pairs")
  }

  test("bpeEncode golden: overlapping merge is leftmost-greedy, word order kept") {
    val d = docs((7L, "s", "aaa ab aaaa"))
    val out = CorpusOps.bpeEncode(d, Seq(("a", "a"))).collect()
    assert(out.length == 1)
    assert(out(0).getSeq[String](1).toList ==
      List("aa", "a", "a", "b", "aa", "aa"))
    assert(out(0).getLong(2) == 6L)
  }

  test("goldenBpeFixture encodes to the hand-derived t85 oracle frame") {
    // pins the fixture to the VALUES twin in SparkEntry.oracleSql —
    // if tokenization, merge order, greedy-overlap handling, or
    // reassembly drifts, this fails before the driver gate does
    import org.apache.spark.sql.functions.{col, concat_ws}
    val got = CorpusOps.bpeEncode(
        CorpusOps.goldenBpeFixture(spark), CorpusOps.goldenBpeMerges)
      .select(col("doc_id"), col("n_tokens"),
        concat_ws(" ", col("tokens")).as("tokens_str"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 5L, "low low er low est"),
      (2L, 5L, "new new est new s"),
      (3L, 5L, "wid e wid est low"),
      (4L, 12L, "aa a a b a b b a n a n a")))
  }

  test("lmCounts: trigram and continuation counts (golden)") {
    val d = docs(
      (1L, "s", "a b c a b d"), // trigrams: abc, bca, cab, abd
      (2L, "s", "a b c"))
    val out = CorpusOps.lmCounts(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // (a,b): abc ×2, abd ×1 → 3 trigrams, 2 continuations
    assert(out.head == (("a", "b", 3L, 2L)))
    assert(out.contains(("b", "c", 1L, 1L))) // bca from doc 1
  }

  test("mixtureEpochs: rare sources repeat to parity, capped; integer rule (golden)") {
    import org.apache.spark.sql.functions.col
    // sources: 5 docs, 2 docs, 1 doc → epochs ceil(5/5)=1, ceil(5/2)=3, min(ceil(5/1),4)=4
    val d = (1L to 5L).map(i => (i, "big", s"text $i")) ++
      Seq((10L, "mid", "m one"), (11L, "mid", "m two"), (20L, "rare", "r one"))
    val out = CorpusOps.mixtureEpochs(d.toDF("doc_id", "source", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource == Map("big" -> 5, "mid" -> 6, "rare" -> 4), s"$bySource")
    assert(out.filter(_._1 == 20L).map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "the rare doc carries explicit epoch indices")
    assert(out.filter(_._2 == "big").forall(_._3 == 1L), "parity source runs once")
  }

  test("bm25Search: saturation caps repeated terms, shorter docs win ties, " +
      "non-matching docs absent") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, "s", "spark " + filler),                      // 1 hit, len 31
      (2L, "s", ("spark " * 10).trim + " " + filler),    // 10 hits, len 40
      (3L, "s", "spark"),                                // 1 hit, len 1
      (4L, "s", filler))                                 // no hits
    val out = CorpusOps.bm25Search(d, "spark", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L), "only matching docs rank")
    val score = out.map(t => t._2 -> t._3).toMap
    // length normalization: same single hit, the unpadded doc 3
    // outscores the padded doc 1
    assert(score(3L) > score(1L),
      s"shorter doc must outscore at equal tf: ${score(3L)} vs ${score(1L)}")
    // saturation: 10 repeats score highest but buy well under 10× —
    // the k1-cap (tf·(k1+1)/(tf+k1·…) → k1+1) holds them below
    // 2.5× the single padded hit (hand value: 1.878 vs 0.919)
    assert(out.head._2 == 2L, "more hits still rank first")
    assert(score(2L) < 2.5 * score(1L),
      s"tf saturation must cap repeats: ${score(1L)} vs ${score(2L)}")
  }

  test("topicClusters: docs join their topic's seed; zero-norm docs excluded") {
    // 'pad' appears in EVERY doc → weight 0 everywhere; doc 9 is only
    // pads → zero-norm vector, excluded from corpus and seed window
    val d = docs(
      (1L, "s", "alpha beta alpha gamma pad"),
      (2L, "s", "delta epsilon zeta delta pad"),
      (3L, "s", "alpha beta gamma gamma pad"),
      (4L, "s", "delta zeta epsilon pad"),
      (9L, "s", "pad pad pad"))
    val out = CorpusOps.topicClusters(d, nCells = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L)),
      s"topic docs must follow their seed, zero-norm excluded: $out")
  }

  test("sourceOverlap: mirrored content surfaces with exact jaccard; " +
      "normalization noise still counts as shared") {
    val d = docs(
      (1L, "a", "shared page one"), (2L, "a", "only in a"),
      (3L, "b", "SHARED page ONE!!"),   // normalizes equal to doc 1
      (4L, "b", "only in b"), (5L, "b", "also only b"),
      (6L, "c", "nothing in common"))
    val out = CorpusOps.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // a∩b = 1 shared fp; |a|=2, |b|=3 → jac = 1/4
    assert(out == Seq(("a", "b", 1L, 0.25)), out.toString)
  }

  test("corpusDiff: all four arms classified by normalized fingerprint") {
    val before = docs(
      (1L, "s", "stays the same"),
      (2L, "s", "will be edited"),
      (3L, "s", "will be removed"),
      (4L, "s", "Case And Punct!! noise only"))
    val after = docs(
      (1L, "s", "stays the same"),
      (2L, "s", "will be edited v2"),
      (4L, "s", "case and punct noise only"),  // normalizes equal → unchanged
      (9L, "s", "brand new page")).select("doc_id", "text")
    val out = CorpusOps.corpusDiff(before.select("doc_id", "text"), after)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "unchanged"), (9L, "added")), out.toString)
  }

  test("bm25 persisted index round-trips: reading the bucketed tables serves " +
      "the same rankings") {
    val d = docs((1L to 12L).map(i =>
      (i, "s", if (i % 2 == 0) "spark window agg" else "hash join merge")): _*)
    val qs = Seq((1L, "spark agg"), (2L, "join")).toDF("query_id", "qtext")
    val want = CorpusOps.bm25SearchBatch(d, qs).collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("bm25idx").toString
    CorpusOps.writeBm25Index(
      CorpusOps.bm25IndexFrames(d), new graft.sinks.LakeWriter(root), "bmx", buckets = 4)
    try {
      val got = CorpusOps.bm25SearchIndexed(
        qs, CorpusOps.readBm25Index(spark, "bmx")).collect().toSeq
      assert(got == want)
    } finally Seq("bmx_tf", "bmx_lens", "bmx_totals")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bm25 index: merged shard indexes serve identically to a one-shot " +
      "build, whatever the shard split") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs((1L to 20L).map(i =>
      (i, "s", (if (i % 3 == 0) "spark spark " else "hash join ") + filler)): _*)
    val qs = Seq((1L, "spark"), (2L, "hash join")).toDF("query_id", "qtext")
    val oneShot = CorpusOps.bm25SearchBatch(d, qs).collect().toSeq
    for (cut <- Seq(5L, 12L, 19L)) {
      val merged = CorpusOps.mergeBm25Index(
        CorpusOps.bm25IndexFrames(d.filter(s"doc_id < $cut")),
        CorpusOps.bm25IndexFrames(d.filter(s"doc_id >= $cut")))
      assert(CorpusOps.bm25SearchIndexed(qs, merged).collect().toSeq == oneShot,
        s"merge at $cut must serve the one-shot rankings")
    }
  }

  test("incrementalStratifiedSample: daily folds reproduce the one-shot " +
      "sample exactly, whatever the shard split") {
    val d = docs((1L to 40L).map(i =>
      (i, s"src${i % 3}", s"unique text body number $i")): _*)
    val oneShot = CorpusOps.stratifiedSample(d, quota = 4).collect().toSeq
    for (cut <- Seq(10L, 25L, 39L)) {
      val idx = CorpusOps.stratifiedSample(d.filter(s"doc_id < $cut"), quota = 4)
        .select("source", "doc_id", "h")
      val folded = CorpusOps.incrementalStratifiedSample(
        d.filter(s"doc_id >= $cut"), idx, quota = 4).collect().toSeq
      assert(folded == oneShot, s"fold at $cut must equal the one-shot sample")
    }
  }

  test("clusterBalancedSample: per-topic quotas; pre-filter is lossless " +
      "(differential vs the unfiltered rank)") {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    val d = docs((1L to 30L).map(i =>
      (i, "s", if (i % 2 == 0) s"alpha beta gamma doc$i"
               else s"delta epsilon zeta doc$i")): _*)
    val quota = 3
    val got = CorpusOps.clusterBalancedSample(d, quota = quota, nCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // differential: rank EVERYTHING per cid (no pre-filter), same rule
    val w = Window.partitionBy("cid").orderBy(col("h"), col("doc_id"))
    val want = CorpusOps.topicClusters(d, nCells = 2).select("doc_id", "cid")
      .join(d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("h")), "doc_id")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= quota)
      .orderBy("cid", "rnk")
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"))).toSeq
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.length == quota),
      "both 15-doc topics must fill their quota")
    assert(got.map(_._1).distinct.length == 2, "two topics sampled")
  }

  test("bm25SearchBatch: each query's block equals the single-query path " +
      "exactly; termless queries rank nothing") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, "s", "spark " + filler),
      (2L, "s", ("spark " * 10).trim + " " + filler),
      (3L, "s", "spark"),
      (4L, "s", "hash join " + filler),
      (5L, "s", filler))
    val qs = Seq((7L, "spark"), (8L, "hash join"), (9L, "absent"))
    val batch = CorpusOps.bm25SearchBatch(
        d, qs.toDF("query_id", "qtext"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    for ((qid, q) <- qs.take(2)) {
      val single = CorpusOps.bm25Search(d, q, k = 10).collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(batch.filter(_._1 == qid) == single,
        s"batch block for query $qid must equal the single-query path")
    }
    assert(!batch.exists(_._1 == 9L),
      "a query with no matching corpus terms ranks nothing")
    assert(batch.map(_._1).distinct == Seq(7L, 8L), "blocks arrive query-ordered")
  }

  test("lmCoverageScores: backoff levels 3/2/1/0 and ref-slice exclusion (golden)") {
    // doc_id % 10 < 3 → docs 1, 2 are the reference slice; their
    // trigram table is {abc, bcd, xyz}, bigram suffixes {bc, cd, yz},
    // unigrams {c, d, z}. Docs 5 and 7 are scored against it.
    val d = docs(
      (1L, "s", "a b c d"),      // ref: trigrams abc, bcd
      (2L, "s", "x y z"),        // ref: trigram xyz
      (5L, "s", "a b c q b c"),  // abc→3, bcq→0, cqb→0, qbc→2
      (7L, "s", "q q d"),        // qqd: (q,d)∉ref2, d∈ref1 → 1
      (8L, "s", "a b"))          // <3 tokens: no trigrams, excluded
    val out = CorpusOps.lmCoverageScores(d).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(out.keySet == Set(5L, 7L), s"ref slice and short docs excluded: $out")
    assert(out(5L) == ((4L, 1L, 1L, 0L, 2L, 0.25)), s"doc 5: $out")
    assert(out(7L) == ((1L, 0L, 0L, 1L, 0L, 0.0)), s"doc 7: $out")
  }

  test("importanceWeights: target-like docs outscore off-target docs, " +
      "and the weight arithmetic is a deterministic integer sum") {
    // target slice (doc_id % 10 < 3) speaks 'alpha beta gamma';
    // candidate 5 reuses the target vocabulary, candidate 7 is
    // disjoint — DSIR must rank 5 above 7
    val d = docs(
      (1L, "s", "alpha beta gamma alpha beta"),
      (2L, "s", "beta gamma alpha"),
      (5L, "s", "alpha beta gamma"),
      (7L, "s", "zeta eta theta"))
    val out = CorpusOps.importanceWeights(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(5L, 7L), s"target slice must not score itself: $out")
    assert(out(5L)._1 == 3L && out(7L)._1 == 3L)
    assert(out(5L)._3 > out(7L)._3,
      s"target-like doc must outscore the disjoint one: $out")
    // hand-check doc 7: each token hashes to its own bucket with
    // rc = 1, tc = 0 → wq = floor(1e6·(0+1)/(1+1)+0.5) = 500000 each
    // (collisions with target buckets could only raise tc; the three
    // greek words are distinct, so swq = 1,500,000 exactly unless an
    // md5 bucket collision occurs — assert the no-collision value)
    assert(out(7L)._2 == 1500000L, s"doc 7 integer sum: $out")
    assert(out(7L)._3 == 0.5, s"doc 7 per-token mean: $out")
  }

  test("importanceResample: deterministic accept set; a score >= 1 doc is " +
      "always kept, the accept rule matches the scores exactly") {
    import org.apache.spark.sql.functions.{col, conv, substring}
    val d = docs(
      (1L, "s", "alpha beta gamma alpha beta"),
      (2L, "s", "beta gamma alpha"),
      (5L, "s", "alpha beta gamma"),      // score > 1 → always accepted
      (7L, "s", "zeta eta theta"),        // score 0.5 → hash decides
      (8L, "s", "iota kappa lambda mu"))  // score 0.5 → hash decides
    val kept = CorpusOps.importanceResample(d).collect()
      .map(r => r.getLong(0)).toSet
    assert(kept.contains(5L), "a doc scoring above 1.0 must always be kept")
    // differential: the accept rule applied by hand to the score frame
    val u = d.select(col("doc_id"),
      conv(substring(TextOps.fingerprint(col("text")), 1, 4), 16, 10)
        .cast("long").as("u16"))
    val want = CorpusOps.importanceWeights(d).join(u, "doc_id")
      .filter(col("u16") * col("n_tok") * 1000000L < col("swq") * 65536L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == want)
    assert(CorpusOps.importanceResample(d).collect().map(_.getLong(0)).toSet == kept,
      "re-running must keep the identical set (no PRNG)")
  }

  test("corpusBuildNearDup collapses near-dup clusters exact dedup can't; " +
      "equals corpusBuild on a near-dup-free corpus") {
    import org.apache.spark.sql.functions._
    val base = "the data of a pipeline and a table is here with many more words to pass rules " +
      (1 to 15).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w7", "EDITED") // jaccard >> 0.6 vs base
    val distinctDoc = "the of a and is " + (100 to 130).map(i => s"z$i").mkString(" ")
    val d = Seq(
      (1L, "web", base),
      (2L, "web", edited),      // near-dup of 1: exact dedup keeps it, near-dup drops it
      (3L, "web", distinctDoc)
    ).toDF("doc_id", "source", "text")
    val near = CorpusOps.corpusBuildNearDup(d)
    val exact = CorpusOps.corpusBuild(d)
    // near-dup manifest packs docs 1 and 3 only; exact packs all three
    assert(near.agg(sum("n_docs")).head.getLong(0) == 2L)
    assert(exact.agg(sum("n_docs")).head.getLong(0) == 3L)
    // with no near-dups the two capstones agree exactly
    val clean = Seq((1L, "web", base), (3L, "web", distinctDoc)).toDF("doc_id", "source", "text")
    assert(CorpusOps.corpusBuildNearDup(clean).collect().toSeq ==
      CorpusOps.corpusBuild(clean).collect().toSeq)
  }

  test("corpusCard aggregates dup rate, quality keep rate and diversity (golden)") {
    import org.apache.spark.sql.Row
    val good = ("the data of a pipeline and a table is " * 3).trim // 27 toks, passes rules
    val d = Seq(
      (1L, "en", "web", good),
      (2L, "en", "web", good.toUpperCase), // exact dup of 1 after normalization
      (3L, "de", "book", "tiny doc"),      // fails ok_len
      (4L, "en", "web", good + " extended")
    ).toDF("doc_id", "lang", "source", "text")
    val out = CorpusOps.corpusCard(d).collect()
    // 27+27+2+28 tokens; dup doc 2; quality keeps docs 1, 2, 4
    assert(out.toSeq == Seq(Row(4L, 84L, 2L, 2L, 1L, 3L)))
  }

  test("invertedIndex: ordered doc:pos postings for rare phrase grams; common grams capped") {
    val d = docs(
      (1L, "s", "the shared phrase here and the shared phrase again"),
      (2L, "s", "the shared phrase appears too"),
      (3L, "s", "the shared phrase third time"),
      (4L, "s", "the shared phrase fourth time"),
      (5L, "s", "unique words only this doc"))
    val out = CorpusOps.invertedIndex(d, n = 3, maxDf = 3L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "the shared phrase" occurs in 4 docs → over the df cap
    assert(!out.contains("the shared phrase"))
    // doc-1-only gram, two occurrences at positions 2 and 5... check a
    // single-doc phrase with its 0-based gram positions
    assert(out("unique words only") == ((1L, 1L, "5:0")))
    assert(out("shared phrase here") == ((1L, 1L, "1:1")))
    // the doc-1 repeat "the shared phrase" is capped, but its continuation
    // differs per occurrence: "shared phrase again" is position 6
    assert(out("shared phrase again") == ((1L, 1L, "1:6")))
  }

  test("bpeMerges: top pair by (cnt desc, l, r), greedy leftmost apply " +
      "merges even run offsets only, stream lengths checksum the apply") {
    // "a a a a a" : pair (a,a) count 4; greedy merges offsets 0 and 2
    // -> "a_a a_a a" (3 tokens), the lone 5th 'a' survives
    val d = docs(
      (1L, "s", "a a a a a"),
      (2L, "s", "b c b c"))
    val m = CorpusOps.bpeMerges(d, nMerges = 1).collect()
    assert(m.length == 1)
    val r1 = m(0)
    assert((r1.getString(1), r1.getString(2), r1.getLong(3)) == (("a", "a", 4L)),
      s"top pair must be (a,a) x4 (b-c pairs count 2), got $r1")
    // doc1: 5 -> 3 tokens; doc2 unchanged: 4 -> total 7
    assert(r1.getLong(4) == 7L)
    // second round: doc2's (b,c) x2 wins over (a_a,a_a) x1 by count;
    // apply leaves doc2 as "b_c b_c" (2 tokens), doc1 3 -> total 5
    val m2 = CorpusOps.bpeMerges(d, nMerges = 2).collect()
    val r2 = m2(1)
    assert((r2.getString(1), r2.getString(2), r2.getLong(3)) == (("b", "c", 2L)))
    assert(r2.getLong(4) == 5L)
    // determinism: a repartitioned input learns the identical table
    val again = CorpusOps.bpeMerges(d.repartition(5), nMerges = 2).collect()
    assert(again.map(_.toString).toSeq == m2.map(_.toString).toSeq)
  }
}
