package graft.multimodal

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MediaOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bytesOf(s: String) = s.getBytes("UTF-8")

  private lazy val media = MediaOps.fromRows(spark, Seq(
    Row(1L, "image", bytesOf("img-one"), 64, 48, 0L, "png"),
    Row(2L, "image", bytesOf("img-two"), 1920, 1080, 0L, "jpeg"),
    Row(3L, "video", bytesOf("vid-one"), 1280, 720, 2500L, "h264"),
    Row(4L, "audio", bytesOf("aud-one"), 0, 0, 60000L, "opus")))

  test("featurize emits one L1-normalized fixed-width vector per row, deterministically") {
    val feats = MediaOps.featurize(media, bins = 16, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.keySet == Set(1L, 2L, 3L, 4L))
    feats.values.foreach { v =>
      assert(v.length == 16)
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-3) // histogram sums to 1
    }
    // decode is deterministic: same bytes → same features
    val again = MediaOps.featurize(media, bins = 16, batchSize = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == feats)
  }

  test("resizePlan preserves aspect and never upscales") {
    val out = MediaOps.resizePlan(media.filter("kind = 'image'"), maxDim = 256)
      .select("media_id", "target_width", "target_height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L) == (64, 48))    // small image untouched
    assert(out(2L) == (256, 144))  // 1920x1080 → fit 256, aspect kept
  }

  test("frameSample explodes video rows only, at the sampling cadence") {
    val frames = MediaOps.frameSample(media, everyMs = 1000L).collect()
    assert(frames.forall(_.getLong(0) == 3L))
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 1000L, 2000L))
  }

  test("audioChunkPlan: audio rows only, overlapping windows, clamped partial tail") {
    val withShort = MediaOps.fromRows(spark, Seq(
      Row(4L, "audio", bytesOf("aud-one"), 0, 0, 60000L, "opus"),
      Row(5L, "audio", bytesOf("aud-two"), 0, 0, 12000L, "flac"),
      Row(6L, "video", bytesOf("vid-one"), 1280, 720, 2500L, "h264")))
    val out = MediaOps.audioChunkPlan(withShort).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(c => c._1 == 4L || c._1 == 5L), "video rows must not chunk")
    val long = out.filter(_._1 == 4L).map(c => (c._2, c._3)).toSeq
    assert(long.length == 12 && long.head == ((0L, 10000L)) &&
      long.last == ((55000L, 60000L)), s"60s audio at 10s/5s: $long")
    val short = out.filter(_._1 == 5L).map(c => (c._2, c._3)).toSeq
    assert(short == Seq((0L, 10000L), (5000L, 12000L), (10000L, 12000L)),
      s"partial tails clamp to the duration: $short")
  }

  /** In-memory PNG: left half black, right half white, `w`×`h`. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes a real PNG to the expected grayscale plane") {
    val plane = MediaOps.ImageIoDecoder.decode(pngBytes(8, 4), 8, 4)
    assert(plane.length == 32)
    // row-major: first 4 pixels of each row black (0), last 4 white (1)
    for (y <- 0 until 4; x <- 0 until 8) {
      val v = plane(y * 8 + x)
      if (x < 4) assert(v == 0f, s"($x,$y)=$v") else assert(v == 1f, s"($x,$y)=$v")
    }
  }

  test("featurize over real PNGs produces the deterministic histogram") {
    val rows = MediaOps.fromRows(spark, Seq(
      Row(10L, "image", pngBytes(8, 4), 8, 4, 0L, "png"),
      Row(11L, "image", pngBytes(16, 16), 16, 16, 0L, "png")))
    val feats = MediaOps.featurize(rows, decoder = MediaOps.ImageIoDecoder, bins = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // half the pixels land in bin 0 (black), half in the top bin (white)
    feats.values.foreach { v =>
      assert(v.toSeq == Seq(0.5f, 0f, 0f, 0.5f), v.toSeq.toString)
    }
  }

  test("ImageIoDecoder fails loudly when metadata contradicts intrinsic dims") {
    val e = intercept[IllegalArgumentException] {
      MediaOps.ImageIoDecoder.decode(pngBytes(8, 4), 16, 16) // drifted metadata
    }
    assert(e.getMessage.contains("8x4") && e.getMessage.contains("16x16"))
    // unknown metadata (≤0) skips the check — intrinsic dims win
    assert(MediaOps.ImageIoDecoder.decode(pngBytes(8, 4), 0, 0).length == 32)
  }

  test("ImageIoDecoder rejects undecodable payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      MediaOps.ImageIoDecoder.decode(bytesOf("not-an-image"), 4, 4)
    }
    assert(e.getMessage.contains("undecodable"))
  }

  /** Pattern PNG: pixel (x, y) bright iff pattern(x, y). */
  private def patternPng(w: Int, h: Int)(pattern: (Int, Int) => Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (pattern(x, y)) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash: re-encode-scale-invariant, edits flip proportional bits") {
    // patterns in RELATIVE coordinates so the rescale keeps the shape
    def vsplit(w: Int)(x: Int, y: Int) = x >= w / 2  // left dark, right bright
    def hsplit(h: Int)(x: Int, y: Int) = y >= h / 2  // top dark, bottom bright
    val base = MediaOps.ImageIoDecoder.decode(patternPng(64, 64)(vsplit(64)), 64, 64)
    val hBase = MediaOps.aHash(base, 64, 64)
    // the SAME pattern at a different resolution hashes identically —
    // the block-average grid is what makes the hash perceptual
    val resized = MediaOps.ImageIoDecoder.decode(patternPng(128, 128)(vsplit(128)), 128, 128)
    assert(MediaOps.aHash(resized, 128, 128) == hBase)
    // one 8x8-grid cell flipped → exactly that cell's bit differs
    val oneCell = MediaOps.ImageIoDecoder.decode(
      patternPng(64, 64)((x, y) => vsplit(64)(x, y) ^ (x < 8 && y < 8)), 64, 64)
    val d1 = java.lang.Long.bitCount(MediaOps.aHash(oneCell, 64, 64) ^ hBase)
    assert(d1 >= 1 && d1 <= 3, s"a one-cell edit must flip ~1 bit, got $d1")
    // an orthogonal pattern is far in hamming space
    val far = MediaOps.ImageIoDecoder.decode(patternPng(64, 64)(hsplit(64)), 64, 64)
    assert(java.lang.Long.bitCount(MediaOps.aHash(far, 64, 64) ^ hBase) > 16)
  }

  test("imageNearDupPairs finds edited/rescaled copies, not unrelated images") {
    def vsplit(w: Int)(x: Int, y: Int) = x >= w / 2
    val rows = MediaOps.fromRows(spark, Seq(
      Row(1L, "image", patternPng(64, 64)(vsplit(64)), 64, 64, 0L, "png"),
      Row(2L, "image", patternPng(128, 128)(vsplit(128)), 128, 128, 0L, "png"), // rescale of 1
      Row(3L, "image", patternPng(64, 64)((x, y) => vsplit(64)(x, y) ^ (x < 8 && y < 8)),
        64, 64, 0L, "png"),                                                     // light edit of 1
      Row(4L, "image", patternPng(64, 64)((x, y) => y >= 32), 64, 64, 0L, "png"), // unrelated
      Row(5L, "video", patternPng(8, 8)(vsplit(8)), 8, 8, 900L, "h264")))       // not an image row
    val pairs = MediaOps.imageNearDupPairs(rows, MediaOps.ImageIoDecoder, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "rescaled copy must pair with its original")
    assert(pairs.contains((1L, 3L)), "lightly-edited copy must pair with its original")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image must not pair: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "non-image rows never hash")
  }

  test("goldenImageFixture hashes and pairs are the hand-derived constants " +
    "the t93 oracle asserts") {
    val fixture = MediaOps.goldenImageFixture(spark)
    val hashes = MediaOps.imageHashes(fixture, MediaOps.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == 0x0F0F0F0F0F0F0F0FL, f"vsplit hash ${hashes(1L)}%016x")
    assert(hashes(2L) == hashes(1L), "rescale must hash identically")
    assert(hashes(3L) == (0x0F0F0F0F0F0F0F0FL | (1L << 63)),
      f"one-cell edit must add exactly bit 63: ${hashes(3L)}%016x")
    assert(hashes(4L) == 0x00000000FFFFFFFFL, f"hsplit hash ${hashes(4L)}%016x")
    assert(!hashes.contains(5L), "video rows never hash")
    val pairs = MediaOps.imageNearDupPairs(fixture, MediaOps.ImageIoDecoder, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(pairs == List((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("WavDecoder round-trips PCM exactly and validates duration metadata") {
    val samples = Array.tabulate(800)(i => if (i < 400) 0.toShort else 16384.toShort)
    val (rate, out) = MediaOps.WavDecoder.decode(MediaOps.wav(8000, samples), 100L)
    assert(rate == 8000)
    assert(out.length == 800)
    assert(out(0) == 0f && out(799) == 0.5f, "16384/32768 must decode to exactly 0.5")
    val e = intercept[IllegalArgumentException] {
      MediaOps.WavDecoder.decode(MediaOps.wav(8000, samples), 250L)
    }
    assert(e.getMessage.contains("drifted metadata"))
  }

  test("audioHash: golden bins, resample-invariance, single-bit edits (hand values)") {
    def env(n: Int, firstBinLoud: Boolean): Array[Float] =
      Array.tabulate(n)(i =>
        if (i >= n / 2 || (firstBinLoud && i < n / 64)) 0.5f else 0f)
    val h8k = MediaOps.audioHash(env(16000, firstBinLoud = false), 0, 16000)
    assert(h8k == 0x00000000FFFFFFFFL, f"half-split envelope: $h8k%016x")
    val h16k = MediaOps.audioHash(env(32000, firstBinLoud = false), 0, 32000)
    assert(h16k == h8k, "resampled identical envelope must hash identically")
    val hEdit = MediaOps.audioHash(env(16000, firstBinLoud = true), 0, 16000)
    assert(hEdit == (h8k | (1L << 63)),
      f"one-bin edit must add exactly bit 63: $hEdit%016x")
    assert(java.lang.Long.bitCount(
      MediaOps.audioHash(env(16000, firstBinLoud = false).reverse, 0, 16000) ^ h8k) == 64,
      "reversed envelope is the full 64 bits away")
  }

  test("goldenAudioFixture pairs are the hand-derived constants the t106 oracle " +
      "asserts; file-level report composes") {
    val fixture = MediaOps.goldenAudioFixture(spark)
    val pairs = MediaOps.audioNearDupPairs(
        fixture, MediaOps.WavDecoder, windowMs = 2000L, strideMs = 2000L, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(pairs == List((21L, 22L, 0L, 0L), (21L, 23L, 0L, 1L), (22L, 23L, 0L, 1L)))
    val report = MediaOps.audioNearDup(
        fixture, MediaOps.WavDecoder, windowMs = 2000L, strideMs = 2000L,
        maxHamming = 5, minMatchFrac = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))).toList
    assert(report == List((21L, 22L, 1L, 1.0), (21L, 23L, 1L, 1.0), (22L, 23L, 1L, 1.0)))
  }

  test("audioFingerprints windows agree with audioChunkPlan boundaries (stub decoder)") {
    val fp = MediaOps.audioFingerprints(media, windowMs = 25000L, strideMs = 15000L)
      .select("media_id", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plan = MediaOps.audioChunkPlan(media, windowMs = 25000L, strideMs = 15000L)
      .select("media_id", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fp == plan, "fingerprint windows must be the plan's windows exactly")
    assert(fp.nonEmpty && fp.forall(_._1 == 4L), "audio rows only")
  }

  test("incrementalImageNearDup == full recompute restricted to the new shard, " +
    "and matches the hand-derived t105 frame") {
    val old = MediaOps.goldenImageFixture(spark)
    val fresh = MediaOps.goldenImageProbeFixture(spark)
    val inc = MediaOps.incrementalImageNearDup(
        fresh, MediaOps.imageHashIndexFrame(old, MediaOps.ImageIoDecoder),
        MediaOps.ImageIoDecoder, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(inc == List(
      (1L, 11L, 0L), (1L, 14L, 0L), (2L, 11L, 0L), (2L, 14L, 0L),
      (3L, 11L, 1L), (3L, 14L, 1L), (4L, 12L, 0L), (11L, 14L, 0L)))
    // the incremental contract: exactly the full recompute over
    // old ∪ new, restricted to pairs with ≥1 new side (ids ≥ 11)
    val full = MediaOps.imageNearDupPairs(
        old.unionByName(fresh), MediaOps.ImageIoDecoder, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(p => p._1 >= 11L || p._2 >= 11L).toList
    assert(inc == full)
  }

  test("persisted image-hash index: probe scans history bucket-locally, zero exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = java.nio.file.Files.createTempDirectory("imgidx").toString
    MediaOps.writeImageHashIndex(
      MediaOps.imageHashIndexFrame(
        MediaOps.goldenImageFixture(spark), MediaOps.ImageIoDecoder),
      new graft.sinks.LakeWriter(root), "imgidx", buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = MediaOps.readImageHashIndex(spark, "imgidx")
      // plan-assert the candidate stage in isolation (the t63 spec
      // shape): downstream distinct/orderBy exchanges of the small
      // RESULT are fine; the indexed side itself must not shuffle
      // between its scan and the join
      val newChunks = MediaOps.chunkHashes(
        MediaOps.imageHashes(
          MediaOps.goldenImageProbeFixture(spark), MediaOps.ImageIoDecoder), 5)
      val cand = MediaOps.incrementalImageCandidates(newChunks, idx)
      val plan = cand.queryExecution.executedPlan
      val scans = plan.collect {
        case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == "imgidx_chunks") => f
      }
      assert(scans.size == 1,
        s"indexed hashes must feed exactly one join (no old-by-old recompute):\n$plan")
      val shuffled = plan.collect {
        case e: ShuffleExchangeExec if e.collect {
          case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == "imgidx_chunks") => f
        }.nonEmpty => e
      }
      assert(shuffled.isEmpty,
        s"indexed hashes must join bucket-locally, not shuffle:\n$plan")
      // values survive the bucketed path unchanged
      val probe = MediaOps.incrementalImageNearDup(
        MediaOps.goldenImageProbeFixture(spark), idx,
        MediaOps.ImageIoDecoder, maxHamming = 5)
      assert(probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
        == List((1L, 11L, 0L), (1L, 14L, 0L), (2L, 11L, 0L), (2L, 14L, 0L),
          (3L, 11L, 1L), (3L, 14L, 1L), (4L, 12L, 0L), (11L, 14L, 0L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.sql("DROP TABLE IF EXISTS imgidx_chunks")
    }
  }

  test("incrementalAudioNearDup == full recompute restricted to the new shard, " +
    "and matches the hand-derived t108 frame") {
    val old = MediaOps.goldenAudioFixture(spark)
    val fresh = MediaOps.goldenAudioProbeFixture(spark)
    val expected = List(
      (21L, 31L, 0L, 0L), (21L, 34L, 0L, 0L), (22L, 31L, 0L, 0L),
      (22L, 34L, 0L, 0L), (23L, 31L, 0L, 1L), (23L, 34L, 0L, 1L),
      (24L, 32L, 0L, 0L), (31L, 34L, 0L, 0L))
    val inc = MediaOps.incrementalAudioNearDup(
        fresh,
        MediaOps.audioHashIndexFrame(old, MediaOps.WavDecoder,
          windowMs = 2000L, strideMs = 2000L),
        MediaOps.WavDecoder, windowMs = 2000L, strideMs = 2000L, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(inc == expected)
    // the incremental contract: exactly the full recompute over
    // old ∪ new, restricted to pairs with ≥1 new side (ids ≥ 31)
    val full = MediaOps.audioNearDupPairs(
        old.unionByName(fresh), MediaOps.WavDecoder,
        windowMs = 2000L, strideMs = 2000L, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(p => p._1 >= 31L || p._2 >= 31L).toList
    assert(inc == full)
  }

  test("incrementalAudioNearDup fails loudly when a new media_id is already indexed") {
    val old = MediaOps.goldenAudioFixture(spark)
    val index = MediaOps.audioHashIndexFrame(old, MediaOps.WavDecoder,
      windowMs = 2000L, strideMs = 2000L)
    val e = intercept[IllegalArgumentException] {
      MediaOps.incrementalAudioNearDup(old.limit(1), index,
        MediaOps.WavDecoder, windowMs = 2000L, strideMs = 2000L)
    }
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  test("decoder guards: stub rejects overflow durations, WavDecoder rejects " +
      "a truncated PCM payload instead of dropping the tail") {
    val e1 = intercept[IllegalArgumentException] {
      MediaOps.StubAudioDecoder.decode(Array[Byte](1, 2, 3), Int.MaxValue.toLong + 1L)
    }
    assert(e1.getMessage.contains("Int.MaxValue"), e1.getMessage)
    // a valid WAV with its last byte chopped off: no longer a whole
    // number of 16-bit frames
    val wav = MediaOps.wav(8000, Array.fill[Short](100)(1234))
    val e2 = intercept[IllegalArgumentException] {
      MediaOps.WavDecoder.decode(wav.dropRight(1), durationMs = 0L)
    }
    assert(e2.getMessage.contains("corrupt"), e2.getMessage)
  }

  test("persisted audio-hash index: probe scans history bucket-locally, zero exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root = java.nio.file.Files.createTempDirectory("audidx").toString
    MediaOps.writeAudioHashIndex(
      MediaOps.audioHashIndexFrame(
        MediaOps.goldenAudioFixture(spark), MediaOps.WavDecoder,
        windowMs = 2000L, strideMs = 2000L),
      new graft.sinks.LakeWriter(root), "audidx", buckets = 4)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = MediaOps.readAudioHashIndex(spark, "audidx")
      val newChunks = MediaOps.pigeonholeChunks(
        MediaOps.audioFingerprints(
          MediaOps.goldenAudioProbeFixture(spark), MediaOps.WavDecoder,
          windowMs = 2000L, strideMs = 2000L), "fhash", 5)
      val cand = MediaOps.incrementalAudioCandidates(newChunks, idx)
      val plan = cand.queryExecution.executedPlan
      val scans = plan.collect {
        case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == "audidx_achunks") => f
      }
      assert(scans.size == 1,
        s"indexed hashes must feed exactly one join (no old-by-old recompute):\n$plan")
      val shuffled = plan.collect {
        case e: ShuffleExchangeExec if e.collect {
          case f: FileSourceScanExec if f.tableIdentifier.exists(_.table == "audidx_achunks") => f
        }.nonEmpty => e
      }
      assert(shuffled.isEmpty,
        s"indexed hashes must join bucket-locally, not shuffle:\n$plan")
      // values survive the bucketed path unchanged
      val probe = MediaOps.incrementalAudioNearDup(
        MediaOps.goldenAudioProbeFixture(spark), idx,
        MediaOps.WavDecoder, windowMs = 2000L, strideMs = 2000L, maxHamming = 5)
      assert(probe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
        == List(
          (21L, 31L, 0L, 0L), (21L, 34L, 0L, 0L), (22L, 31L, 0L, 0L),
          (22L, 34L, 0L, 0L), (23L, 31L, 0L, 1L), (23L, 34L, 0L, 1L),
          (24L, 32L, 0L, 0L), (31L, 34L, 0L, 0L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.sql("DROP TABLE IF EXISTS audidx_achunks")
    }
  }

  test("metadata-only queries prune the payload column at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    media.write.partitionBy("kind").parquet(dir)
    val q = spark.read.parquet(dir).filter("kind = 'image'").select("media_id", "width")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("bytes"),
      s"payload column must not be read:\n$scan")
    assert(q.count() == 2)
  }
}
