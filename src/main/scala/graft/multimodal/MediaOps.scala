package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY + typed
  * metadata, with decode/feature-extract/resize/frame-sample
  * pipelines.
  *
  * The Spark-side plumbing is real — schema, partitioning, batched
  * per-partition execution (the JVM analog of an Arrow-batched UDF:
  * rows are processed in `batchSize` chunks so a decoder can amortize
  * native-library setup per batch, and memory stays bounded by batch,
  * not partition). The DECODE step itself is a pluggable strategy;
  * this container ships only [[StubDecoder]], a clearly-marked
  * deterministic fake (no image/audio libraries here). Production
  * plugs a real decoder behind the same 'bytes in, planes out'
  * signature without touching any plan.
  */
object MediaOps {

  /** Canonical media-lake schema: payload stays opaque; everything
    * queryable lives in typed columns. Partition discipline at 100 TB:
    * store with `partitionBy(kind)` and size row groups so `bytes`
    * doesn't blow the reader — metadata-only queries never touch the
    * payload column thanks to parquet column pruning.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType), // 0 for stills
    StructField("codec", StringType)))

  /** bytes → grayscale plane (row-major floats in [0,1]).
    * Implementations MUST be deterministic for a given byte string.
    */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float]
  }

  /** STUB: deterministic fake decode — hashes the payload into a
    * repeatable pseudo-plane. Keeps every downstream shape honest
    * (sizes, batching, feature math) without native codecs.
    */
  object StubDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
      val seed = java.util.Arrays.hashCode(bytes).toLong & 0xffffffffL
      val rng = new scala.util.Random(seed)
      Array.fill(math.max(width * height, 1))(rng.nextFloat())
    }
  }

  /** REAL image decode via the JDK's built-in ImageIO readers
    * (PNG/BMP/GIF/JPEG — zero extra dependencies): pixels → grayscale
    * plane in [0,1] with Rec.601 luma weights, row-major. The
    * intrinsic image dimensions are authoritative, and positive
    * metadata width/height that CONTRADICT them fail loudly — a
    * caller sizing buffers from drifted metadata would otherwise get
    * a plane of unexpected length (pass ≤0 to skip the check when
    * metadata is unknown). Deterministic — same bytes, same plane —
    * for PNG/BMP/GIF; JPEG and ICC-profiled images may decode with
    * vendor-specific color management, so byte-exact reproducibility
    * across JDK vendors is only claimed for the lossless formats.
    * Undecodable payloads fail loudly; quarantine upstream if the
    * corpus can carry garbage.
    */
  object ImageIoDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable image payload (${bytes.length} bytes)")
      val w = img.getWidth
      val h = img.getHeight
      if ((width > 0 && width != w) || (height > 0 && height != h))
        throw new IllegalArgumentException(
          s"image payload is ${w}x$h but row metadata claims ${width}x$height — " +
            "drifted metadata; fix ingestion or quarantine the row")
      val out = new Array[Float](w * h)
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
          x += 1
          i += 1
        }
        y += 1
      }
      out
    }
  }

  /** Decode + feature-extract in batches: per-partition iterator →
    * `batchSize` chunks → decoder → fixed-width feature vector
    * (`bins`-bucket intensity histogram, L1-normalized). Output is an
    * embedding column ready for the [[graft.ops.Similarity]] family.
    */
  def featurize(
      media: DataFrame,
      decoder: ImageDecoder = StubDecoder,
      bins: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = Encoders.row(outSchema)
    media.select("media_id", "bytes", "width", "height")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val plane = decoder.decode(
              r.getAs[Array[Byte]]("bytes"), r.getAs[Int]("width"), r.getAs[Int]("height"))
            val hist = new Array[Float](bins)
            plane.foreach { v =>
              val b = math.min((v * bins).toInt, bins - 1)
              hist(b) += 1f
            }
            val n = plane.length.toFloat
            Row(r.getAs[Long]("media_id"), hist.map(_ / n).toSeq)
          }
        }
      }(enc)
  }

  /** Aspect-preserving resize TARGETS as pure column math (the
    * metadata half of a resize; the pixel half belongs to a decoder
    * pipeline). No data movement, fully codegen'd.
    */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / col("width"),
      lit(maxDim.toDouble) / col("height"), lit(1.0))
    media.withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: one output row per sampled
    * timestamp — explode over a sequence, pure Column math, no decode.
    * The decoder pipeline then fetches only sampled frames.
    */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("width"), col("height"), col("codec"))

  /** Chunking plan for audio rows: fixed-length overlapping windows
    * over the metadata-plane duration — the segmentation an ASR /
    * audio-embedding pipeline feeds its decoder, emitted WITHOUT
    * touching payload bytes (the decoder then fetches only the
    * windows it needs, exactly like [[frameSample]] for video; the
    * decode itself stays behind the [[Decoder]] seam). The tail
    * window is partial (end clamped to the duration) — the
    * chunkTexts convention. Pure integer sequence math: one narrow
    * explode, no shuffle, gate-exact.
    */
  def audioChunkPlan(media: DataFrame, windowMs: Long = 10000L,
      strideMs: Long = 5000L): DataFrame =
    media.filter(col("kind") === "audio" && col("duration_ms") > 0)
      .withColumn("start_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(strideMs))))
      .select(col("media_id"), col("start_ms"),
        least(col("start_ms") + windowMs, col("duration_ms")).as("end_ms"),
        col("codec"))

  /** bytes → (sampleRateHz, mono PCM samples in [-1,1]). The audio
    * half of the decoder seam ([[ImageDecoder]]'s contract): real
    * decoders validate a positive `durationMs` metadata claim against
    * the decoded length and FAIL LOUDLY on drift; implementations
    * MUST be deterministic for a given byte string.
    */
  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte], durationMs: Long): (Int, Array[Float])
  }

  /** STUB: deterministic fake PCM — 1 kHz rate (one sample per
    * metadata millisecond), pseudo-samples from the payload hash.
    * Keeps window math, batching and the hash shape honest without
    * audio codecs in the container.
    */
  object StubAudioDecoder extends AudioDecoder {
    override def decode(bytes: Array[Byte], durationMs: Long): (Int, Array[Float]) = {
      require(durationMs <= Int.MaxValue,
        s"stub decode of ${durationMs}ms exceeds one sample-array (Int.MaxValue samples at 1 kHz)")
      val seed = java.util.Arrays.hashCode(bytes).toLong & 0xffffffffL
      val rng = new scala.util.Random(seed)
      (1000, Array.fill(math.max(durationMs, 1L).toInt)(rng.nextFloat() * 2f - 1f))
    }
  }

  /** REAL audio decode via the JDK's built-in sampled-sound readers
    * (WAV/AIFF PCM — zero extra dependencies): 16-bit signed frames →
    * mono floats in [-1,1] (channels averaged). Deterministic — the
    * PCM bytes map to floats by exact integer division by 32768. A
    * positive `durationMs` that contradicts the decoded
    * `floor(frames·1000/rate)` fails loudly (drifted metadata would
    * silently shift every window boundary downstream).
    */
  object WavDecoder extends AudioDecoder {
    override def decode(bytes: Array[Byte], durationMs: Long): (Int, Array[Float]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16)
        throw new IllegalArgumentException(
          s"unsupported audio format $fmt — 16-bit signed PCM only")
      val frames = ais.readAllBytes()
      val ch = fmt.getChannels
      val big = fmt.isBigEndian
      require(frames.length % (2 * ch) == 0,
        s"corrupt PCM payload: ${frames.length} bytes is not a whole number of " +
          s"$ch-channel 16-bit frames — truncated upload, fail loudly rather than drop the tail")
      val n = frames.length / (2 * ch)
      // AudioInputStream frame-aligns reads, so a chopped-off byte
      // surfaces as FEWER complete frames than the header claims, not
      // as a misaligned buffer — check the claim too.
      require(ais.getFrameLength < 0 || n.toLong == ais.getFrameLength,
        s"corrupt PCM payload: header claims ${ais.getFrameLength} frames but " +
          s"$n decoded — truncated upload, fail loudly rather than drop the tail")
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        var acc = 0f
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2
          val lo = frames(off + (if (big) 1 else 0)) & 0xff
          val hi = frames(off + (if (big) 0 else 1)).toInt
          acc += ((hi << 8) | lo).toShort / 32768f
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      val rate = math.round(fmt.getSampleRate)
      val decodedMs = n.toLong * 1000L / rate
      if (durationMs > 0 && decodedMs != durationMs)
        throw new IllegalArgumentException(
          s"audio payload is ${decodedMs}ms at ${rate}Hz but row metadata " +
            s"claims ${durationMs}ms — drifted metadata; fix ingestion or " +
            "quarantine the row")
      (rate, out)
    }
  }

  /** 64-bit envelope hash of a PCM slice — the audio analogue of
    * [[aHash]]: the slice splits into 64 equal time bins (bin index
    * `i·64/n`, the aHash grid walk), each bin's mean ABSOLUTE
    * amplitude is thresholded at the mean of the 64 bin means, bits
    * pack MSB-first (bit 63 = bin 0). Loudness-envelope shape is what
    * survives re-encoding and resampling — a re-encode at a different
    * sample rate lands on the IDENTICAL hash when bin boundaries
    * align, and hamming distance measures envelope change.
    */
  def audioHash(samples: Array[Float], from: Int, until: Int): Long = {
    val n = until - from
    require(n > 0, s"empty audio hash window [$from, $until)")
    val sums = new Array[Float](64)
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val b = (i.toLong * 64 / n).toInt
      sums(b) += math.abs(samples(from + i))
      counts(b) += 1
      i += 1
    }
    val cells = new Array[Float](64)
    var total = 0f
    i = 0
    while (i < 64) {
      cells(i) = if (counts(i) > 0) sums(i) / counts(i) else 0f
      total += cells(i)
      i += 1
    }
    val mean = total / 64f
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** Per-window audio fingerprints: decode in batches (the
    * [[featurize]] shape), cut each file on the [[audioChunkPlan]]
    * window grid (same stride/clamp rules, so plan and fingerprints
    * can never disagree on boundaries), hash each window's envelope —
    * (media_id, start_ms, end_ms, fhash). The 8-byte hash is the only
    * thing that leaves the scan; PCM never shuffles.
    */
  def audioFingerprints(
      media: DataFrame,
      decoder: AudioDecoder = StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      batchSize: Int = 64): DataFrame = {
    require(windowMs > 0 && strideMs > 0, "windowMs and strideMs must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("start_ms", LongType, nullable = false),
      StructField("end_ms", LongType, nullable = false),
      StructField("fhash", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.filter(col("kind") === "audio" && col("duration_ms") > 0)
      .select("media_id", "bytes", "duration_ms")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val id = r.getAs[Long]("media_id")
            val durMs = r.getAs[Long]("duration_ms")
            val (rate, samples) = decoder.decode(r.getAs[Array[Byte]]("bytes"), durMs)
            (0L until durMs by strideMs).map { start =>
              val end = math.min(start + windowMs, durMs)
              val s0 = (start * rate / 1000L).toInt
              val s1 = math.min(end * rate / 1000L, samples.length.toLong).toInt
              Row(id, start, end, audioHash(samples, s0, s1))
            }
          }
        }
      }(enc)
  }

  /** Audio NEAR-dup window pairs — the audio member of the dedup
    * family: re-encoded or resampled copies land within `maxHamming`
    * envelope-hash bits of each other, window by window. Candidates
    * come from the SAME pigeonhole rule as images ([[chunkHashes]]'
    * underlying split), equi-joined per (start_ms, chunk, ckey) so
    * only aligned windows ever pair and only 8-byte hashes shuffle;
    * exact hamming verifies. Emits (media_a, media_b, start_ms,
    * hamming) per matched window — [[audioNearDup]] aggregates to
    * file-level matches.
    */
  def audioNearDupPairs(
      media: DataFrame,
      decoder: AudioDecoder = StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      maxHamming: Int = 5): DataFrame = {
    val chunked = pigeonholeChunks(
      audioFingerprints(media, decoder, windowMs, strideMs), "fhash", maxHamming)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.start_ms") === col("b.start_ms") &&
          col("a.media_id") < col("b.media_id"))
      .select(
        col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.start_ms").as("start_ms"),
        bit_count(col("a.fhash").bitwiseXOR(col("b.fhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b", "start_ms")
  }

  /** File-level audio near-dup report: window pairs aggregated per
    * (media_a, media_b) with the matched-window count and the match
    * fraction against the LONGER file's window count (conservative —
    * a clip matching a subset of a longer recording scores by the
    * longer timeline). `minMatchFrac` keeps only pairs whose
    * envelopes agree on most of the timeline.
    */
  def audioNearDup(
      media: DataFrame,
      decoder: AudioDecoder = StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      maxHamming: Int = 5, minMatchFrac: Double = 0.8): DataFrame = {
    val fp = audioFingerprints(media, decoder, windowMs, strideMs)
    val nWin = fp.groupBy("media_id").agg(count(lit(1)).as("n_windows"))
    audioNearDupPairs(media, decoder, windowMs, strideMs, maxHamming)
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("n_matched"), max("hamming").as("max_hamming"))
      .join(nWin.withColumnRenamed("media_id", "media_a")
        .withColumnRenamed("n_windows", "wa"), Seq("media_a"))
      .join(nWin.withColumnRenamed("media_id", "media_b")
        .withColumnRenamed("n_windows", "wb"), Seq("media_b"))
      .withColumn("match_frac", graft.ops.Exact.quant6(
        col("n_matched").cast("double") / greatest(col("wa"), col("wb"))))
      .filter(col("match_frac") >= minMatchFrac)
      .select("media_a", "media_b", "n_matched", "max_hamming", "match_frac")
      .orderBy("media_a", "media_b")
  }

  /** Persisted audio-hash index frame: (media_id, start_ms, end_ms,
    * fhash, chunk, ckey) — one row per window per pigeonhole chunk,
    * so tomorrow's crawl shard never re-decodes (or re-shuffles)
    * history PCM. The [[imageHashIndexFrame]] contract for the audio
    * member: append-only, a new shard's frame appended AFTER its
    * pairs are taken, and the probe must pass the SAME windowMs /
    * strideMs / maxHamming the index was built with (different
    * values change window grids or chunk widths and silently drop
    * true candidates).
    */
  def audioHashIndexFrame(
      media: DataFrame,
      decoder: AudioDecoder = StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      maxHamming: Int = 5): DataFrame =
    pigeonholeChunks(
      audioFingerprints(media, decoder, windowMs, strideMs), "fhash", maxHamming)

  /** Persist the audio-hash index bucketed by the FULL candidate-join
    * key (chunk, ckey, start_ms): the probe joins on exactly these
    * three equi-keys, and bucket keys must equal the join keys for
    * the planner to keep the indexed side exchange-free
    * (spec-asserted — bucketing on a key subset gets "disabled by
    * query planner" and re-shuffles history).
    */
  def writeAudioHashIndex(
      index: DataFrame, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit =
    writer.commitBucketed(index, s"${name}_achunks", buckets,
      Seq("chunk", "ckey", "start_ms"), replace = writer.replaces)

  def readAudioHashIndex(spark: SparkSession, name: String): DataFrame =
    graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_achunks")

  /** Audio near-dup window pairs for a NEW media shard against an
    * indexed history — the audio member of the incremental-dedup
    * family. Output is exactly `audioNearDupPairs(old ∪ new)`
    * RESTRICTED to pairs with ≥1 new side (same candidate rule, same
    * hamming verify), but old×old work is UNREPRESENTABLE: the index
    * appears only as the build side of the new-shard probe, and
    * history PCM is never decoded again. Contract: new media_ids
    * disjoint from indexed ids; window/chunk parameters equal the
    * index build's.
    */
  def incrementalAudioNearDup(
      newMedia: DataFrame, index: DataFrame,
      decoder: AudioDecoder = StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      maxHamming: Int = 5, checkIds: Boolean = true): DataFrame = {
    if (checkIds) graft.ops.Dedup.requireDisjointIds(
      newMedia, index, "media_id", "incrementalAudioNearDup")
    val newChunks = pigeonholeChunks(
      audioFingerprints(newMedia, decoder, windowMs, strideMs), "fhash", maxHamming)
    incrementalAudioCandidates(newChunks, index)
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b", "start_ms")
  }

  /** Candidate window pairs for the incremental audio probe: new×index
    * plus new×new, hamming computable in-join from the stored hashes.
    * Package-visible so the spec can plan-assert the bucketed probe in
    * isolation (indexed side: one scan, no exchange).
    */
  private[graft] def incrementalAudioCandidates(
      newChunks: DataFrame, indexChunks: DataFrame): DataFrame = {
    def pairs(b: DataFrame, cond: Column): DataFrame =
      newChunks.as("a")
        .join(b.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.start_ms") === col("b.start_ms") && cond)
        .select(
          least(col("a.media_id"), col("b.media_id")).as("media_a"),
          greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
          col("a.start_ms").as("start_ms"),
          bit_count(col("a.fhash").bitwiseXOR(col("b.fhash"))).cast("long").as("hamming"))
    pairs(indexChunks, col("a.media_id") =!= col("b.media_id"))
      .unionByName(pairs(newChunks, col("a.media_id") < col("b.media_id")))
  }

  /** 64-bit average-hash (aHash) of a decoded grayscale plane: block-
    * average onto an 8×8 grid, threshold each cell at the grid mean,
    * pack row-major into a Long (bit 63 = top-left). The standard
    * perceptual fingerprint — stable under resizing, re-encoding and
    * small edits, with flipped bits roughly proportional to visual
    * change — so hamming distance between hashes IS the near-dup
    * metric. Deterministic for a deterministic decoder.
    */
  def aHash(plane: Array[Float], w: Int, h: Int): Long = {
    val sums = new Array[Float](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val cell = gy * 8 + (x * 8 / w)
        sums(cell) += plane(y * w + x)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val cells = new Array[Float](64)
    var i = 0
    var total = 0f
    while (i < 64) {
      cells(i) = if (counts(i) > 0) sums(i) / counts(i) else 0f
      total += cells(i)
      i += 1
    }
    val mean = total / 64f
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** Per-image perceptual hashes: decode in batches (the [[featurize]]
    * shape), aHash each plane — (media_id, ahash). The 8-byte hash is
    * the only thing that leaves the scan, so the corpus-wide pair
    * stage never moves pixels.
    */
  def imageHashes(
      media: DataFrame,
      decoder: ImageDecoder = StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    media.filter(col("kind") === "image")
      .select("media_id", "bytes", "width", "height")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val w = r.getAs[Int]("width")
            val h = r.getAs[Int]("height")
            val plane = decoder.decode(r.getAs[Array[Byte]]("bytes"), w, h)
            // plane length is authoritative (the decoder validated or
            // derived the true dims); recover them for the grid walk
            val (pw, ph) =
              if (w > 0 && h > 0 && plane.length == w * h) (w, h)
              else (plane.length, 1)
            Row(r.getAs[Long]("media_id"), aHash(plane, pw, ph))
          }
        }
      }(enc)
  }

  /** Image NEAR-dup pairs by perceptual hash — the multimodal member
    * of the dedup family: re-encoded, resized or lightly edited
    * copies of an image land within `maxHamming` bits of each other.
    * Candidate generation is the SimHash pigeonhole
    * ([[graft.ops.Dedup.simhashPairs]]): the 64-bit hash splits into
    * maxHamming+1 chunks, and any pair within maxHamming MUST agree
    * exactly on at least one chunk — so the join is equi on
    * (chunk, value), never all-pairs, and only 8-byte hashes shuffle.
    * Exact hamming verify (`bit_count(xor)`) filters the candidates.
    */
  def imageNearDupPairs(
      media: DataFrame,
      decoder: ImageDecoder = StubDecoder,
      maxHamming: Int = 5): DataFrame = {
    val chunked = chunkHashes(imageHashes(media, decoder), maxHamming)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.media_id") < col("b.media_id"))
      .select(
        col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b")
  }

  /** Pigeonhole chunk rows for a hash frame: the 64-bit hash splits
    * into maxHamming+1 chunks, and any pair within maxHamming MUST
    * agree exactly on at least one (chunk, ckey) — the equi-join
    * candidate rule. ONE definition feeds [[imageNearDupPairs]], the
    * persisted index build and the incremental probe, so build and
    * probe chunking can never silently disagree (a mismatched
    * maxHamming between index and probe changes chunk widths and
    * would drop true candidates — hence the contract that the probe
    * passes the SAME maxHamming the index was built with).
    */
  private[graft] def chunkHashes(hashes: DataFrame, maxHamming: Int): DataFrame =
    pigeonholeChunks(hashes.select("media_id", "ahash"), "ahash", maxHamming)

  /** The pigeonhole split itself, over ANY 64-bit hash column —
    * shared by the image (ahash) and audio (fhash) candidate rules so
    * the chunk-width arithmetic exists exactly once. Preserves every
    * input column and appends (chunk, ckey).
    */
  private[graft] def pigeonholeChunks(
      hashes: DataFrame, hashCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 63, "maxHamming must be in [0, 63)")
    val nChunks = maxHamming + 1
    val width = (64 + nChunks - 1) / nChunks
    hashes.select(col("*"),
      explode(array((0 until nChunks).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col(hashCol), c * width)
            .bitwiseAND((1L << math.min(width, 62)) - 1).as("ckey"))): _*)).as("ck"))
      .withColumn("chunk", col("ck.chunk"))
      .withColumn("ckey", col("ck.ckey"))
      .drop("ck")
  }

  /** Persisted image-hash index frame: (media_id, ahash, chunk, ckey),
    * one row per hash chunk — what the media lake stores so tomorrow's
    * crawl shard never re-decodes (or re-shuffles) yesterday's corpus.
    * 8-byte hashes only; pixels never enter the index. Append-only:
    * a new shard's own frame is appended after its pairs are taken
    * (the [[graft.ops.Dedup.MinhashIndex]] daily-loop contract).
    */
  def imageHashIndexFrame(
      media: DataFrame,
      decoder: ImageDecoder = StubDecoder,
      maxHamming: Int = 5): DataFrame =
    chunkHashes(imageHashes(media, decoder), maxHamming)

  /** Persist the index bucketed by the candidate-join keys
    * (chunk, ckey): the daily probe then scans history buckets in
    * place — zero exchange on the indexed side (spec-asserted, the
    * writeMinhashIndex pattern). Use an append-mode LakeWriter to
    * grow it by one shard.
    */
  def writeImageHashIndex(
      index: DataFrame, writer: graft.sinks.LakeWriter,
      name: String, buckets: Int = 32): Unit =
    writer.commitBucketed(index, s"${name}_chunks", buckets, Seq("chunk", "ckey"),
      replace = writer.replaces)

  def readImageHashIndex(spark: SparkSession, name: String): DataFrame =
    graft.sinks.LakeWriter.readBucketedTable(spark, s"${name}_chunks")

  /** Image near-dup pairs for a NEW media shard against an indexed
    * history — the multimodal member of the incremental-dedup family
    * (images arrive incrementally too: the reference re-crawls
    * monthly, `dota_extraction.yml:4-6`). Output is exactly
    * `imageNearDupPairs(old ∪ new)` RESTRICTED to pairs with ≥1 new
    * side — same chunk candidate rule, same exact hamming verify —
    * but old×old work is UNREPRESENTABLE: the index appears in
    * exactly one join, as the build side of the new-shard probe, and
    * history pixels are never decoded again (only their stored
    * 8-byte hashes are read). Contract: new media_ids are disjoint
    * from indexed ids, and `maxHamming` equals the index build's.
    */
  def incrementalImageNearDup(
      newMedia: DataFrame, index: DataFrame,
      decoder: ImageDecoder = StubDecoder,
      maxHamming: Int = 5, checkIds: Boolean = true): DataFrame = {
    // checkIds = false skips the eager disjointness semi-join for hot
    // per-batch loops where disjointness is structural (the streaming
    // intake bypasses this wrapper for the same reason)
    if (checkIds) graft.ops.Dedup.requireDisjointIds(
      newMedia, index, "media_id", "incrementalImageNearDup")
    val newChunks = chunkHashes(imageHashes(newMedia, decoder), maxHamming)
    incrementalImageCandidates(newChunks, index)
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b")
  }

  /** Candidate pairs (with their exact hamming, computable in-join
    * from the two stored hashes) for the incremental probe: new×index
    * plus new×new. Package-visible so the spec can plan-assert the
    * bucketed probe in isolation (indexed side: one scan, no
    * exchange).
    */
  private[graft] def incrementalImageCandidates(
      newChunks: DataFrame, indexChunks: DataFrame): DataFrame = {
    def pairs(b: DataFrame, cond: Column): DataFrame =
      newChunks.as("a")
        .join(b.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") && cond)
        .select(
          least(col("a.media_id"), col("b.media_id")).as("media_a"),
          greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
          bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("long").as("hamming"))
    pairs(indexChunks, col("a.media_id") =!= col("b.media_id"))
      .unionByName(pairs(newChunks, col("a.media_id") < col("b.media_id")))
  }

  /** Build a media frame from raw tuples (test/ingest helper). */
  def fromRows(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), mediaSchema)

  /** Golden fixture for the end-to-end image near-dup gate: real PNG
    * payloads whose aHash values are derivable BY HAND from the hash
    * definition, so the expected pair frame is a known constant (the
    * q41 golden-oracle pattern). Patterns are axis-aligned half
    * splits in RELATIVE coordinates — every 8×8 grid cell is
    * uniformly dark or uniformly bright, so block averages threshold
    * exactly and float accumulation can't flip a bit:
    *  - 1: vertical split 64×64 → ahash 0x0F0F0F0F0F0F0F0F
    *       (each row: 4 dark cells then 4 bright)
    *  - 2: the SAME pattern at 128×128 → identical hash (hamming 0)
    *  - 3: #1 with the top-left cell flipped bright → exactly bit 63
    *       added (hamming 1 from #1 and #2)
    *  - 4: horizontal split → 0x00000000FFFFFFFF, hamming 32 from #1
    *       (far outside any near-dup radius)
    *  - 5: a video row (never hashed)
    * Expected pairs at maxHamming=5: (1,2,0), (1,3,1), (2,3,1).
    */
  def goldenImageFixture(spark: SparkSession): DataFrame = {
    fromRows(spark, Seq(
      Row(1L, "image", png(64, 64)(vsplit(64)), 64, 64, 0L, "png"),
      Row(2L, "image", png(128, 128)(vsplit(128)), 128, 128, 0L, "png"),
      Row(3L, "image", png(64, 64)((x, y) => vsplit(64)(x, y) ^ (x < 8 && y < 8)),
        64, 64, 0L, "png"),
      Row(4L, "image", png(64, 64)((_, y) => y >= 32), 64, 64, 0L, "png"),
      Row(5L, "video", png(8, 8)(vsplit(8)), 8, 8, 900L, "h264")))
  }

  /** The NEW-shard companion of [[goldenImageFixture]] (incremental
    * gate): planted re-encodes of the indexed patterns re-ingested at
    * fresh ids — the monthly-re-crawl event an incremental index
    * exists for — plus one genuinely novel image:
    *  - 11: the vertical split at 256×256 → ahash identical to #1/#2
    *        (hamming 0; 1 from #3)
    *  - 12: the horizontal split at 128×128 → identical to #4
    *  - 13: all-dark → every grid cell equals the mean, no bit set,
    *        hash 0x0 — hamming 32 from both pattern families, pairs
    *        with NOTHING (the novel-image arm)
    *  - 14: the vertical split at 32×32 → the new×new pair with 11
    * Expected incremental pairs at maxHamming=5 (≥1 new side; old×old
    * (1,2),(1,3),(2,3) must NOT appear): (1,11,0) (1,14,0) (2,11,0)
    * (2,14,0) (3,11,1) (3,14,1) (4,12,0) (11,14,0).
    */
  def goldenImageProbeFixture(spark: SparkSession): DataFrame = {
    fromRows(spark, Seq(
      Row(11L, "image", png(256, 256)(vsplit(256)), 256, 256, 0L, "png"),
      Row(12L, "image", png(128, 128)((_, y) => y >= 64), 128, 128, 0L, "png"),
      Row(13L, "image", png(64, 64)((_, _) => false), 64, 64, 0L, "png"),
      Row(14L, "image", png(32, 32)(vsplit(32)), 32, 32, 0L, "png")))
  }

  /** Golden fixture for the audio near-dup gate: real WAV payloads
    * whose envelope hashes are derivable BY HAND from the
    * [[audioHash]] definition (the [[goldenImageFixture]] pattern).
    * Envelopes are half-split squares in RELATIVE time at amplitude
    * exactly 0.5 (PCM 16384/32768) — every 64-bin cell is uniformly
    * silent (0) or uniformly 0.5, so bin means are exact and the
    * threshold can't flip a bit. At windowMs = strideMs = 2000 each
    * 2000 ms file is ONE window starting at 0:
    *  - 21: silence 0–1 s, 0.5 for 1–2 s at 8 kHz → bins 32–63 loud →
    *        fhash 0x00000000FFFFFFFF (cell mean 0.25; 0.5 > 0.25)
    *  - 22: the SAME envelope at 16 kHz → identical hash (hamming 0)
    *  - 23: #21 with the first bin (0–31.25 ms) loud too → exactly
    *        bit 63 added (mean 33·0.5/64 = 0.2578125; hamming 1)
    *  - 24: the reverse split (loud 0–1 s) → 0xFFFFFFFF00000000,
    *        hamming 64 from #21 — far outside any near-dup radius
    *  - 25: an image row (never fingerprinted)
    * Expected window pairs at maxHamming=5:
    * (21,22,0,0), (21,23,0,1), (22,23,0,1).
    */
  def goldenAudioFixture(spark: SparkSession): DataFrame = {
    def halfSplit(rate: Int, firstBinLoud: Boolean): Array[Short] = {
      val n = rate * 2 // 2000 ms
      val binW = n / 64
      Array.tabulate(n) { i =>
        val loud = i >= n / 2 || (firstBinLoud && i < binW)
        if (loud) 16384.toShort else 0.toShort
      }
    }
    fromRows(spark, Seq(
      Row(21L, "audio", wav(8000, halfSplit(8000, firstBinLoud = false)),
        0, 0, 2000L, "wav"),
      Row(22L, "audio", wav(16000, halfSplit(16000, firstBinLoud = false)),
        0, 0, 2000L, "wav"),
      Row(23L, "audio", wav(8000, halfSplit(8000, firstBinLoud = true)),
        0, 0, 2000L, "wav"),
      Row(24L, "audio", wav(8000, halfSplit(8000, firstBinLoud = false).reverse),
        0, 0, 2000L, "wav"),
      Row(25L, "image", png(8, 8)(vsplit(8)), 8, 8, 0L, "png")))
  }

  /** The NEW-shard companion of [[goldenAudioFixture]] (incremental
    * gate): re-encodes of the indexed envelopes at fresh ids — the
    * re-crawl event the incremental index exists for — plus one
    * genuinely novel file:
    *  - 31: the silence-then-loud envelope at 32 kHz → fhash
    *        identical to #21/#22 (hamming 0; 1 from #23)
    *  - 32: the loud-then-silence envelope at 16 kHz → identical to
    *        #24
    *  - 33: all-silent → every bin mean 0, nothing exceeds the mean,
    *        fhash 0x0 — 32 bits from both envelope families, pairs
    *        with NOTHING (the novel-file arm)
    *  - 34: the silence-then-loud envelope at 4 kHz → pairs with 31
    *        (the new×new arm)
    * Expected incremental window pairs at maxHamming=5 (≥1 new side;
    * old×old (21,22)/(21,23)/(22,23) must NOT appear): (21,31,0,0)
    * (21,34,0,0) (22,31,0,0) (22,34,0,0) (23,31,0,1) (23,34,0,1)
    * (24,32,0,0) (31,34,0,0).
    */
  def goldenAudioProbeFixture(spark: SparkSession): DataFrame = {
    def halfSplit(rate: Int): Array[Short] = {
      val n = rate * 2
      Array.tabulate(n)(i => if (i >= n / 2) 16384.toShort else 0.toShort)
    }
    fromRows(spark, Seq(
      Row(31L, "audio", wav(32000, halfSplit(32000)), 0, 0, 2000L, "wav"),
      Row(32L, "audio", wav(16000, halfSplit(16000).reverse), 0, 0, 2000L, "wav"),
      Row(33L, "audio", wav(8000, new Array[Short](16000)), 0, 0, 2000L, "wav"),
      Row(34L, "audio", wav(4000, halfSplit(4000)), 0, 0, 2000L, "wav")))
  }

  /** 16-bit mono little-endian PCM WAV bytes (fixture helper). */
  private[graft] def wav(rateHz: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def png(w: Int, h: Int)(pattern: (Int, Int) => Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (pattern(x, y)) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def vsplit(w: Int)(x: Int, y: Int) = x >= w / 2
}
