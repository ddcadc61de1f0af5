package graft

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized via the noop
  * sink (count() would let Catalyst prune most of the plan).
  *
  * Statistical rigor (round-3 lesson: a single contended measurement
  * fabricated 15× phantom regressions in the r03 driver artifact):
  *
  *  - each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and
  *    the REPORTED number is the per-query MEDIAN; min and max ride
  *    along in the artifact so contention is visible (median ≫ min
  *    means a noisy window, not a slow plan);
  *  - caches are released between runs ([[graft.core.GraftCaches]]),
  *    so every run measures the full cold plan and no query inherits
  *    another's persisted frames — this also closes the canonicalSets
  *    storage leak for the duration of the pass.
  *
  * Failures are first-class: a query that throws is recorded with
  * value -1 in the per-query map AND listed under "failed", and the
  * process exits nonzero — a broken run must never be mistakable for
  * a green one (round-1 lesson). A query that fails its first run is
  * not retried: 3× the cost of a broken plan buys nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3), 1)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/shuffle-service spin-up otherwise
    // lands entirely on whichever query happens to run first
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // dev-time subset: comma-separated name substrings (driver sets
    // no filter → full run)
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(pats) => val ps = pats.split(","); n => ps.exists(n.contains)
      case None => _ => true
    }
    // shuffle-volume observability: task-end metrics accumulate into
    // one counter; the per-query delta is the scale currency a plan
    // audit reads (a query whose time is fine but whose shuffle bytes
    // jumped 10× regressed at 100 TB even if the laptop can't tell).
    // The bus is async, so the delta is read AFTER the timed window
    // via a stability poll — metric capture never inflates the time.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def settledShuffle(): Long = {
      var prev = shuffleBytes.get()
      var tries = 0
      while (tries < 10) {
        Thread.sleep(50)
        val cur = shuffleBytes.get()
        if (cur == prev) tries = 10 else { prev = cur; tries += 1 }
      }
      prev
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => only(q._1)).map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      val shuffles = Seq.newBuilder[Double]
      var ok = true
      var r = 0
      while (ok && r < runs) {
        graft.core.GraftCaches.release(spark)
        val s0 = settledShuffle()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times += (System.nanoTime() - t0) / 1e9
          shuffles += (settledShuffle() - s0) / 1e6
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          ok = false
        }
        r += 1
      }
      (name, times.result().sorted, ok, shuffles.result().sorted)
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid
    // JSON through the locale-sensitive f-interpolator
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // lower-middle for even run counts: this artifact exists to
    // SUPPRESS one-off contention spikes, so with runs=2 report the
    // quieter run, never the contended one
    def median(ts: Seq[Double]): Double = ts((ts.size - 1) / 2)
    def qmap(pick: ((String, Seq[Double], Boolean, Seq[Double])) => Seq[Double])(
        f: Seq[Double] => Double): String = results.map { r =>
      "\"" + r._1 + "\":" + (if (r._3) fmt(f(pick(r))) else "-1")
    }.mkString("{", ",", "}")
    val med = qmap(_._2)(median)
    val mins = qmap(_._2)(_.head)
    val maxs = qmap(_._2)(_.last)
    val shuf = qmap(_._4)(median)
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map { case (_, ts, _, _) => median(ts) }.sum
    // name the statistic honestly: an even run count reports the
    // lower-middle (runs=2 → the min), which is NOT a median
    val stat = if (runs % 2 == 1) "median" else "lower-median"
    // a filtered run must be distinguishable from (and must not
    // clobber) the full-suite artifact the round is judged on
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
    // the env value is user text going into JSON — escape it
    def jstr(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val onlyField = onlyEnv.map(p => s""","only":"${jstr(p)}"""").getOrElse("")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"stat":"$stat"$onlyField,"queries":$med,"queries_min":$mins,"queries_max":$maxs,"queries_shuffle_mb":$shuf,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // stdout capture windows truncate (~2 KB tails have eaten a whole
    // round's headline number); the artifact must also survive on disk
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (onlyEnv.isDefined) "bench_subset.json" else "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
