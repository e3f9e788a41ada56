package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one JSON line with per-query + total wall seconds.
  *
  * Fidelity notes (round-1 + round-3 verdict findings):
  *  - each query is executed once as WARM-UP before the timed run, so JIT /
  *    codegen compilation noise doesn't dominate the first query measured;
  *  - the timed action is a `noop`-format write, which executes the COMPLETE
  *    physical plan — including final sorts and computed projections that a
  *    bare `.count()` lets Catalyst eliminate (`EliminateSorts`, pruning);
  *  - the core count is recorded in the output so rounds on different
  *    machines aren't silently compared;
  *  - the JSON line is ALSO written to `bench_out.json` (stdout truncation
  *    once lost a round's numbers), and `loadavg1` (1-minute /proc/loadavg
  *    at start) + `elapsed_wall` are recorded so a machine-contention-
  *    poisoned run is self-evident: loadavg1 far above `cores` before the
  *    run starts, or elapsed_wall far above the summed query seconds, means
  *    the box was busy and the numbers measure contention, not the engine;
  *  - `Caches.release()` runs after every query so one query's persisted
  *    blocks can't pressure the block manager during the next measurement;
  *  - SELF-HEALING against machine contention (three of the first seven
  *    driver rounds were poisoned by a concurrent build): when the timed
  *    run exceeds 4× its own warm-up (the warm-up is the same plan run
  *    seconds earlier — a 4× gap on a quiet box is implausible) and is
  *    above a 0.2 s floor (tiny queries jitter harmlessly), the query is
  *    re-timed TWICE more, all three samples land in the artifact under
  *    `retimed`, and the reported per-query value is their MEDIAN
  *    (round-13: min-of-2 removed transient slowness but kept transient
  *    fastness — a one-sided bias that could ratchet the committed clean
  *    baseline optimistically across rounds);
  *  - per-query warm-up seconds land under `warmups` (round-8 verdict):
  *    sustained contention slows warm-up and timed run EQUALLY, so the 4×
  *    trigger structurally can't fire on it — recording the warm-ups makes
  *    a contended run diagnosable per query against the committed clean
  *    artifact instead of only via round-level loadavg;
  *  - round-12: the committed clean artifact (`bench_sf01.json`, same sf
  *    dir) is ALSO used actively — after the sweep, any query that ran
  *    >3× its committed clean time is re-timed once more (contention
  *    windows are transient; the end of the run is a different window),
  *    and the contended start gate tightened to cores/16 after two rounds
  *    squeaked past cores/8 at loadavg 3.77-3.99 while 2-10× noisy.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def loadavg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** Runnable/total process counts (4th /proc/loadavg field, "r/t"). */
  private def procCounts: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(3)
    catch { case _: Throwable => "?" }

  /** Mean "cpu MHz" across /proc/cpuinfo — frequency scaling is the one
    * box-state dimension loadavg cannot see (a thermally-throttled or
    * powersave-governed box runs every lane slow at loadavg 0). */
  private def cpuMhz: Double =
    try {
      val xs = scala.io.Source.fromFile("/proc/cpuinfo").getLines()
        .filter(_.startsWith("cpu MHz")).map(_.split(":")(1).trim.toDouble)
        .toSeq
      if (xs.isEmpty) -1.0 else math.round(xs.sum / xs.size * 10) / 10.0
    } catch { case _: Throwable => -1.0 }

  /** In-capture drift canary (round-16 verdict item 5: the round burned
    * real effort reconstructing box state across rounds AFTER the fact —
    * pre-register it instead). Three cheap lanes spanning the main cost
    * shapes — `q1_agg` (columnar scan + agg), `llm_simhash` (CPU-bound
    * text hashing), `llm_minhash_lsh` (shuffle join) — run warm-up +
    * timed TWICE per capture, immediately after settle and again after
    * the sweep. A quiet box repeats within noise; an end/start ratio far
    * from 1 quantifies in-capture drift INSIDE the artifact, so a
    * contention window no gate caught is visible without cross-round
    * archaeology. Memo-free lanes only (a memo build in the canary would
    * bill its first toucher asymmetrically). */
  private val CanaryLanes = Seq("q1_agg", "llm_simhash", "llm_minhash_lsh")

  private def runCanary(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[(String, Double)] =
    CanaryLanes.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        try {
          force(fn(spark, sfDir)) // warm-up
          val t0 = System.nanoTime()
          force(fn(spark, sfDir))
          val dt = (System.nanoTime() - t0) / 1e9
          Caches.release(); System.gc()
          name -> dt
        } catch { case _: Throwable => name -> -1.0 }
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val cores = spark.sparkContext.defaultParallelism
    // The 1-minute loadavg at this point is dominated by OUR OWN sbt
    // compile + JVM startup (observed: 4.31 on an otherwise-idle box —
    // which would false-positive the tightened cores/16 gate below and
    // mislabel a genuinely clean run as contended). A compile spike decays
    // with the 1-minute half-life, real contention doesn't: wait up to
    // 3 min for the load to settle under the gate before sampling the
    // value the contended label is derived from. Both readings land in
    // the artifact so the wait is auditable.
    // round-13 (ADVICE): the gate floors at 1.0 so boxes with < 16 cores
    // don't spin the full settle wait against a sub-1.0 threshold no idle
    // Unix box ever meets; the divisor is env-tunable for other profiles.
    // Try-parse: a malformed env value must degrade to the default, not
    // kill the whole capture before any query runs (round-13 ADVICE).
    val gateDiv = scala.util.Try(
      sys.env.getOrElse("GRAFT_BENCH_LOAD_DIV", "16").toDouble).getOrElse(16.0)
    val gate = math.max(1.0, cores / gateDiv)
    val loadRaw = loadavg1
    var loadAtStart = loadRaw
    var settleWait = 0
    // the whole settle trajectory lands in the artifact (round-16 verdict
    // item 5: pre-register box state instead of reconstructing it)
    val loadSeries = scala.collection.mutable.ArrayBuffer(loadRaw)
    while (loadAtStart > gate && settleWait < 180) {
      Thread.sleep(15000)
      settleWait += 15
      loadAtStart = loadavg1
      loadSeries += loadAtStart
    }
    val wall0 = System.nanoTime()
    // round-13 (ADVICE): a retime reports the MEDIAN of three samples, not
    // the min of two — min-of-2 removed transient slowness but kept
    // transient fastness, and because the healed artifact later becomes
    // the committed clean baseline, per-query numbers could ratchet
    // optimistically across rounds. The median is one-sided-bias-free
    // w.r.t. the quantity being estimated; all samples land in the
    // artifact under `retimed`.
    // Residual warm-state bias (round-14, documenting the round-13 ADVICE
    // follow-up): the extra samples run back-to-back on warm intra-query
    // caches — DELIBERATELY, because the triggering sample `dt` itself ran
    // warm (after a warm-up, before any release), so warm retime samples
    // estimate the SAME quantity the normal timed run measures. Releasing
    // caches between samples would instead time cold rebuilds the normal
    // path never times, biasing retimed queries SLOW relative to their
    // committed anchors.
    val retimed = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Double])]
    def median3(a: Double, b: Double, c: Double): Double =
      Seq(a, b, c).sorted.apply(1)
    // per-query warm-up seconds: SUSTAINED machine contention slows warm-up
    // and timed run equally, so the 4x retimer structurally cannot catch it
    // — but a warm-up far above the committed clean run's on identical code
    // makes the contention diagnosable per query after the fact.
    val warmups = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // Crashing queries must be LOUD (round-9 verdict: 15 queries crashed and
    // only showed up as -1.0 sentinels): names land in a `failed` artifact
    // field, mirroring Verify's queries.json manifest, so a crash can never
    // read as merely "a fast query" in the artifact.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Optional subset run (local iteration + the sf10 top-lane probe): a
    // comma-separated name list restricts the sweep; the artifact records
    // the filter under `only` so a subset capture can never be mistaken
    // for a full-registry baseline.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // start-of-capture canary (full-registry runs only — a subset probe
    // is already a targeted instrument and shouldn't pay the ~10 s)
    val canaryStart =
      if (only.isEmpty) runCanary(spark, sfDir) else Seq.empty
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try {
        // warm-up: JIT + codegen + file-footer caches; intra-query persists
        // stay cached so the timed run measures warm-cache steady state
        // (the semantics every prior round measured), then release AFTER it
        // so one query's blocks can't leak into the next measurement.
        val w0 = System.nanoTime()
        force(fn(spark, sfDir))
        val wu = (System.nanoTime() - w0) / 1e9
        warmups += ((name, wu))
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt > 4.0 * wu && dt > 0.2) {
          val r0 = System.nanoTime()
          force(fn(spark, sfDir))
          val dt2 = (System.nanoTime() - r0) / 1e9
          val r1 = System.nanoTime()
          force(fn(spark, sfDir))
          val dt3 = (System.nanoTime() - r1) / 1e9
          retimed += ((name, Seq(dt, dt2, dt3)))
          name -> median3(dt, dt2, dt3)
        } else name -> dt
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name
        name -> -1.0
      }
      // release + forced GC OUTSIDE any timed window: a memory-heavy
      // query's garbage otherwise bleeds GC pauses into its alphabetical
      // neighbor's measurement (observed: llm_semdedup's k-means
      // checkpoints inflating llm_simhash 4x), and because the pressure
      // slows warm-up and timed run EQUALLY the 4x retimer structurally
      // cannot catch it.
      finally { Caches.release(); System.gc() }
    }
    // END-OF-RUN re-time against the committed clean baseline (round-11
    // verdict: two driver benches in a row passed the loadavg gate while
    // specific lanes ran 2-10x slow under a contention window the in-run
    // 4x-vs-warmup trigger structurally cannot see — sustained contention
    // slows warm-up and timed run EQUALLY). The committed artifact for the
    // SAME sf dir is the one clean anchor available: any query >3x its
    // committed clean time (0.5 s floor) gets one more sample now, when
    // the contention window has often passed; the artifact reports the
    // minimum and both samples land under `retimed`.
    val clean: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("bench_sf01.json")))
        if (!txt.contains("\"sf\":\"" + sfDir + "\"")) Map.empty
        else "\"([a-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(
          txt.substring(txt.indexOf("\"queries\":"),
            txt.indexOf("}", txt.indexOf("\"queries\":")) + 1))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val healed = results.map { case (name, dt) =>
      val ref = clean.getOrElse(name, -1.0)
      if (dt > 0.5 && ref > 0 && dt > 3.0 * ref) {
        try {
          val r0 = System.nanoTime()
          force(SparkEntry.queries(name)(spark, sfDir))
          val dt2 = (System.nanoTime() - r0) / 1e9
          val r1 = System.nanoTime()
          force(SparkEntry.queries(name)(spark, sfDir))
          val dt3 = (System.nanoTime() - r1) / 1e9
          Caches.release(); System.gc()
          retimed += ((name, Seq(dt, dt2, dt3)))
          name -> median3(dt, dt2, dt3)
        } catch { case _: Throwable => name -> dt }
      } else name -> dt
    }
    // end-of-capture canary: same three lanes, same warm-up discipline —
    // the start/end ratio quantifies in-capture drift inside the artifact
    val canaryEnd =
      if (only.isEmpty) runCanary(spark, sfDir) else Seq.empty
    val canaryJson = {
      def m(xs: Seq[(String, Double)]) = xs
        .map { case (k, v) => s"\"" + k + s"\":$v" }.mkString("{", ",", "}")
      val ratios = canaryStart.flatMap { case (k, s0) =>
        canaryEnd.collectFirst { case (`k`, s1) if s0 > 0 && s1 > 0 =>
          s1 / s0 }
      }
      val mx = if (ratios.isEmpty) -1.0
        else math.round(ratios.max * 1000) / 1000.0
      s"""{"start":${m(canaryStart)},"end":${m(canaryEnd)},"max_ratio":$mx}"""
    }
    val qs = healed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rt = retimed.map { case (k, ss) =>
      s"\"" + k + "\":" + ss.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val wus = warmups.map { case (k, v) => s"\"" + k + s"\":$v" }
      .mkString("{", ",", "}")
    // shared-frame build costs (Caches.memo): timed values exclude these
    // (they land in the first toucher's warm-up); publishing them as a
    // first-class field keeps cross-round anchors auditable.
    val memoB = Caches.memoBuildSecs.toSeq.sorted
      .map { case (k, v) => s"\"" + k + s"\":$v" }
      .mkString("{", ",", "}")
    val total = healed.map(_._2).filter(_ >= 0).sum
    val elapsed = (System.nanoTime() - wall0) / 1e9
    // Contention self-label (round-9 verdict: two driver artifacts in a row
    // were poisoned by a busy box and read as regressions): a loadavg already
    // above cores/16 BEFORE the first query runs means the numbers measure
    // contention, not the engine — flag the artifact so readers prefer the
    // committed clean baseline. cores/16 (was cores/8): rounds 10 AND 11
    // both started at loadavg 3.77-3.99 against the old 4.0 threshold,
    // passed as "clean" by a hair, and were visibly 2-10x noisy per-lane.
    val contended = loadAtStart > gate
    val fj = failed.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        only.map(s => "\"only\":" + s.toSeq.sorted.map("\"" + _ + "\"")
          .mkString("[", ",", "]") + ",").getOrElse("") +
        s""""retimed":$rt,"warmups":$wus,"memo_build_s":$memoB,"failed":$fj,"sf":"$sfDir","cores":$cores,""" +
        s""""loadavg1":$loadAtStart,"loadavg1_raw":$loadRaw,""" +
        s""""settle_wait_s":$settleWait,"loadavg1_end":$loadavg1,""" +
        s""""load_series":${loadSeries.mkString("[", ",", "]")},""" +
        s""""cpu_mhz":$cpuMhz,"procs":"$procCounts",""" +
        s""""canary":$canaryJson,""" +
        s""""contended":$contended,"elapsed_wall":$elapsed}"""
    println(line)
    // stdout is the driver's channel but is truncation-prone under sbt; the
    // file is the durable copy of the same line.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
