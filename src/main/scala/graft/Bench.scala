package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints the full-run JSON line (per-key map, retried
  * pairs, sentinel samples — the complete artifact, also persisted to
  * BENCH_FULL.json) followed by ONE COMPACT (&lt;1 KB) summary line as the
  * LAST stdout line. The driver records only a ~2 KB stdout tail, and the
  * full line outgrew it around round 3 (236 keys by r17 — tens of KB), so
  * BENCH_r01..r17 all carry `parsed: null` and PERF has been empty
  * (VERDICT r17 "what's wrong" #1). The compact line carries the totals,
  * counts, head and sentinel maxima — everything scalar — and names the
  * artifact file holding the per-key maps; it is what the driver's
  * tail-parse can actually see. Nothing about the measurement methodology
  * changed: same queries, same action, same medians, same sentinel
  * protocol, and the full line still prints first.
  *
  * Trust mechanisms (round-5 sentinel + median-of-3; round-10 weather-proofing
  * after BENCH_r09 was captured in a contended window — 116.1 s at 18.8 %
  * sentinel deviation vs 89.5 s on the same HEAD quiet — and nearly breached
  * the 2× gate on host load alone):
  *
  *   1. CONTENTION SENTINEL — a fixed single-thread xorshift spin (pure CPU,
  *      no allocation) is timed before the suite (median of 5 = baseline) and
  *      re-sampled every 8 queries. The JSON carries the baseline, every
  *      sample, and the max deviation pct. A poisoned run is machine-detectable:
  *      sentinel deviation tracks external CPU pressure, code changes cannot
  *      move it.
  *   1b. CAPACITY SENTINEL (round 12 — the blind spot the round-11 final-HEAD
  *      run exposed: a co-tenant stealing CORES inflated query totals +20%
  *      while the single-thread spin read a flat +6%, because a mostly-idle
  *      machine still runs ONE thread at full speed). A second fixed-work
  *      spin runs on `cpus` threads simultaneously and times the WALL for
  *      all to finish: stolen capacity stretches it proportionally even when
  *      per-core speed is untouched. Its baseline is sampled UNDER WARMUP
  *      LOAD (round 13) so the live suite's housekeeping self-noise is in
  *      the base, not the deviation; the artifact carries both sentinel
  *      blocks, and the window retry fires when EITHER sentinel crosses
  *      ITS OWN threshold (ST 10%, MT 18% — see RetryDevPctMt), so
  *      contended-capacity windows are auto-parked instead of certified
  *      by eye.
  *   2. MEDIAN-OF-3 with outlier re-run — each query runs 3x; if the median is
  *      both 2x and +0.5s over the min (a transient stall, not a plan), up to 2
  *      extra runs are taken and the median recomputed. "total" sums medians.
  *   3. WINDOW RETRY — queries run in sentinel-bracketed windows of 8; if
  *      either bracketing sample deviates >10% from baseline, every query in
  *      the window re-runs once (bounded: at most MaxRetryWindows windows per
  *      suite) and the adopted time is min(first, retry) — external contention
  *      is strictly additive on fixed work in a warm JVM, and both figures are
  *      medians-of-3, so min picks whichever window was quieter. Every retried
  *      query is recorded in the JSON ("retried": {name: [first, retry]}), so
  *      the artifact carries its own provenance instead of a weather report.
  *   4. ARTIFACT GUARD — two rules, in order (round 16; VERDICT r15 #1
  *      closed the four-round-old hole where a NEW-head run bypassed the
  *      guard entirely):
  *      (a) PROTOCOL VALIDITY, head-independent: a run with ANY retried
  *          window, or whose max slow-side sentinel deviation exceeds the
  *          retry threshold it ran under (either sentinel), is
  *          protocol-invalid and ALWAYS lands at BENCH_FULL.json.latest —
  *          a fresh HEAD is not a license to certify a contended window.
  *      (b) SAME-HEAD QUIETNESS: among protocol-valid runs at the SAME
  *          git head, a run on a MATERIALLY FASTER CLOCK (ST spin base
  *          ≥2% below the recorded one) always overwrites — both runs
  *          already passed protocol, and against the fixed baseline the
  *          faster-clock window is the better record (the r15 lesson: a
  *          valid window on a ~45%-slow clock printed raw/60 = 2.01×
  *          and could not be superseded). On comparable clocks the run
  *          with the lower threshold-normalized max-slow wins; a
  *          noisier same-clock run lands at .latest. A valid run at a
  *          fresh HEAD always writes.
  *      stdout always carries the fresh JSON either way.
  */
object Bench {
  // ~0.15-0.3s of fixed single-thread work on a modern core. Fixed WORK (not
  // fixed time) so samples within one run are directly comparable.
  private val SpinIters = 300000000L
  // window size and retry threshold are env-overridable so the one-off
  // stability sweep (retry-rate vs artifact noise across settings) can
  // drive them without a rebuild; defaults are the round-5 constants
  private val WindowSize =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_WINDOW", "8").toInt
  private val MaxRetryWindows = 6
  private val RetryDevPct =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DEV", "10.0").toDouble
  // The capacity sentinel's retry threshold is LOOSER than the
  // single-thread one, but no longer 40%: through round 12 the MT
  // baseline was measured on an idle JVM, so a LIVE suite's own
  // housekeeping (ContextCleaner, GC worker threads, parquet IO pools)
  // inflated every sample 15-25% and the threshold had to sit above that
  // band — which left a 26-40% dead zone certified "quiet" on a
  // judgement call (the driver's own r12 run landed at 39.15%, 0.85
  // points under the trigger — VERDICT r12 #1). Round 13 takes the
  // baseline UNDER WARMUP LOAD instead (see main: the spins are sampled
  // while a Spark warmup loop runs), folding the self-noise into the
  // base, so the threshold tightens to 18%. Genuine capacity theft
  // still measures FAR above it: +92% over the IDLE base on the
  // controlled 16-of-32-core drill (BASELINE.md) is +55-70% over the
  // loaded base — 3x the trigger.
  private val RetryDevPctMt =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DEV_MT", "18.0").toDouble

  private def spin(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < SpinIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  // Per-thread work for the capacity sentinel: half the single-thread
  // spin, so one sample costs ~0.1-0.15s wall on a quiet host (the wall
  // time of N threads racing N free cores ≈ one thread's time; stolen
  // cores stretch it). Fixed WORK per thread, like spin().
  private val SpinParIters = 150000000L

  /** Wall seconds for `threads` simultaneous fixed-work spins — the
    * parallel-CAPACITY sentinel. Distinct seeds per thread defeat any
    * cross-thread CSE; a plain Thread per sample (no pool) keeps the
    * measurement free of executor-queue state. */
  private def spinPar(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { t =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0L
        while (i < SpinParIters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        if (x == 42L) System.err.println("")
      }, s"graft-bench-capacity-$t")
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Where a finished run's JSON should land — the ARTIFACT GUARD, pure so
    * BenchGuardSuite can drill it without running a bench.
    *
    * @param out          the artifact path this run targets (BENCH_FULL.json
    *                     or a filtered/env-overridden path)
    * @param prevJson     the current contents of `out`, if it exists
    * @param head         this run's git HEAD ("unknown" if unreadable)
    * @param retriedCount how many queries hit the window retry
    * @param maxSlowPct / maxSlowMtPct  this run's slow-side sentinel maxima
    * @param thSt / thMt  the retry thresholds this run was certified under
    * @return (targetPath, reason for stderr if redirected)
    */
  private[graft] def artifactTarget(
      out: String, prevJson: Option[String], head: String,
      retriedCount: Int, maxSlowPct: Double, maxSlowMtPct: Double,
      thSt: Double, thMt: Double,
      stBase: Double = Double.MaxValue): (String, Option[String]) = {
    // Rule (a): protocol validity, regardless of HEAD. A retried window
    // means contention was DETECTED mid-run; an over-threshold max_slow
    // means it was detected but the retry budget was exhausted (or the
    // retry itself ran hot). Either way this window cannot be the record
    // the 2x bar is judged against.
    if (retriedCount > 0 || maxSlowPct > thSt || maxSlowMtPct > thMt) {
      val why = f"protocol-invalid run (retried=$retriedCount, " +
        f"st_slow=$maxSlowPct%.1f%%/th=$thSt%.0f, " +
        f"mt_slow=$maxSlowMtPct%.1f%%/th=$thMt%.0f)"
      return (out + ".latest", Some(why))
    }
    // Rule (b): same-HEAD quietness compare against whatever sits at `out`,
    // each side NORMALIZED by the retry threshold it was certified under
    // (ADVICE r12): the sentinels have different noise floors, so a raw
    // max() let a genuinely ST-contended run (ST 12%, MT 16%) replace a
    // quiet one whose MT self-noise read 24%. The artifact records its
    // thresholds since r13; older artifacts fall back to the constants in
    // force when they were written (ST 10, MT 40 idle-base). Pre-r12
    // artifacts carry one block (ST only), pre-r10 only the abs metric —
    // both stay on the ST scale (a fast-clocked sample inflates abs dev
    // but cannot have hurt the recorded timings — still the honest
    // fallback).
    prevJson match {
      case Some(prev) =>
        val prevHead = "\"head\":\"([0-9a-f]+)\"".r
          .findFirstMatchIn(prev).map(_.group(1))
        val prevSlows = "\"max_slow_pct\":([0-9.Ee+-]+)".r
          .findAllMatchIn(prev).map(_.group(1).toDouble).toSeq
        val prevThs = "\"retry_dev_pct\":([0-9.Ee+-]+)".r
          .findAllMatchIn(prev).map(_.group(1).toDouble).toSeq
        val prevThSt = prevThs.headOption.getOrElse(10.0)
        val prevThMt = if (prevThs.size >= 2) prevThs(1) else 40.0
        val prevNorm =
          if (prevSlows.size >= 2)
            Some(math.max(prevSlows(0) / prevThSt, prevSlows(1) / prevThMt))
          else if (prevSlows.size == 1) Some(prevSlows(0) / prevThSt)
          else "\"max_dev_pct\":([0-9.Ee+-]+)".r.findFirstMatchIn(prev)
            .map(_.group(1).toDouble / prevThSt)
        val thisNorm = math.max(maxSlowPct / thSt, maxSlowMtPct / thMt)
        // a materially faster CLOCK (first spin_base_sec in the artifact
        // = the ST sentinel base) beats the quietness compare: both runs
        // are valid-protocol here, and the faster-clock window is the
        // better record against the fixed baseline (the r15 slow-base
        // 2.01x lesson). 2% guard band so equal-clock runs still
        // arbitrate on noise.
        val prevBase = "\"spin_base_sec\":([0-9.Ee+-]+)".r
          .findFirstMatchIn(prev).map(_.group(1).toDouble)
        val fasterClock = prevBase.exists(pb => stBase < pb * 0.98)
        if (prevHead.contains(head) && head != "unknown" && !fasterClock &&
            prevNorm.exists(_ < thisNorm)) {
          val why = f"same HEAD, threshold-normalized max_slow " +
            f"${prevNorm.get}%.2f < this run's $thisNorm%.2f, and this " +
            f"run's clock is not materially faster"
          (out + ".latest", Some(why))
        } else (out, None)
      case None => (out, None)
    }
  }

  /** The compact end-of-run summary — the LAST stdout line (see the class
    * doc: the driver keeps only a ~2 KB stdout tail, so this line, not the
    * full artifact line, is what its parse sees). Scalars only; the
    * per-key/retried/sample maps live in the artifact file this line names.
    * Pure, suite-pinned to stay parseable and under 1 KB. */
  private[graft] def compactLine(total: Double, quietEquiv: Double,
      nKeys: Int, nFailed: Int, head: String, retriedCount: Int,
      maxSlowPct: Double, maxSlowMtPct: Double, stBase: Double,
      mtBase: Double, sfDir: String, artifact: String): String =
    s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""quiet_equiv_sec":$quietEquiv,"n_keys":$nKeys,""" +
      s""""n_failed":$nFailed,"head":"$head","retried_n":$retriedCount,""" +
      s""""sentinel":{"spin_base_sec":$stBase,"max_slow_pct":$maxSlowPct},""" +
      s""""sentinel_mt":{"spin_base_sec":$mtBase,"max_slow_pct":$maxSlowMtPct},""" +
      s""""queries_file":"$artifact"}"""

  /** Current git HEAD commit (plain file reads — no process exec), or
    * "unknown". Resolves one level of symbolic ref and falls back to
    * packed-refs. */
  private def gitHead(): String = {
    import java.nio.file.{Files, Paths}
    try {
      val head = Files.readString(Paths.get(".git/HEAD")).trim
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.stripPrefix("ref: ").trim
        val refFile = Paths.get(".git/" + ref)
        if (Files.exists(refFile)) Files.readString(refFile).trim
        else {
          val packed = Paths.get(".git/packed-refs")
          if (!Files.exists(packed)) "unknown"
          else Files.readAllLines(packed).stream()
            .filter(l => l.endsWith(" " + ref))
            .map[String](_.split(" ")(0)).findFirst().orElse("unknown")
        }
      }
    } catch { case _: Throwable => "unknown" }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(Tables.NanosKey, "true") // events.ts is TIMESTAMP(NANOS)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Prime the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb ~6s of one-off warmup (measured at sf0.1).
    SparkEntry.entry(spark).count()

    spin() // JIT warmup for the sentinel itself
    val spinBase = median(Seq.fill(5)(spin()))
    val mtThreads = cpus.toInt
    spinPar(mtThreads) // JIT + thread-startup warmup for the capacity sentinel
    // Capacity baseline UNDER WARMUP LOAD (round 13, VERDICT r12 #1): the
    // between-window samples this base is compared against are taken
    // right after a window's queries finish, on a JVM whose housekeeping
    // is live — ContextCleaner draining the window's shuffles/broadcasts,
    // GC workers, parquet IO pools — which an idle-JVM base reads as a
    // steady +15-25% "deviation" (BASELINE.md r12 calibration). Each
    // baseline sample is therefore taken the same way: run the (already
    // primed, sub-second) flagship query, then sample IMMEDIATELY, so the
    // base carries the just-finished-work housekeeping state and the
    // retry threshold can sit at 18% instead of 40% (the r12 dead zone).
    // Sequential, not concurrent: a spin taken WHILE a query runs
    // measures query CPU too and over-inflates the base (+42% measured),
    // which would widen the masked band, not close it. The ST base above
    // stays idle-measured — its 10% threshold was calibrated there.
    val spinMtBase = median(Seq.fill(5) {
      SparkEntry.entry(spark).count()
      spinPar(mtThreads)
    })
    val sentinelSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val sentinelMtSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def devPct(s: Double): Double = math.abs(s - spinBase) / spinBase * 100
    // retry trigger uses SIGNED deviation: only a SLOWER-than-base sentinel
    // means external pressure inflated the window's timings; a faster one
    // (core clocked up, VM moved to a faster host slot) can only have made
    // them better than advertised. The reported max_dev_pct stays absolute
    // for cross-round comparability.
    def slowPct(s: Double): Double = (s - spinBase) / spinBase * 100
    def devMtPct(s: Double): Double = math.abs(s - spinMtBase) / spinMtBase * 100
    def slowMtPct(s: Double): Double = (s - spinMtBase) / spinMtBase * 100

    // one query's timing: median-of-3 with the round-5 outlier re-run,
    // followed by the block-manager sweep that keeps each query's memory
    // state identical to a standalone run (see the round-8 notes: the
    // checkpoint-block backlog, not host weather, caused the r4 "spikes").
    def timeQuery(name: String,
                  fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      var times = Seq(once(), once(), once()).flatten
      var extra = 0
      while (times.nonEmpty && extra < 2 &&
             median(times) > 2 * times.min && median(times) - times.min > 0.5) {
        times = times ++ once().toSeq
        extra += 1
      }
      graft.queries.LlmOps.clearShared()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      if (times.isEmpty) -1.0 else median(times)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val retried = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    var retryWindowsLeft = MaxRetryWindows
    // a window is contended if EITHER sentinel ran slow past ITS OWN
    // threshold: per-core pressure (single-thread, 10%) or stolen
    // capacity (multi-thread, 40% — see RetryDevPctMt)
    def hot(s: Double, sMt: Double): Boolean =
      slowPct(s) > RetryDevPct || slowMtPct(sMt) > RetryDevPctMt
    var prevHot = false // the baseline measurement brackets the first window

    // SPARK_GRAFT_BENCH_FILTER (regex): bench only matching keys — for
    // fast local iteration on a family. A filtered run never carries the
    // full-surface total, so it refuses to land at BENCH_FULL.json (the
    // same-HEAD artifact guard below sees the env and redirects).
    val keyFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
        case Some(re) => val r = re.r; n => r.findFirstIn(n).isDefined
        case None => _ => true
      }

    SparkEntry.queries.toSeq.filter(kv => keyFilter(kv._1))
        .grouped(WindowSize).foreach { group =>
      val first = group.map { case (name, fn) => name -> timeQuery(name, fn) }
      val s = spin(); sentinelSamples += s
      val sMt = spinPar(mtThreads); sentinelMtSamples += sMt
      // Drain the ContextCleaner between windows: shuffle files, broadcasts
      // and swept blocks are only released after a GC collects their weak
      // references; the backlog otherwise forces ad-hoc full GCs mid-query.
      // The spin samples are taken FIRST so the sentinels see the pre-GC state.
      System.gc()
      val isHot = hot(s, sMt)
      if ((isHot || prevHot) && retryWindowsLeft > 0) {
        // a contended window: every query in it re-runs once; adopt the
        // quieter figure and record both
        retryWindowsLeft -= 1
        val again = group.map { case (name, fn) => name -> timeQuery(name, fn) }
        val s2 = spin(); sentinelSamples += s2
        val s2Mt = spinPar(mtThreads); sentinelMtSamples += s2Mt
        System.gc()
        first.zip(again).foreach { case ((name, a), (_, b)) =>
          val adopted = if (a < 0) b else if (b < 0) a else math.min(a, b)
          retried(name) = (a, b)
          results(name) = adopted
        }
        prevHot = hot(s2, s2Mt)
      } else {
        first.foreach { case (name, t) => results(name) = t }
        prevHot = isHot
      }
    }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val retr = retried.map { case (k, (a, b)) => s"\"$k\":[$a,$b]" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val maxDevPct =
      if (sentinelSamples.isEmpty) 0.0
      else sentinelSamples.map(devPct).max
    val maxSlowPct =
      if (sentinelSamples.isEmpty) 0.0
      else math.max(0.0, sentinelSamples.map(slowPct).max)
    val sent = sentinelSamples.map(s => f"$s%.3f").mkString("[", ",", "]")
    val maxDevMtPct =
      if (sentinelMtSamples.isEmpty) 0.0
      else sentinelMtSamples.map(devMtPct).max
    val maxSlowMtPct =
      if (sentinelMtSamples.isEmpty) 0.0
      else math.max(0.0, sentinelMtSamples.map(slowMtPct).max)
    val sentMt = sentinelMtSamples.map(s => f"$s%.3f").mkString("[", ",", "]")
    // quiet-equivalent total: normalize by the host's single-thread speed
    // relative to the repo's recorded quiet-host spin base (0.445 s, the
    // r7 quiet run in BASELINE.md) — cross-round totals become directly
    // comparable without prose arithmetic. The RAW total stays "value";
    // this is a derived convenience, not a substitute for a quiet window.
    val quietEquiv = total * (0.445 / spinBase)
    val head = gitHead()
    // margin bookkeeping (VERDICT r10 #7): the artifact answers "2x of
    // what?" by itself — key count, per-key quiet cost, and the key-count
    // delta vs the previously committed full artifact (surface growth is
    // the structural driver of raw-total growth).
    val nKeys = results.size
    val perKeyQuiet = if (nKeys == 0) 0.0 else quietEquiv / nKeys
    // the delta compares against the artifact THIS run will write to —
    // filtered runs default to BENCH_FILTERED.json (same logic as the
    // writer below), never the full artifact (a 5-key filtered run
    // reading BENCH_FULL's 211 would record a nonsense 206-key shrink)
    val prevArtifact =
      if (sys.env.contains("SPARK_GRAFT_BENCH_FILTER"))
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FILTERED.json")
      else sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    // narrow failure handling (ADVICE r11): only I/O and number-format
    // problems may map to the -1 "unknown" sentinel — anything else is a
    // bug in this self-written format and should surface, not silently
    // misreport the key-count delta the margin bookkeeping exists for
    val nKeysPrev: Int = try {
      val p = java.nio.file.Paths.get(prevArtifact)
      if (!java.nio.file.Files.exists(p)) -1
      else {
        val prev = java.nio.file.Files.readString(p)
        "\"n_keys\":([0-9]+)".r.findFirstMatchIn(prev).map(_.group(1).toInt)
          .getOrElse {
            // pre-r11 artifact: count the quoted keys of its queries object
            val qstart = prev.indexOf("\"queries\":{")
            val qend = if (qstart < 0) -1 else prev.indexOf('}', qstart)
            // qend guards a TRUNCATED artifact (e.g. a partially written
            // file — environmental, not a format bug): substring would
            // throw after every query already ran and lose the run
            if (qstart < 0 || qend < 0) -1
            else {
              val body = prev.substring(qstart + 11, qend)
              // quote-counting assumes the flat {"name":num,...} shape this
              // main has always written; a nested brace means the heuristic
              // would miscount — admit ignorance instead
              if (body.contains('{')) -1 else body.count(_ == '"') / 2
            }
          }
      }
    } catch {
      case _: java.io.IOException => -1
      case _: NumberFormatException => -1
    }
    // each sentinel block records the retry threshold it ran under —
    // thresholds have changed across rounds (MT 40% idle-base -> 18%
    // loaded-base in r13), so a future artifact-keep compare can
    // normalize a past run by the scale it was actually certified on
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","quiet_equiv_sec":$quietEquiv,"n_keys":$nKeys,"per_key_quiet_sec":$perKeyQuiet,"n_keys_prev":$nKeysPrev,"head":"$head","retried":$retr,"sentinel":{"spin_base_sec":$spinBase,"samples":$sent,"max_dev_pct":$maxDevPct,"max_slow_pct":$maxSlowPct,"retry_dev_pct":$RetryDevPct},"sentinel_mt":{"threads":$mtThreads,"spin_base_sec":$spinMtBase,"samples":$sentMt,"max_dev_pct":$maxDevMtPct,"max_slow_pct":$maxSlowMtPct,"retry_dev_pct":$RetryDevPctMt}}"""
    println(json)
    // Persist the COMPLETE artifact (the driver records only a truncated
    // stdout tail) — routed through the ARTIFACT GUARD (scaladoc rule 4):
    // a protocol-invalid run NEVER lands at the main artifact, and a
    // same-HEAD quieter run is never replaced by a noisier one (the
    // committed file is the record the ≤2x-of-baseline bar is judged
    // against; BENCH_r09 showed one contended end-of-round run can
    // otherwise overwrite a clean one, and r12–r15 showed a fresh HEAD
    // doing the same four rounds running).
    val out = prevArtifact // same target the n_keys_prev delta read
    // only the file READ gets a fallback (unreadable prev = treat as
    // absent); the guard itself runs unguarded so a bug in it surfaces
    // instead of silently re-opening the overwrite hole
    val prevJson = try {
      val p = java.nio.file.Paths.get(out)
      if (java.nio.file.Files.exists(p))
        Some(java.nio.file.Files.readString(p))
      else None
    } catch { case _: java.io.IOException => None }
    val (target, why) = artifactTarget(out, prevJson, head, retried.size,
      maxSlowPct, maxSlowMtPct, RetryDevPct, RetryDevPctMt, spinBase)
    why.foreach(w =>
      System.err.println(s"[bench] keeping $out ($w); this run -> $target"))
    try java.nio.file.Files.write(java.nio.file.Paths.get(target),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $target: ${e.getMessage}") }
    // the compact summary is the LAST stdout line — the one the driver's
    // ~2 KB tail can actually parse (VERDICT r17 #1); per-key maps are in
    // the artifact file it names
    println(compactLine(total, quietEquiv, nKeys,
      results.count(_._2 < 0), head, retried.size,
      maxSlowPct, maxSlowMtPct, spinBase, spinMtBase, sfDir, target))
    spark.stop()
  }
}
