package graft
import org.apache.spark.sql.SparkSession

/** Contention guard for [[Bench]]: a fixed in-memory calibration probe
  * timed before every pass detects when the shared box is busy with
  * something other than the benchmark, so a contended pass can be
  * discarded instead of poisoning the round's numbers (two consecutive
  * rounds shipped 3×-inflated totals that a clean re-run could not
  * reproduce). The probe is pure CPU + scheduler — the same resources a
  * query pass competes for — and takes ~20 ms uncontended. */
object BenchGuard {
  /** Factor over the reference probe time above which a pass counts as
    * contended. Single-probe jitter on an idle box (GC debt left by the
    * previous query, JIT) reaches ~2×; a co-tenant burning the cores
    * inflates 3×+ persistently — observed 31× on the contaminated
    * rounds. 3× with a min-of-2 probe separates the two cleanly. */
  val ContendedFactor = 3.0
  /** Extra passes granted to a query whose scheduled passes were all
    * probe-contended. */
  val MaxExtraPasses = 2
  /** ABSOLUTE probe ceiling (seconds): ~2× the healthy floor observed
    * across every clean round on this box (0.037–0.047 s). The per-pass
    * test is otherwise RELATIVE to the run's best probe, so a box under
    * UNIFORM external load elevates every probe equally and the
    * relative test can never flag it (observed: probe_ref 0.068 s,
    * flagged clean, query times 1.7× inflated). Any probe above this
    * ceiling marks a contended pass regardless of the run-relative
    * comparison. Override via SPARK_GRAFT_PROBE_CEILING on other
    * hardware. */
  val DefaultProbeCeiling = 0.10

  def probeSeconds(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      // fixed work, partitioned across all cores like a real query stage
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("cast(sum(id % 1001) as long) as s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // min of 2: a one-off GC pause hits at most one rep; genuine
    // co-tenant load slows both
    math.min(once(), once())
  }

  def isContended(probe: Double, ref: Double,
      ceiling: Double = DefaultProbeCeiling): Boolean =
    probe > ContendedFactor * ref || probe > ceiling

  /** Pick a query's reported time from (probe, elapsed) pass pairs:
    * the MIN over passes whose probe was clean — the best estimate of
    * the uncontended time. Falls back to the min over everything (and
    * says so) when no pass was clean. */
  def pick(passes: Seq[(Double, Double)], ref: Double,
      ceiling: Double = DefaultProbeCeiling): (Double, Boolean) = {
    val clean = passes.filterNot(p => isContended(p._1, ref, ceiling))
    if (clean.nonEmpty) (clean.map(_._2).min, false)
    else (passes.map(_._2).min, true)
  }

  /** First three fields of /proc/loadavg (1/5/15-min run-queue
    * averages) — recorded in the bench JSON so a contaminated-but-
    * unflagged run is diagnosable after the fact. Empty off-Linux. */
  def loadAvg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).mkString(" ")
      finally src.close()
    } catch { case _: Exception => "" }
}

/** Headline benchmark. Per query: one untimed warmup pass (JIT + codegen
  * + index builds reach steady state), then three timed passes, each
  * preceded by a [[BenchGuard]] calibration probe; a pass whose probe
  * shows a contended box is discarded and re-run (bounded). The reported
  * number is the per-query MIN over clean passes — the statistic least
  * distorted by co-tenant activity; medians and raw pass detail go to
  * bench_out.json. The run stamps "contended" in the JSON whenever any
  * query had no clean pass, so a poisoned round is self-identifying.
  * Failures are recorded under "err" (and excluded from the total),
  * never as a negative time. Persisted intermediates are released
  * between queries so one query's cached blocks can't squeeze execution
  * memory for the next. */
object Bench {
  private val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Optional comma-separated query filter (local iteration only; the
    // driver always runs the full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // calibration: the reference is the fastest probe seen anywhere in
    // the run (startup reps + every per-pass probe), so a contended
    // STARTUP cannot inflate the reference and mask contended passes —
    // flags are recomputed against the global minimum at the end
    var probes = List.empty[Double]
    def probe(): Double = {
      val p = BenchGuard.probeSeconds(spark)
      probes ::= p
      p
    }
    (1 to 5).foreach(_ => probe())
    def runningRef: Double = probes.min

    // STARTUP GATE: the per-pass guard is RELATIVE (vs the run's best
    // probe), so a box that is contended for the WHOLE run can slip
    // through with every pass "clean" against an inflated reference —
    // the shape of the two driver rounds that self-flagged. The probe
    // has an absolute anchor (~20 ms uncontended on this box's 32
    // threads), so a startup whose best-of-5 probes exceeds an absolute
    // ceiling is a contended BOX, not jitter: wait briefly, re-probe,
    // and if it persists REFUSE the run (exit nonzero with a parseable
    // "contended_startup" line) so the driver retries instead of
    // publishing a flagged round.
    val probeCeiling = sys.env.get("SPARK_GRAFT_PROBE_CEILING")
      .map(_.toDouble).getOrElse(BenchGuard.DefaultProbeCeiling)
    val loadavgStart = BenchGuard.loadAvg()
    var gateAttempts = 0
    while (probes.min > probeCeiling && gateAttempts < 3) {
      gateAttempts += 1
      Thread.sleep(2000)
      probes = Nil
      (1 to 5).foreach(_ => probe())
    }
    if (probes.min > probeCeiling) {
      println(s"""{"metric":"error","reason":"contended_startup",""" +
        s""""probe_ref":${probes.min},"ceiling":$probeCeiling,""" +
        s""""attempts":$gateAttempts,"sf":"$sfDir"}""")
      spark.stop()
      sys.exit(1)
    }

    val timed = names.map { name =>
      def run(): Unit = SparkEntry.queries(name)(spark, sfDir).count()
      val (passes, err) =
        try {
          run() // warmup, untimed
          val buf = scala.collection.mutable.Buffer.empty[(Double, Double)]
          var extras = 0
          var i = 0
          while (i < Passes) {
            var p = probe()
            // transiently contended box: give it a moment, bounded
            if (BenchGuard.isContended(p, runningRef, probeCeiling) &&
                extras < BenchGuard.MaxExtraPasses) {
              extras += 1
              Thread.sleep(300)
              p = probe()
            }
            val t0 = System.nanoTime()
            run()
            buf += ((p, (System.nanoTime() - t0) / 1e9))
            i += 1
          }
          (buf.toSeq, None)
        } catch {
          case e: Throwable =>
            (Seq.empty[(Double, Double)], Some(s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(200)))
        } finally {
          // drop this query's persisted blocks before the next one runs
          spark.sharedState.cacheManager.clearCache()
        }
      (name, passes, err)
    }

    def jsonMap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // full JSON string escape incl. control chars: exception messages are
    // routinely multi-line, and a raw \n would both break the one-line
    // stdout contract and make the JSON unparseable
    def jsonStr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val globalRef = probes.min
    val ok = timed.filter(_._3.isEmpty)
    val picked = ok.map { case (n, ps, _) =>
      val (t, dirty) = BenchGuard.pick(ps, globalRef, probeCeiling)
      (n, t, dirty)
    }
    val mins = picked.map { case (n, t, _) => n -> t }
    val medians = ok.map { case (n, ps, _) =>
      n -> ps.map(_._2).sorted.apply(ps.size / 2) }
    val errs = timed.collect { case (n, _, Some(e)) => n -> jsonStr(e) }
    val contended = picked.exists(_._3)
    val total = mins.map(_._2).sum
    // The driver keeps only the LAST 2000 chars of stdout (an sbt
    // "[success] ..." line lands after us inside that window) and parses
    // the JSON from there — rounds 1/3/4 lost their bench numbers because
    // full-precision doubles + a duplicate queries_min map pushed the line
    // past the window and truncated its head. The stdout line therefore
    // carries ONE 3-decimal per-query map (the clean-pass mins); medians,
    // raw passes, and probe detail go to bench_out.json.
    // adaptive precision: 3 decimals unless the line would crowd the
    // 2000-char window (new queries keep joining the suite), then 2
    // probe evidence rides the tracked record itself (BENCH_rN.json is
    // parsed from this line): the reference probe, the picked statistic,
    // and WHICH queries never saw a clean pass — so a contended round's
    // per-query blame survives even after bench_out.json is overwritten
    val contendedNames = picked.collect { case (n, _, true) => n -> "true" }
    def short3(v: Double): String = f"$v%.3f"
    // The suite outgrew the window: a full per-query map no longer fits
    // 1850 chars at any precision. Degrade by EVIDENCE VALUE instead of
    // digits — keep the slowest queries (the ones perf review needs),
    // count the omitted fast tail, and always keep the probe evidence.
    // Full per-query detail stays in bench_out.json.
    val byCost = mins.sortBy(-_._2)
    val json = Iterator.range(byCost.size, -1, -1).map { keep =>
      val kept = byCost.take(keep)
      val omitted = byCost.size - keep
      s"""{"metric":"total","value":${short3(total)},"unit":"sec",""" +
        s""""stat":"min_clean","contended":$contended,""" +
        s""""probe_ref":${short3(globalRef)},""" +
        s""""loadavg":${jsonStr(s"$loadavgStart | ${BenchGuard.loadAvg()}")},""" +
        s""""contended_queries":${jsonMap(contendedNames)},""" +
        s""""queries":${jsonMap(kept.map { case (k, v) => k -> short3(v) })},""" +
        s""""queries_omitted":$omitted,""" +
        s""""err":${jsonMap(errs)},""" +
        s""""sf":"$sfDir"}"""
    }.find(_.length <= 1850).getOrElse(
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_clean",""" +
        s""""contended":$contended,"probe_ref":${short3(globalRef)},""" +
        s""""loadavg":${jsonStr(s"$loadavgStart | ${BenchGuard.loadAvg()}")},""" +
        s""""sf":"$sfDir"}""")
    val passDetail = jsonMap(ok.map { case (n, ps, _) =>
      n -> ps.map { case (p, t) => s"[${short3(p)},${short3(t)}]" }
        .mkString("[", ",", "]")
    })
    val jsonFull = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""passes":$Passes,"stat":"min_clean",""" +
      s""""contended":$contended,"probe_ref":$globalRef,""" +
      s""""loadavg_start":${jsonStr(loadavgStart)},""" +
      s""""loadavg_end":${jsonStr(BenchGuard.loadAvg())},""" +
      s""""probes":${probes.reverse.map(short3).mkString("[", ",", "]")},""" +
      s""""contended_queries":${jsonMap(picked.collect {
        case (n, _, true) => n -> "true" })},""" +
      s""""queries":${jsonMap(mins.map { case (k, v) => k -> v.toString })},""" +
      s""""queries_median":${jsonMap(medians.map { case (k, v) => k -> v.toString })},""" +
      s""""pass_detail":$passDetail,""" +
      s""""err":${jsonMap(errs)},""" +
      s""""sf":"$sfDir"}"""
    // stdout for the driver (unprefixed via run/outputStrategy=StdoutOutput)
    // plus a file copy so a prefix-mangled capture can still be recovered
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), jsonFull + "\n")
    spark.stop()
  }
}
