package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** The two-canary bracket, mechanized (BASELINE.md measurement
  * discipline): every long decade-cell measurement is bracketed by a
  * (q01 scan, kernel) drift probe BEFORE and AFTER the run, because the
  * box has been measured drifting 1.4× *inside* a 200 s run window —
  * a session-level canary cannot see that. Probes ride in the tool's
  * own output so the discipline cannot be forgotten (r12 kept it only
  * by operator habit, and the round-11 ledger carries two >3× outliers
  * from un-bracketed cells).
  *
  * q01 always runs against the FIXED sf0.1 testdata (its 0.39 s pin),
  * independent of whatever fixture the cell under measurement reads;
  * the kernel cell is fixture-independent by construction. Both probes
  * are min-over-runs in the calling JVM — comparable to the in-Bench
  * pins (warm, interleaved), not to cold fresh-JVM numbers.
  *
  * Each probe also snapshots HOST TELEMETRY (r13 verdict ask #3): the
  * r13 kernel re-pin (6.66 → 8.32) was settled by a worktree A/B, but
  * the "box regime changed" half of that story rested only on the probe
  * values themselves. A regime call needs numbers the probes don't
  * produce: 1-min loadavg (competing work), mean /proc/cpuinfo MHz
  * (frequency scaling), a fixed-work single-thread spin calibration
  * (min-of-3 — the direct "how fast is a core right now" measure, immune
  * to Spark), and cumulative JVM GC ms (post−pre delta = GC inside the
  * bracketed run). BASELINE.md requires these fields on any future
  * canary re-pin.
  *
  * Opt-out for the sub-second dev loop: SPARK_GRAFT_BRACKET=0.
  */
object CanaryBracket {
  /** Where the q01 probe reads from — overridable for boxes whose
    * fixtures live elsewhere. The kernel probe is path-independent. */
  val CanarySfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_CANARY_DIR", "/root/testdata/sf0.1")

  def enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_BRACKET").exists(v => v == "0" || v == "false")

  /** Host-regime snapshot taken alongside each probe. `q01` is None when
    * the canary dir is missing (skipped-with-warning), so the JSON can
    * carry `null` instead of a numeric sentinel that drift tooling would
    * divide through (−1/−1 = a plausible 1.0 ratio). */
  final case class Host(load1: Double, mhz: Double, spinMs: Double,
      gcMs: Long)
  final case class Probe(q01: Option[Double], kernel: Double, host: Host)

  /** Fixed-work single-thread spin: 20M xorshift64 steps, min-of-3.
    * ~25–60 ms per pass on this box — long enough to ride out scheduler
    * jitter, short enough to run six times per bracket. Fixed work means
    * the TIME is the calibration: a 2× slower spin IS a 2× slower core,
    * whatever the cause (contention, frequency, thermal). */
  private val SpinIters = 20000000
  @volatile private var spinSink = 0L // published so the loop can't be DCE'd
  private def spinOnceMs(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < SpinIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    spinSink = x
    ms
  }

  private def readFirstDouble(path: String): Double =
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().next().trim.split("\\s+")(0).toDouble
      finally src.close()
    } catch { case _: Exception => -1.0 }

  private def meanCpuMhz(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try {
        val mhz = src.getLines().filter(_.startsWith("cpu MHz"))
          .map(_.split(":")(1).trim.toDouble).toSeq
        if (mhz.isEmpty) -1.0 else mhz.sum / mhz.size
      } finally src.close()
    } catch { case _: Exception => -1.0 }

  private def gcMs(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum

  def host(): Host = Host(
    load1 = readFirstDouble("/proc/loadavg"),
    mhz = meanCpuMhz(),
    spinMs = (1 to 3).map(_ => spinOnceMs()).min,
    gcMs = gcMs())

  /** One probe: q01 and kernel seconds, each min over `runs` noop-sink
    * materializations (pre-position callers use runs=3 so the JIT-cold
    * first sample is discarded by the min; post-position the JVM is warm
    * and runs=2 suffices), plus the host snapshot. A missing canary dir
    * must not turn a working timing invocation into a crash: the q01
    * probe is skipped with a warning (None → null in JSON) and the
    * path-independent kernel probe still runs. */
  def probe(spark: SparkSession, runs: Int): Probe = {
    val qmin: Option[Double] =
      if (!new java.io.File(CanarySfDir).isDirectory) {
        println(s"[bracket] WARN q01 canary dir $CanarySfDir missing " +
          "(set SPARK_GRAFT_CANARY_DIR); q01 probe skipped")
        None
      } else {
        val q01 = graft.Queries.byName("q01_pricing_summary")
        def q01Once(): Double = {
          val t0 = System.nanoTime()
          q01.build(spark, CanarySfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        Some((1 to runs).map(_ => q01Once()).min)
      }
    val ks = (1 to runs).map(_ => KernelCanary.timeOnce(spark))
    Probe(qmin, ks.min, host())
  }

  /** Render one probe value for the operator's console line. */
  def fmtQ01(p: Probe): String = p.q01.map(v => f"$v%.3f").getOrElse("skipped")

  private def probeJson(p: Probe): String = {
    val q = p.q01.map(v => f"$v%.3f").getOrElse("null")
    f"""{"q01":$q,"kernel":${p.kernel}%.3f,""" +
      f""""host":{"load1":${p.host.load1}%.2f,"mhz":${p.host.mhz}%.0f,""" +
      f""""spin_ms":${p.host.spinMs}%.1f,"gc_ms":${p.host.gcMs}}}"""
  }

  def json(pre: Probe, post: Probe): String =
    s""""canary_pre":${probeJson(pre)},"canary_post":${probeJson(post)}"""
}
