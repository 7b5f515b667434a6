package graft.tools

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
  * Opt-out for the sub-second dev loop: SPARK_GRAFT_BRACKET=0.
  */
object CanaryBracket {
  /** Where the q01 probe reads from — overridable for boxes whose
    * fixtures live elsewhere. The kernel probe is path-independent. */
  val CanarySfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_CANARY_DIR", "/root/testdata/sf0.1")

  def enabled: Boolean =
    !sys.env.get("SPARK_GRAFT_BRACKET").exists(v => v == "0" || v == "false")

  /** One probe: (q01 seconds, kernel seconds), each min over `runs`
    * noop-sink materializations (pre-position callers use runs=3 so the
    * JIT-cold first sample is discarded by the min; post-position the
    * JVM is warm and runs=2 suffices). A missing canary dir must not
    * turn a working timing invocation into a crash: the q01 probe is
    * skipped with a warning (reported as −1) and the path-independent
    * kernel probe still runs. */
  def probe(spark: SparkSession, runs: Int): (Double, Double) = {
    val qmin =
      if (!new java.io.File(CanarySfDir).isDirectory) {
        println(s"[bracket] WARN q01 canary dir $CanarySfDir missing " +
          "(set SPARK_GRAFT_CANARY_DIR); q01 probe skipped")
        -1.0
      } else {
        val q01 = graft.Queries.byName("q01_pricing_summary")
        def q01Once(): Double = {
          val t0 = System.nanoTime()
          q01.build(spark, CanarySfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        (1 to runs).map(_ => q01Once()).min
      }
    val ks = (1 to runs).map(_ => KernelCanary.timeOnce(spark))
    (qmin, ks.min)
  }

  def json(pre: (Double, Double), post: (Double, Double)): String =
    f""""canary_pre":{"q01":${pre._1}%.3f,"kernel":${pre._2}%.3f},""" +
      f""""canary_post":{"q01":${post._1}%.3f,"kernel":${post._2}%.3f}"""
}
