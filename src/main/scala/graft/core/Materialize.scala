package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The engine's single intra-query materialization strategy point.
  *
  * Every multi-consumer or iterative frame in the engine (LSH band
  * frames, hashed word sets, connected-components label frames,
  * PageRank ranks, ...) must be materialized eagerly before fan-out:
  * the consumers sit in parallel stages of one action and would
  * otherwise each recompute the full upstream pipeline (measured 2×
  * stage time on d02's sketch frame). HOW it is materialized is a
  * deployment decision, made once here rather than at 30 call sites:
  *
  *  - `graft.materialize=local` (default): eager `localCheckpoint` —
  *    lineage is truncated and blocks live UNREPLICATED on executors.
  *    Fastest option and exactly right for local[N] benchmarking, but
  *    on a preemptible/failing cluster a lost executor makes the
  *    truncated RDD unrecomputable and fails the job.
  *  - `graft.materialize=reliable`: a parquet round-trip under
  *    `graft.scratchDir` (set it to a shared filesystem on a real
  *    cluster). The intermediate survives any executor loss — Spark
  *    re-reads lost partitions from storage — restoring the complete
  *    fault-tolerance story the engine pins against the reference's
  *    silent-partial job runner (FaultToleranceSpec; the reference
  *    drops missing partitions at `job_runner.ex:221-231`). Parquet
  *    rather than `RDD.checkpoint` on purpose: checkpoint blocks
  *    reused across SQL executions reference the first execution's
  *    metric accumulators, which the ContextCleaner can collect in
  *    between (measured: a 48.6 s retry storm on g01) — a plain scan
  *    has no such coupling.
  *
  * Scratch intermediates are deleted on JVM shutdown (per-base hook,
  * via the filesystem that owns the path, so shared-FS scratch dirs
  * are cleaned too).
  */
object Materialize {
  /** "local" (eager localCheckpoint) | "reliable" (parquet round-trip). */
  val ModeKey = "graft.materialize"
  /** Base directory for reliable-mode intermediates; MUST be a shared
    * filesystem on a multi-node cluster. Defaults to a per-application
    * directory under java.io.tmpdir (fine for local[N]). */
  val ScratchKey = "graft.scratchDir"

  private val counter = new AtomicLong(0)
  private val cleanupHooks =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private[graft] def mode(s: SparkSession): String =
    s.conf.getOption(ModeKey)
      // spark.-prefixed alias so the mode can be set from spark-submit /
      // -D system properties (SparkConf only forwards spark.* keys)
      .orElse(s.conf.getOption(s"spark.$ModeKey"))
      .getOrElse("local")

  /** Resolved scratch base for this application (created lazily by the
    * first reliable write; registered for shutdown deletion). */
  private[graft] def scratchBase(s: SparkSession): String = {
    val base = s.conf.getOption(ScratchKey)
      .orElse(s.conf.getOption(s"spark.$ScratchKey"))
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft-scratch") +
      "/" + s.sparkContext.applicationId
    registerCleanup(s, base)
    base
  }

  private def registerCleanup(s: SparkSession, base: String): Unit =
    cleanupHooks.getOrElseUpdate(base, {
      val hconf =
        new org.apache.hadoop.conf.Configuration(s.sparkContext.hadoopConfiguration)
      sys.addShutdownHook {
        try {
          val p = new Path(base)
          p.getFileSystem(hconf).delete(p, true)
        } catch { case _: Throwable => () } // best-effort cleanup
      }
      true
    })

  /** Reserve a fresh scratch path (reliable intermediates, shared pair
    * graph, ...) — unique per call, cleaned up on shutdown. */
  private[graft] def freshScratchPath(s: SparkSession, hint: String): String =
    s"${scratchBase(s)}/$hint-${counter.incrementAndGet()}"

  def apply(df: DataFrame): DataFrame = apply(df, "mat")

  def apply(df: DataFrame, hint: String): DataFrame = {
    val s = df.sparkSession
    mode(s) match {
      case "reliable" =>
        val p = freshScratchPath(s, hint)
        df.write.mode("overwrite").parquet(p)
        s.read.parquet(p)
      case _ => df.localCheckpoint() // eager: consumers race a lazy one
    }
  }

  /** Materialize with aggregate metrics riding the SAME action as a
    * CollectMetrics observation (guide §2.6 — fewer sequential driver
    * actions): the checkpoint/write tasks already see every row, so a
    * row-count / byte-estimate / convergence aggregate over the frame
    * must not pay a second scheduled job plus its fixed driver/AQE
    * latency (the r16 profile: over half the d-kernel wall at bench SF
    * is inter-action gaps). Returns the materialized frame plus the
    * observed metric values keyed by alias. Works in both modes: the
    * localCheckpoint and the parquet write are each one action over the
    * observed plan (verified on Spark 4.1.2). */
  def observed(df: DataFrame, hint: String,
      metrics: Seq[Column]): (DataFrame, Map[String, Any]) = {
    require(metrics.nonEmpty, "observed() needs at least one metric")
    val s = df.sparkSession
    val obs = org.apache.spark.sql.Observation()
    val withObs = df.observe(obs, metrics.head, metrics.tail: _*)
    val out = mode(s) match {
      case "reliable" =>
        val p = freshScratchPath(s, hint)
        withObs.write.mode("overwrite").parquet(p)
        s.read.parquet(p)
      case _ => withObs.localCheckpoint()
    }
    // Env-gated FINAL-plan dump (`SPARK_GRAFT_MAT_EXPLAIN=1`): after the
    // action, the AdaptiveSparkPlan is final — the only view that shows
    // runtime ReusedExchange / AQEShuffleRead decisions (plans evidence;
    // diagnostic only).
    if (sys.env.contains("SPARK_GRAFT_MAT_EXPLAIN")) {
      println(s"===== materialize[$hint] executed plan =====")
      println(withObs.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    if (sys.env.contains("SPARK_GRAFT_OBS_DEBUG")) {
      val t0 = System.nanoTime()
      val m = obs.get
      println(f"[obs-debug] $hint get-wait ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      (out, m)
    } else
      (out, obs.get) // the materialize was eager, so get() has its metrics
  }

  /** Postfix syntax so call sites read like the `.localCheckpoint()`
    * they replace: `frame.materialize` / `frame.materialize("bands")`. */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = Materialize(df)
    def materializeAs(hint: String): DataFrame = Materialize(df, hint)
    def materializeObserved(metrics: Column*): (DataFrame, Map[String, Any]) =
      Materialize.observed(df, "mat", metrics)
  }
}
