package graft.progress

import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** JobExecution-style progress reporting (SURVEY §1.4).
  *
  * The reference tracks per-phase `{completed+failed}/total` counters and
  * exposes them via `job_info` polling
  * (`lib/mini_hadoop/models/job_execution.ex:10-23`,
  * `lib/mini_hadoop/models/types.ex:14-17`). Spark's equivalent signal is
  * the listener bus; this listener condenses it to the same shape:
  * per-stage (≈ phase) task counters plus job status, pollable from the
  * driver with `snapshot()`.
  */
final class ProgressListener extends SparkListener {

  final case class PhaseProgress(completed: Long, failed: Long, total: Long) {
    override def toString = s"${completed + failed}/$total" +
      (if (failed > 0) s" ($failed failed)" else "")
  }

  private val stageTotals = new ConcurrentHashMap[Int, Int]()
  private val stageDone = new ConcurrentHashMap[Int, AtomicLong]()
  private val stageFailed = new ConcurrentHashMap[Int, AtomicLong]()
  @volatile private var activeJobs = 0
  @volatile private var completedJobs = 0L
  @volatile private var failedJobs = 0L

  override def onJobStart(e: SparkListenerJobStart): Unit =
    synchronized { activeJobs += 1 }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
    activeJobs -= 1
    e.jobResult match {
      case JobSucceeded => completedJobs += 1
      case _ => failedJobs += 1
    }
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val id = e.stageInfo.stageId
    stageTotals.put(id, e.stageInfo.numTasks)
    stageDone.putIfAbsent(id, new AtomicLong())
    stageFailed.putIfAbsent(id, new AtomicLong())
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val id = e.stageId
    stageDone.putIfAbsent(id, new AtomicLong())
    stageFailed.putIfAbsent(id, new AtomicLong())
    if (e.reason == org.apache.spark.Success) stageDone.get(id).incrementAndGet()
    else stageFailed.get(id).incrementAndGet()
  }

  /** Per-stage progress in the reference's `%{map: {done,total}}` spirit. */
  def snapshot(): Map[Int, PhaseProgress] = {
    import scala.jdk.CollectionConverters._
    stageTotals.asScala.map { case (id, total) =>
      id -> PhaseProgress(
        Option(stageDone.get(id)).map(_.get()).getOrElse(0L),
        Option(stageFailed.get(id)).map(_.get()).getOrElse(0L),
        total.toLong)
    }.toMap
  }

  def jobCounts: (Int, Long, Long) = (activeJobs, completedJobs, failedJobs)
}

object ProgressListener {
  /** Attach a fresh listener to the session's bus and return it. */
  def attach(spark: org.apache.spark.sql.SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
