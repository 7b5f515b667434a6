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

  private val bytesRead = new AtomicLong()
  private val recordsRead = new AtomicLong()
  private val bytesWritten = new AtomicLong()
  private val recordsWritten = new AtomicLong()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val id = e.stageId
    stageDone.putIfAbsent(id, new AtomicLong())
    stageFailed.putIfAbsent(id, new AtomicLong())
    if (e.reason == org.apache.spark.Success) stageDone.get(id).incrementAndGet()
    else stageFailed.get(id).incrementAndGet()
    // ingest/egest byte counters (reference S4: FileTask percent for
    // store/retrieve — file_operation.ex:48-50, models/file_task.ex:43-58).
    // Task metrics are the per-split analog of the reference's per-chunk
    // counter; summing them as tasks finish gives the same monotonic
    // percent signal, polled while a read or write job runs.
    Option(e.taskMetrics).foreach { m =>
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
    }
  }

  final case class IngestProgress(bytesRead: Long, recordsRead: Long,
      bytesWritten: Long, recordsWritten: Long) {
    /** FileTask-style percent of an expected byte total (store = expected
      * output size, retrieve = source file size). */
    def percentOf(expectedBytes: Long, written: Boolean = true): Double =
      if (expectedBytes <= 0) 100.0
      else math.min(100.0,
        (if (written) bytesWritten else bytesRead) * 100.0 / expectedBytes)
  }

  /** Cumulative IO counters across finished tasks. */
  def ingest(): IngestProgress =
    IngestProgress(bytesRead.get(), recordsRead.get(),
      bytesWritten.get(), recordsWritten.get())

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
