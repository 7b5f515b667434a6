package graft.progress

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentHashMap

/** Scan-riding audit metrics via Spark's `observe()` API — the
  * zero-extra-pass complement to the v01 expectation queries: v01 ANSWERS
  * the audit question with its own aggregate job, while an observation
  * rides whatever job the pipeline already runs (the partial aggregates
  * travel with each task), so at 100 TB the audit is free. The reference's
  * `job_info` counters (`lib/mini_hadoop/models/job_execution.ex:10-23`)
  * track task progress; observations extend the same idea to DATA-level
  * counters (rows, nulls, violation counts) without a second scan.
  *
  * Usage: `observed(df, "lineitem_audit", count(lit(1)).as("rows"), ...)`
  * then run any action on the returned frame with a [[MetricsCollector]]
  * registered; `collector.get("lineitem_audit")` yields the metric row.
  * Constraint inherited from `observe`: metric expressions must be
  * aggregates with no DISTINCT and no grouping — exactly the v01 class of
  * conditional counts.
  */
object QueryMetrics {

  /** Attach named observation metrics to a frame (no plan change beyond
    * the CollectMetrics node; the frame computes exactly what it did).
    * The first metric is a required parameter, so the empty-metrics
    * misuse cannot compile. */
  def observed(df: DataFrame, name: String, first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** QueryExecutionListener that captures every observation emitted by
    * completed queries, keyed by observation name. Register with
    * `spark.listenerManager.register(c)`; thread-safe; last write wins
    * per name (re-running a query refreshes its audit row). */
  final class MetricsCollector extends QueryExecutionListener {
    private val seen = new ConcurrentHashMap[String, Map[String, Any]]()

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        val cols = row.schema.fieldNames
        seen.put(name, cols.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    /** The last captured metric row for an observation name, if any. */
    def get(name: String): Option[Map[String, Any]] = Option(seen.get(name))
  }
}
