package graft

/** Prints the formatted physical plan for each headline query plus key
  * plan-quality signals (pushdown, broadcast, partial agg, codegen spans).
  * Diagnostic main, used to keep BASELINE.md honest.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Session.get("graft-plan-audit")
    val names = if (args.nonEmpty) args.toSeq
      else Queries.all.filter(_.headline).map(_.name)
    names.foreach { n =>
      val df = Queries.byName(n).build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"========== $n ==========")
      val signals = Seq(
        "PushedFilters" -> "pushdown",
        "BroadcastHashJoin" -> "broadcast-join",
        "partial_" -> "partial-agg",
        "TakeOrderedAndProject" -> "topk",
        "codegen id" -> "codegen",
        "SortMergeJoin" -> "sort-merge-join",
        "CartesianProduct" -> "CARTESIAN!",
        "BroadcastNestedLoopJoin" -> "bnl-join")
      println("signals: " + signals.collect {
        case (k, label) if plan.contains(k) => label
      }.mkString(", "))
      println(plan)
    }
    spark.stop()
  }
}
