package graft.tools

import graft.Session
import graft.operators.DedupOps

/** Print the near-dup pair-graph edge count at a threshold — the
  * denominator for scale-evidence ratios on the graph family (an
  * operator can only be judged super/sub-linear against the EDGE
  * volume its fixture actually presents, and the ScaleUp fixture's
  * cross-replica twins sit at J≈0.74: below the 0.9 dedup threshold
  * by design, but ABOVE g04/g05's 0.7 threshold, so the 0.7 graph
  * grows quadratically in replicas by construction).
  *
  * Usage: tools/run.sh graft.tools.EdgeCount <sfDir> [threshold...]
  */
object EdgeCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EdgeCount <sfDir> [threshold...]")
    val dir = args(0)
    val ts = if (args.length > 1) args.drop(1).toSeq.map(_.toDouble)
      else Seq(0.9, 0.7)
    val spark = Session.get("graft-edgecount")
    spark.sparkContext.setLogLevel("WARN")
    ts.foreach { t =>
      val n = DedupOps.sharedPairGraph(spark, dir, t).count()
      println(f"[edges] threshold=$t%.2f pairs=$n  dir=$dir")
    }
    spark.stop()
  }
}
