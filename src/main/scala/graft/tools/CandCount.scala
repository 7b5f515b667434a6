package graft.tools

import graft.Session
import graft.operators.DedupOps

/** Print the d07 prefix-kernel CANDIDATE volume (pre-verify pair rows)
  * at a scale dir — the denominator that separates the two remaining
  * sf10 perf-watch hypotheses: if candidates grow ≫ true pairs per
  * decade, the prefix self-join leaks cross-replica via base-word
  * prefixes (docs whose rarity prefix falls back to unperturbed words);
  * if candidates track true pairs (~11×/decade), the cost is verify CPU
  * and the watch moves there.
  *
  * Usage: tools/run.sh graft.tools.CandCount <sfDir> [threshold]
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CandCount <sfDir> [threshold] [containment]")
    val dir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.9
    val spark = Session.get("graft-candcount")
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "containment") {
      // d09 kernel: distinct candidate pairs vs pre-collapse join rows
      // (sum of per-pair shared-prefix multiplicity) — the ratio is the
      // byte factor a map-side combine saves off the pair exchange
      import org.apache.spark.sql.functions._
      val r = DedupOps.containmentCandidates(spark, dir, t)
        .agg(count(lit(1)).as("pairs"),
          sum(col("n_shared_prefix")).as("joinRows")).head()
      println(f"[cand] threshold=$t%.2f containment pairs=${r.getLong(0)} " +
        f"join_rows=${r.getLong(1)} " +
        f"multiplicity=${r.getLong(1).toDouble / r.getLong(0)}%.2f  dir=$dir")
    } else {
      val n = DedupOps.prefixCandidates(spark, dir, t).count()
      println(f"[cand] threshold=$t%.2f candidates=$n  dir=$dir")
    }
    spark.stop()
  }
}
