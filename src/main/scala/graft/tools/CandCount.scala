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
    require(args.nonEmpty, "usage: CandCount <sfDir> [threshold]")
    val dir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.9
    val spark = Session.get("graft-candcount")
    spark.sparkContext.setLogLevel("WARN")
    val n = DedupOps.prefixCandidates(spark, dir, t).count()
    println(f"[cand] threshold=$t%.2f candidates=$n  dir=$dir")
    spark.stop()
  }
}
