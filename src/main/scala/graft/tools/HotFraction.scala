package graft.tools

import graft.Session
import graft.core.Materialize.MatOps
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Measure the LSH hot-bucket routing split on a corpus: how many docs
  * the derived cutoff sends through the exact prefix kernel vs the
  * banding layer, plus an end-to-end d02 timing. The scale-evidence
  * companion to DedupHotBucketSpec — run it against the template-heavy
  * ScaleUp fixture and a BenignCorpus fixture to ledger both regimes.
  *
  * Usage: `tools/run.sh graft.tools.HotFraction <sfDir> [threshold]`
  */
object HotFraction {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HotFraction <sfDir> [threshold]")
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.9
    val spark = Session.get("graft-hot-fraction")
    try {
      val (bands0, numBands) = DedupOps.lshBands(spark, dir, threshold)
      val bands = bands0.materialize
      val bucketSizes = bands.groupBy("band", "bh")
        .agg(count(lit(1)).as("bn")).materialize
      val nDocs = bands.select("doc_id").distinct().count()
      val cutoff = DedupOps.deriveMaxBucket(bucketSizes, numBands)
      val maxLoad = bucketSizes.agg(max("bn")).head.getLong(0)
      val hot = bands.join(
          bucketSizes.filter(col("bn") > cutoff).select("band", "bh"),
          Seq("band", "bh"))
        .select("doc_id").distinct().count()
      println(f"[hotfraction] dir=$dir t=$threshold nDocs=$nDocs " +
        f"derivedCutoff=$cutoff maxBucketLoad=$maxLoad " +
        f"hotDocs=$hot hotFraction=${hot.toDouble / nDocs}%.4f")
      val t0 = System.nanoTime()
      DedupOps.nearDupPairs(spark, dir, threshold)
        .write.mode("overwrite").format("noop").save()
      println(f"[hotfraction] d02 end-to-end: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } finally spark.stop()
  }
}
