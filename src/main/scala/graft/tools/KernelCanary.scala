package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-size kernel canary: a pinned all-pairs-Jaccard microcell (the
  * d07 kernel shape — tokenize → sorted-hash sets → prefix-filter
  * candidate join → exact verify) over a corpus generated
  * deterministically from `spark.range`, independent of
  * `SPARK_GRAFT_SF_DIR` — the same cell byte-for-byte on every box,
  * every scale factor, every round.
  *
  * Purpose (BASELINE.md measurement discipline): q01 canaries scan/agg
  * drift, but the dedup kernel family (d02/d06/d07/p01) is shuffle-,
  * codegen- and memory-pressure-sensitive in ways a 0.4 s parquet scan
  * probe cannot see — round 11 left a "+8.5% at equal q01 canary"
  * ambiguity exactly because the only drift probe was scan-shaped.
  * [[graft.Bench]] times this cell alongside the headline set and
  * reports both canaries; ledger rows normalize scan-shaped queries by
  * q01 and kernel-shaped rows by this probe.
  *
  * Corpus shape: `NumDocs` docs in families of 4 — 50 family-shared
  * tokens + 3 per-doc tokens (J ≈ 50/56 ≈ 0.89 within a family, above
  * the 0.8 verify threshold) over a vocabulary sized so the prefix
  * region also generates a few million cross-family candidate pairs
  * that verify FALSE — both the candidate shuffle and the verify
  * kernel carry real, fixed work.
  */
object KernelCanary {
  val NumDocs = 250000L
  val Vocab = 50000L
  val Threshold = 0.8

  /** The canary frame; all work deferred until an action. */
  def build(spark: SparkSession): DataFrame = {
    val docs = spark.range(NumDocs).select(
      col("id").as("doc_id"),
      expr(
        s"""array_join(concat(
           |  transform(sequence(0, 49),
           |    j -> concat('w', pmod(xxhash64(id div 4 * 2654435761L
           |                                   + j * 1315423911L), $Vocab))),
           |  transform(sequence(0, 2),
           |    j -> concat('w', pmod(xxhash64(id * 97L + j * 7919L
           |                                   + 1234567L), $Vocab)))
           |), ' ')""".stripMargin).as("text"))
    graft.operators.DedupOps.prefixFilterPairsOn(
      graft.operators.DedupOps.hashedWordSetsOf(docs), Threshold)
  }

  /** Time one noop-sink materialization of the cell. */
  def timeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    build(spark).write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Standalone probe: `tools/run.sh graft.tools.KernelCanary [runs]`. */
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.get("graft-kernel-canary")
    spark.sparkContext.setLogLevel("WARN")
    val runs = if (args.nonEmpty) args(0).toInt else 3
    val warm = timeOnce(spark)
    val ts = (1 to runs).map(_ => timeOnce(spark))
    println(f"[canary] kernel min=${ts.min}%.3f cold=$warm%.3f " +
      f"samples=[${ts.map(t => f"$t%.3f").mkString(", ")}] " +
      s"rows=${build(spark).count()}")
    spark.stop()
  }
}
