package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point to every range containing it,
  * with NO equi-key. The reference engine has no such operator; Spark's
  * planner turns a bare theta-join into BroadcastNestedLoopJoin (fine only
  * when one side is tiny) or a cartesian product (never fine).
  *
  * The scale path implemented here is the standard binning trick (as used
  * by the interval-join implementations in Flink and in Spark range-join
  * extensions): quantize the value axis into fixed-width bins, explode
  * each range into the bins it overlaps, equi-join point-bin to range-bin,
  * then apply the exact containment predicate. Cost is
  * O(points + ranges × spanBins) shuffled through ONE hash join — both
  * sides can be arbitrarily large, and AQE's skew handling applies to hot
  * bins. Bin width tunes the explode factor vs candidate-filter
  * selectivity: width ≈ median range span keeps both ~O(1).
  */
object RangeJoinOps {

  /** Join `points` to the `ranges` rows whose [loCol, hiCol) interval
    * contains `pointCol`, via bin-explode + equi-join (never a nested
    * loop). Output = point columns ++ range columns. */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // a range overlaps every bin from floor(lo/W) to floor(hi/W); a
    // trailing bin made empty by hi's exclusivity is dropped by the exact
    // predicate below, so over-covering the boundary is harmless
    val rng = ranges.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pts.join(rng, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  // ---------------------------------------------------------------- j01
  /** Overlapping price-band profile: parts joined to 131 bands of width
    * 15 on a stride of 10 (each price falls in 1-2 bands — a genuine
    * interval join, not a bucketing). The oracle runs the same join as a
    * plain theta-join; the Spark side goes through [[binnedRangeJoin]],
    * and RangeJoinSpec pins that the physical plan is a hash/merge join
    * on the bin key, not a nested loop. */
  val j01 = Q("j01_range_join_binned",
    (s, dir) => {
      val bands = s.range(85, 216).select(
        col("id").as("band_id"),
        (col("id") * 10).cast("double").as("lo"),
        (col("id") * 10 + 15).cast("double").as("hi"))
      binnedRangeJoin(
        Tables.df(s, dir, "part").select("p_partkey", "p_retailprice"),
        "p_retailprice", bands, "lo", "hi", binWidth = 10.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"),
          round(avg("p_retailprice"), 2).as("avg_price"))
        .orderBy("band_id")
    },
    Some("""
      SELECT b.band_id, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
      FROM (SELECT range AS band_id, range * 10.0 AS lo, range * 10.0 + 15 AS hi
            FROM range(85, 216)) b
      JOIN part p ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
      GROUP BY b.band_id
      ORDER BY b.band_id"""))

  val queries: Seq[Q] = Seq(j01)
}
