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

  /** Interval×interval overlap join ([lLo,lHi) overlaps [rLo,rHi) iff
    * lLo < rHi AND rLo < lHi) via the same binning trick — with the
    * complication point-joins don't have: an overlapping pair can share
    * MANY bins. Rather than a distinct-shuffle afterwards, each pair is
    * emitted exactly once structurally: only in the bin containing the
    * overlap's start, max(lLo, rLo) — which both sides provably cover
    * (it lies inside each interval). Cost stays
    * O(Σ spans / binWidth) through one hash join, AQE-skew-safe. */
  def binnedIntervalJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin",
        explode(sequence(floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), "__bin")
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bin") ===
          floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }

  // ---------------------------------------------------------------- j03
  /** Promo-attribution overlap: each order's 7-day fulfilment window
    * [orderdate, +7) overlap-joined to 250 15-day promo windows on a
    * 10-day stride (windows overlap each other, so this is interval ×
    * interval, not bucketing — each order window straddles 1-3 promos).
    * The oracle is the plain theta join; the Spark side goes through
    * [[binnedIntervalJoin]] and RangeJoinSpec pins exactly-once pair
    * emission + the hash-join (not nested-loop) physical plan. */
  val j03 = Q("j03_interval_overlap",
    (s, dir) => {
      val orders = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("o_lo"))
        .withColumn("o_hi", col("o_lo") + 7)
      val promos = s.range(0, 250).select(
        col("id").as("promo_id"),
        (col("id") * 10).cast("long").as("p_lo"),
        (col("id") * 10 + 15).cast("long").as("p_hi"))
      binnedIntervalJoin(orders, "o_lo", "o_hi", promos, "p_lo", "p_hi",
        binWidth = 10.0)
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("promo_id")
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_totalprice,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS o_lo,
               date_diff('day', DATE '1992-01-01', o_orderdate) + 7 AS o_hi
        FROM orders),
      p AS (SELECT range AS promo_id, range * 10 AS p_lo,
                   range * 10 + 15 AS p_hi
            FROM range(0, 250))
      SELECT promo_id, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM o JOIN p ON o.o_lo < p.p_hi AND p.p_lo < o.o_hi
      GROUP BY promo_id
      ORDER BY promo_id"""))

  val queries: Seq[Q] = Seq(j01, j03)
}
