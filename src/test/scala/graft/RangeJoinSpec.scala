package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoinOps

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("binnedRangeJoin equals the naive theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "x")
    val ranges = (0 until 80).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("rid", "lo", "hi")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val binned = pairs(RangeJoinOps.binnedRangeJoin(points, "x", ranges, "lo", "hi", 5.0))
    val naive = pairs(points.join(ranges, col("x") >= col("lo") && col("x") < col("hi")))
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("physical plan is an equi join on the bin key, not a nested loop") {
    import spark.implicits._
    // both sides large enough that autoBroadcast could not hide a BNL plan
    val points = spark.range(0, 10000).select(col("id").as("pid"),
      (col("id") % 997).cast("double").as("x"))
    val ranges = spark.range(0, 500).select(col("id").as("rid"),
      (col("id") * 2).cast("double").as("lo"),
      (col("id") * 2 + 3).cast("double").as("hi"))
    val joined = RangeJoinOps.binnedRangeJoin(points, "x", ranges, "lo", "hi", 2.0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Join")) // hash or sort-merge equi join on __bin
  }

  test("points on a range boundary respect [lo, hi) semantics") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 25.0), (3L, 24.999)).toDF("pid", "x")
    val ranges = Seq((100L, 10.0, 25.0)).toDF("rid", "lo", "hi")
    val got = RangeJoinOps.binnedRangeJoin(points, "x", ranges, "lo", "hi", 7.0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // 10.0 in, 25.0 (== hi) out
  }

  test("binnedIntervalJoin equals the naive theta join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def intervals(n: Int, prefix: String) = (0 until n).map { i =>
      val lo = rnd.nextDouble() * 90
      // spans up to 25 ≫ binWidth 5 → pairs share many bins, so a
      // dedup failure would show as duplicate rows, not a wrong set
      (i.toLong, lo, lo + 0.5 + rnd.nextDouble() * 25)
    }.toDF(s"${prefix}id", s"${prefix}lo", s"${prefix}hi")
    val a = intervals(120, "a")
    val b = intervals(90, "b")
    val got = RangeJoinOps.binnedIntervalJoin(a, "alo", "ahi", b, "blo", "bhi", 5.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == naive.sorted.toSeq, "multiset equality — no dup emissions")
    assert(got.length == got.toSet.size, "each overlapping pair emitted exactly once")
    assert(got.nonEmpty)
  }

  test("touching half-open intervals do not overlap; 1-unit overlap does") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 10.0)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, 10.0, 20.0), (11L, 9.0, 20.0)).toDF("bid", "blo", "bhi")
    val got = RangeJoinOps.binnedIntervalJoin(a, "alo", "ahi", b, "blo", "bhi", 4.0)
      .select("bid").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L)) // [0,10) ∩ [10,20) = ∅; [0,10) ∩ [9,20) ≠ ∅
  }
}
