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
}
