package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale hygiene proof: bucketing both join sides on the join key makes
  * the join shuffle-free (no Exchange above either scan) — the co-located
  * join strategy SURVEY §7's 100 TB stance calls for. On a real cluster
  * this is the difference between re-shuffling the fact table per query
  * and reading it pre-partitioned.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .getOrCreate()

  test("bucketed tables join without an exchange") {
    val li = Tables.df(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.df(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and the result is right
    val n = joined.count()
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(n == expected)

    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE ord_b")
  }

  test("bucketed snapshots make the q43 full-outer diff exchange-free") {
    import graft.operators.MergeOps
    // the q43 fixture shapes: v1 drops every 7th order, v2 drops every
    // 5th and reprices every 3rd — all three diff classes present
    val orders = Tables.df(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val v1 = orders.filter(col("o_orderkey") % 7 =!= 0)
    val v2 = orders.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, round(col("o_totalprice") * 1.1, 2))
          .otherwise(col("o_totalprice")))

    val (b1, b2) = MergeOps.bucketedSnapshots(spark, v1, v2,
      "o_orderkey", 4, "snap_v1_b", "snap_v2_b")
    val diff = MergeOps.snapshotDiff(b1, b2, "o_orderkey")
    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed full-outer diff still shuffles:\n$plan")

    // and the exchange-free plan computes the same diff as the plain one
    val got = diff.collect().map(_.toSeq).toSet
    val want = MergeOps.snapshotDiff(v1, v2, "o_orderkey")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)

    spark.sql("DROP TABLE snap_v1_b"); spark.sql("DROP TABLE snap_v2_b")
  }

  test("repartitioned dataframes reuse partitioning across aggregations") {
    // pre-partitioning by the grouping key removes the aggregation exchange
    val li = Tables.df(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(4, col("l_orderkey"))
    val agg = li.groupBy("l_orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    // exactly one exchange: the explicit repartition; none added for the agg
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
