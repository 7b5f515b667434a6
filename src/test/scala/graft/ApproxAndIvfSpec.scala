package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounds for the operators without SQL oracles added late in round 1:
  * sketch aggregates must land near exact values; IVF ANN must return
  * valid neighbors with sane recall against brute force. */
class ApproxAndIvfSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of exact; approx median within range") {
    // the genuinely-approximate sketch variant (catalog q26 runs the
    // oracle-exact form: exact distincts + exact-accuracy percentile)
    val approx = Tables.df(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = Tables.df(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (o, p, m)) =>
      val (ao, ap, am) = approx(k)
      assert(math.abs(ao - o).toDouble / o < 0.10, s"$k orders: $ao vs $o")
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k parts: $ap vs $p")
      assert(math.abs(am - m) / m < 0.10, s"$k median: $am vs $m")
    }
  }

  test("IVF ANN returns 5 valid ranked neighbors per query with recall vs brute force") {
    val ivf = Queries.byName("s03_ann_ivf").build(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = Queries.byName("s01_cosine_topk").build(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(ivf.keySet == (0L until 5L).toSet)
    ivf.foreach { case (q, ns) => assert(ns.size == 5 && !ns.contains(q)) }
    // probing 2 of 8 cells: demand at least some overlap with true top-5
    val recall = brute.keys.map(q => (ivf(q) & brute(q)).size).sum / 25.0
    assert(recall >= 0.2, s"IVF recall $recall vs brute force")
  }
}
