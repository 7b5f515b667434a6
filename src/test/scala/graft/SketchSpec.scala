package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the mergeable HLL distinct sketch (e17): the register-max
  * union invariant that makes per-day sketch persistence sound, and the
  * estimate's accuracy at a cardinality the real fixture never reaches.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("union of per-shard sketches is bit-identical to the direct sketch, any sharding") {
    import spark.implicits._
    val df = (1 to 20000).map(i => ((i * 2654435761L) % 9973, i % 13)).toDF("v", "shard")
    df.createOrReplaceTempView("sk_t")
    val direct = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(v, 12)) FROM sk_t")
      .collect()(0).getLong(0)
    for (shardExpr <- Seq("shard", "v % 7", "abs(hash(v)) % 31")) {
      val merged = spark.sql(
        s"""SELECT hll_sketch_estimate(hll_union_agg(sk, false)) FROM
            (SELECT $shardExpr AS g, hll_sketch_agg(v, 12) AS sk
             FROM sk_t GROUP BY 1)""").collect()(0).getLong(0)
      assert(merged === direct, s"sharding by $shardExpr changed the estimate")
    }
  }

  test("estimate within 5% of a known 50k cardinality at lgK=12") {
    import spark.implicits._
    val n = 50000
    (1 to n).map(i => i.toLong).toDF("v").createOrReplaceTempView("sk_u")
    val est = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(v, 12)) FROM sk_u")
      .collect()(0).getLong(0)
    assert(math.abs(est - n).toDouble / n <= 0.05, s"estimate $est for true $n")
  }

  test("e17 booleans all true on real data (the oracle states them as literals)") {
    val rows = Queries.byName("e17_sketch_distinct")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"sketch gate failed for ${r.getString(0)}")
    }
  }
}
