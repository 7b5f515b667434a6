package graft

import graft.functions.TopKAgg
import graft.operators.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded top-K aggregate against its ground-truth twin (the
  * window formulation it replaced in t12) and bounds the approx-decile
  * bucket skew against exact ntile (t14 vs t09). */
class TopKAggSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("topk_agg kept set is byte-identical to the window formulation") {
    val docs = Tables.df(spark, sf, "documents")
      .withColumn("digest", md5(col("doc_id").cast("string")))
      // many input partitions so partial/merge actually exercises
      .repartition(7)

    val viaWindow = docs
      .withColumn("rk", row_number().over(Window.partitionBy("lang")
        .orderBy(col("digest"), col("doc_id"))))
      .filter(col("rk") <= 30)
      .groupBy("lang")
      .agg(sort_array(collect_list(struct(col("digest"), col("doc_id")))).as("kept"))
      .select(col("lang"), expr("transform(kept, x -> x.doc_id)").as("kept_ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val viaAgg = docs
      .groupBy("lang")
      .agg(TopKAgg.topk_agg(col("digest"), col("doc_id"), 30).as("kept_ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (lang, ids) => assert(ids == viaWindow(lang), s"lang=$lang") }
  }

  test("topk_agg keeps fewer than K when the group is small, ties break by payload") {
    import spark.implicits._
    val df = Seq(("g", "b", 2L), ("g", "a", 9L), ("g", "a", 3L), ("h", "z", 1L))
      .toDF("grp", "s", "p").repartition(3)
    val got = df.groupBy("grp").agg(TopKAgg.topk_agg(col("s"), col("p"), 2).as("kept"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g") == Seq(3L, 9L)) // both "a"s beat "b"; tie a/3 before a/9
    assert(got("h") == Seq(1L))
  }

  test("topk_agg generalizes: long sort key with string payload, double sort key") {
    import spark.implicits._
    // top-2 earliest (long) timestamps keeping string ids
    val df = Seq((1L, 30L, "x"), (1L, 10L, "y"), (1L, 20L, "z"), (2L, 5L, "w"))
      .toDF("grp", "ts", "id").repartition(3)
    val byLong = df.groupBy("grp")
      .agg(TopKAgg.topk_agg(col("ts"), col("id"), 2).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byLong(1L) == Seq("y", "z") && byLong(2L) == Seq("w"))

    // double sort key, long payload, tie on sort broken by payload
    val dd = Seq(("g", 1.5, 7L), ("g", 0.5, 9L), ("g", 0.5, 4L), ("g", 2.5, 1L))
      .toDF("grp", "score", "p").repartition(3)
    val byDouble = dd.groupBy("grp")
      .agg(TopKAgg.topk_agg(col("score"), col("p"), 3).as("kept"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(byDouble("g") == Seq(4L, 9L, 7L))

    // unsupported type still rejected at analysis
    val bad = Seq(("g", Seq(1L), 1L)).toDF("grp", "arr", "p")
    val e = intercept[Exception] {
      bad.groupBy("grp").agg(TopKAgg.topk_agg(col("arr"), col("p"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("topk_agg"))
  }

  test("topk_agg is SQL-registered with literal-k validation") {
    import spark.implicits._
    Seq(("g", "a", 1L)).toDF("grp", "s", "p").createOrReplaceTempView("tk")
    val ok = spark.sql("SELECT grp, topk_agg(s, p, 5) AS kept FROM tk GROUP BY grp")
      .collect()
    assert(ok.head.getSeq[Long](1) == Seq(1L))
    val e = intercept[Exception] {
      spark.sql("SELECT topk_agg(s, p, p) FROM tk GROUP BY grp").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("approx deciles bucket within 50% of the exact ntile size") {
    val t09 = Queries.byName("t09_quality_deciles").build(spark, sf)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val t14 = Queries.byName("t14_quality_deciles_approx").build(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = t09.values.sum
    assert(t14.values.sum == n) // every doc lands in exactly one bucket
    val target = n / 10.0
    t14.foreach { case (d, cnt) =>
      assert(d >= 1 && d <= 10)
      assert(math.abs(cnt - target) <= target * 0.5,
        s"decile $d size $cnt vs exact $target")
    }
  }
}
