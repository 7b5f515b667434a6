package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the dense-bitmap audience aggregate: OR-merge makes the
  * bitmap bytes partitioning-invariant, the cardinality expressions agree
  * with exact set arithmetic on random data, and out-of-domain ids fail
  * loudly instead of corrupting counts.
  */
class BitmapSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("bitmap bytes are identical under any partitioning; cardinality exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ids = Seq.fill(5000)(rnd.nextInt(4096).toLong)
    val base = ids.toDF("id")
    val bytesOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(expr("dense_bitmap_agg(id, 4096)")).collect()(0).getAs[Array[Byte]](0)
    val b1 = bytesOf(base.repartition(1))
    val b7 = bytesOf(base.repartition(7, col("id")))
    val b13 = bytesOf(base.repartition(13))
    assert(java.util.Arrays.equals(b1, b7) && java.util.Arrays.equals(b1, b13))
    assert(java.util.BitSet.valueOf(b1).cardinality() === ids.distinct.size)
  }

  test("and/or cardinalities equal exact set intersection/union sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(3000)(rnd.nextInt(2048).toLong).distinct
    val b = Seq.fill(3000)(rnd.nextInt(2048).toLong).distinct
    val df = (a.map(_ -> "a") ++ b.map(_ -> "b")).toDF("id", "side")
    val row = df.groupBy("side").agg(expr("dense_bitmap_agg(id, 2048)").as("bm"))
      .groupBy().pivot("side").agg(first("bm"))
      .select(expr("bitmap_and_cardinality(a, b)"),
        expr("bitmap_or_cardinality(a, b)"),
        expr("bitmap_cardinality(a)"))
      .collect()(0)
    assert(row.getLong(0) === a.toSet.intersect(b.toSet).size.toLong)
    assert(row.getLong(1) === a.toSet.union(b.toSet).size.toLong)
    assert(row.getLong(2) === a.size.toLong)
  }

  test("ids outside the dense domain fail loudly, never wrap or drop") {
    import spark.implicits._
    val df = Seq(5L, 100L).toDF("id")
    val err = intercept[Exception] {
      df.agg(expr("dense_bitmap_agg(id, 64)")).collect()
    }
    assert(err.getMessage.contains("outside the dense domain")
      || err.getCause != null && err.getCause.getMessage.contains("outside the dense domain"))
  }

  test("analysis-time rejections: wrong input type, non-literal nBits") {
    import spark.implicits._
    val df = Seq(("x", 1L)).toDF("s", "id")
    intercept[Exception] { df.agg(expr("dense_bitmap_agg(s, 64)")).collect() }
    intercept[Exception] { df.agg(expr("dense_bitmap_agg(id, id)")).collect() }
  }
}
