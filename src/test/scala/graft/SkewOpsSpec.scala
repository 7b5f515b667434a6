package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("saltedJoin equals the plain join on heavily skewed data") {
    import spark.implicits._
    // 90% of the big side hits key 1
    val big = spark.range(0, 10000).select(
      when(col("id") % 10 < 9, 1L).otherwise(col("id") % 7 + 2).as("k"),
      col("id").as("payload"))
    val small = (1L to 8L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, "k")
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key across shuffle partitions") {
    import spark.implicits._
    val big = spark.range(0, 1000).select(lit(1L).as("k"), col("id").as("payload"))
    val salts = big.withColumn("s", SkewOps.saltCol(big, 8))
      .select(countDistinct("s")).as[Long].head()
    assert(salts == 8)
  }

  test("exact-duplicate hot rows spread too, and the join stays exact") {
    import spark.implicits._
    // one partition of 1000 BYTE-IDENTICAL rows: a content-only salt
    // would put all of them on a single salt value
    val big = spark.range(0, 1000).coalesce(1)
      .select(lit(1L).as("k"), lit("same-payload").as("payload"))
    val salts = big.withColumn("s", SkewOps.saltCol(big, 8))
      .select(countDistinct("s")).as[Long].head()
    assert(salts == 8)

    val small = Seq((1L, "dim")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == 1000L)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
