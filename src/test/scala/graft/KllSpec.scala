package graft

import graft.functions.KllAgg._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins the KLL quantile-sketch family: exactness below k retained
  * values, the published rank-error bound at 50k values under several
  * partitionings (KLL compaction is randomized, so the bound — not
  * bit-equality — is the contract, asserted here deliberately), union
  * ≈ direct, and null/empty semantics. */
class KllSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("below k the sketch is exact: quantiles are actual data values at exact ranks") {
    import spark.implicits._
    val xs = (1 to 101).map(_.toDouble)
    val df = new Random(1).shuffle(xs).toDF("v").repartition(5)
    val row = df.agg(kll_agg(col("v")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5)),
        kll_quantile(col("sk"), lit(0.0)), kll_quantile(col("sk"), lit(1.0)))
      .head()
    assert(row.getDouble(0) == 51.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 101.0)
  }

  test("rank error stays within the k=200 bound at 50k values, any partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    val xs = Seq.fill(50000)(rnd.nextGaussian() * 10 + 100)
    val sorted = xs.sorted
    for (nPart <- Seq(1, 4, 17)) {
      val df = xs.toDF("v").repartition(nPart)
      val row = df.agg(kll_agg(col("v")).as("sk"))
        .select(kll_quantile(col("sk"), lit(0.5)),
          kll_quantile(col("sk"), lit(0.95))).head()
      val r50 = sorted.count(_ <= row.getDouble(0)).toDouble / xs.size
      val r95 = sorted.count(_ <= row.getDouble(1)).toDouble / xs.size
      assert(math.abs(r50 - 0.5) <= 0.025, s"nPart=$nPart r50=$r50")
      assert(math.abs(r95 - 0.95) <= 0.025, s"nPart=$nPart r95=$r95")
    }
  }

  test("union of per-shard sketches answers like a directly-built sketch") {
    import spark.implicits._
    val rnd = new Random(11)
    val xs = (1 to 30000).map(_ => rnd.nextDouble() * 1000)
    val sorted = xs.sorted
    val df = xs.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("shard", "v")
    val unioned = df.groupBy("shard").agg(kll_agg(col("v")).as("sk"))
      .agg(kll_union_agg(col("sk")).as("sk"))
      .select(kll_quantile(col("sk"), lit(0.5))).head().getDouble(0)
    val r = sorted.count(_ <= unioned).toDouble / xs.size
    assert(math.abs(r - 0.5) <= 0.025, s"union rank=$r")
    // kll_rank agrees with the exact rank within the same bound
    val viaRank = df.agg(kll_agg(col("v")).as("sk"))
      .select(kll_rank(col("sk"), lit(sorted(sorted.size / 2)))).head().getDouble(0)
    assert(math.abs(viaRank - 0.5) <= 0.025, s"kll_rank=$viaRank")
  }

  test("the sketch family is SQL-registered via GraftExtensions") {
    val q = spark.sql(
      "SELECT kll_quantile(kll_agg(cast(id as double), 100), 0.5) AS q," +
        " kll_rank(kll_agg(cast(id as double), 100), 500.0) AS r," +
        " mg_sketch(cast(id % 7 as string), 3).total AS t" +
        " FROM range(1000)").head()
    assert(math.abs(q.getDouble(0) - 500.0) <= 25.0)
    assert(math.abs(q.getDouble(1) - 0.5) <= 0.025)
    assert(q.getLong(2) == 1000L)
    // rollup direction: per-shard sketches unioned in SQL
    val u = spark.sql(
      "SELECT kll_quantile(kll_union_agg(sk, 100), 0.5) AS q FROM " +
        "(SELECT id % 5 AS shard, kll_agg(cast(id as double), 100) AS sk " +
        " FROM range(1000) GROUP BY 1)").head()
    assert(math.abs(u.getDouble(0) - 500.0) <= 25.0)
  }

  test("nulls are skipped; an all-null group yields NULL quantiles") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(kll_agg(col("v")).as("sk"))
      .select(col("g"), kll_quantile(col("sk"), lit(0.5)).as("q"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows("a").contains(1.0) || rows("a").contains(3.0))
    assert(rows("b").isEmpty)
  }

  private def chainMsgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("out-of-range ranks and non-KLL blobs fail with named errors, not raw executor internals") {
    import spark.implicits._
    val sk = Seq(1.0, 2.0, 3.0).toDF("v").agg(kll_agg(col("v")).as("sk"))
    for (bad <- Seq(1.5, -0.1, Double.NaN)) {
      val e = intercept[Throwable] {
        sk.select(kll_quantile(col("sk"), lit(bad))).collect()
      }
      assert(chainMsgs(e).contains("kll_quantile: normalized rank"),
        s"rank $bad: ${chainMsgs(e)}")
    }
    // a BINARY column that is not a KLL sketch: named error citing the
    // calling function, not a SketchesArgumentException stack
    val junk = Seq(Array[Byte](7, 7, 7, 7)).toDF("sk")
    val e = intercept[Throwable] {
      junk.select(kll_quantile(col("sk"), lit(0.5))).collect()
    }
    assert(chainMsgs(e).contains("not a valid KLL"), chainMsgs(e))
    val e2 = intercept[Throwable] {
      junk.select(kll_rank(col("sk"), lit(1.0))).collect()
    }
    assert(chainMsgs(e2).contains("kll_rank"), chainMsgs(e2))
  }
}
