package graft

import graft.operators.MergeOps
import org.scalatest.funsuite.AnyFunSuite

class MergeOpsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("upsert replaces matched rows, inserts new keys, keeps the rest") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B2", 99.0), (9L, "new", 1.0)).toDF("k", "v", "x")
    val got = MergeOps.upsert(target, updates, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)))
  }

  test("update rows win wholesale, nulls included") {
    import spark.implicits._
    val target = Seq((1L, Some("keep"))).toDF("k", "v")
    val updates = Seq((1L, None: Option[String])).toDF("k", "v")
    val got = MergeOps.upsert(target, updates, "k").collect()
    assert(got.length == 1 && got.head.isNullAt(1))
  }

  test("a null-key update row is kept as an insert, not an all-NULL phantom") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((Option.empty[Long], "orphan")).toDF("k", "v")
    val got = MergeOps.upsert(target, updates, "k")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1))).toSet
    assert(got == Set((Some(1L), "a"), (None, "orphan")))
  }

  test("decimal reprice HALF_UPs exact half-cent products") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100.05 * 1.1 = 110.055 exactly in decimal — a half-cent tie. HALF_UP
    // must give 110.06; the old double-path round() could land on 110.05
    // depending on the engine's rendering of the product.
    val got = Seq(100.05, 99.95, 17.25).toDF("p")
      .select(round(col("p").cast("decimal(18,2)") * lit(BigDecimal("1.1")), 2)
        .cast("double").as("r"))
      .collect().map(_.getDouble(0)).toSeq
    // 110.055 → 110.06, 109.945 → 109.95, 18.975 → 18.98 (all HALF_UP ties)
    assert(got == Seq(110.06, 109.95, 18.98))
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((1L, "a")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      MergeOps.upsert(target, updates, "k")
    }
  }
}
