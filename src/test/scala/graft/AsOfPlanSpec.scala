package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join (custom LogicalPlan + SparkStrategy + SparkPlan):
  * semantics on crafted rows, plan shape, and equivalence with the
  * compositional window formulation on generated data. */
class AsOfPlanSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, 10L, "q1-10"), (1L, 20L, "q1-20"), (1L, 30L, "q1-30"),
      (2L, 15L, "q2-15"),
      (4L, 5L, "q4-5")
    ).toDF("q_sym", "q_ts", "quote")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, 5L), (1L, 10L), (1L, 25L), (1L, 99L),
      (2L, 14L), (2L, 16L),
      (3L, 50L)
    ).toDF("sym", "ts")
  }

  test("matches the latest right row at or before each left row, nulls when none") {
    val got = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts")
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(
      (1L, 5L, null), // before the first quote
      (1L, 10L, "q1-10"), // tie: <= matches
      (1L, 25L, "q1-20"),
      (1L, 99L, "q1-30"),
      (2L, 14L, null),
      (2L, 16L, "q2-15"),
      (3L, 50L, null) // key with no right rows at all
    ))
  }

  test("unmatched left rows yield NULL (not 0) for non-nullable right primitives") {
    // quotes comes from toDF ⇒ q_sym/q_ts are non-nullable bigint; the
    // projection must still null-check them for the unmatched-left row
    val row = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts")
      .filter(col("sym") === 3L).collect().head
    assert(row.isNullAt(row.fieldIndex("q_sym")))
    assert(row.isNullAt(row.fieldIndex("q_ts")))
    assert(row.isNullAt(row.fieldIndex("quote")))
    val unmatchedByNull = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts")
      .filter(col("q_ts").isNull).select("sym", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unmatchedByNull == Set((1L, 5L), (2L, 14L), (3L, 50L)))
  }

  test("physical plan uses AsOfJoinExec with co-partitioned sorted children") {
    val df = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts")
    // TreeNode.nodeName strips the Exec suffix in plan strings
    // AdaptiveSparkPlanExec wraps the plan, so check the plan string
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"))
    assert(physical.contains("Exchange hashpartitioning"))
    assert(physical.contains("Sort ["))
  }

  test("agrees with the union+window formulation on generated data") {
    import spark.implicits._
    // deterministic pseudo-random events: 40 keys, ~25 rows each side
    val left = (1 to 1000).map { i =>
      (i.toLong % 40, (i * 2654435761L % 997).abs, i.toLong)
    }.toDF("k", "t", "lid")
    val right = (1 to 1000).map { i =>
      ((i * 7L) % 40, (i * 40503L % 1009).abs, i.toLong + 100000)
    }.toDF("rk", "rt", "rid")
      // dedup ties so "latest right row" is unique on both formulations
      .groupBy("rk", "rt").agg(max("rid").as("rid"))

    val native = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "lid", "rid")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("uk").orderBy("ut", "kind")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val composed = right.select(col("rk").as("uk"), col("rt").as("ut"),
        col("rid"), lit(0).as("kind"), lit(null).cast("long").as("lid"), lit(null).cast("long").as("t"))
      .union(left.select(col("k").as("uk"), col("t").as("ut"),
        lit(null).cast("long").as("rid"), lit(1).as("kind"), col("lid"), col("t")))
      .withColumn("m", last(when(col("kind") === 0, col("rid")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("uk").as("k"), col("t"), col("lid"), col("m").as("rid"))

    val n = native.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val c = composed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(n == c)
    assert(n.size == 1000)
  }

  test("rejects mismatched types and shared attributes") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq(("x", 2L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "t", "rt")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(l, l, "k", "k", "t", "t") // same plan on both sides
    }
  }

  test("forward direction: earliest right at or after, equal time matches") {
    val got = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts",
        direction = "forward")
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(
      (1L, 5L, "q1-10"),
      (1L, 10L, "q1-10"), // tie: >= matches
      (1L, 25L, "q1-30"),
      (1L, 99L, null), // after the last quote
      (2L, 14L, "q2-15"),
      (2L, 16L, null),
      (3L, 50L, null)))
  }

  test("nearest direction: closest in time, ties to the earlier right row") {
    import spark.implicits._
    val q = Seq((1L, 10L, "early"), (1L, 20L, "late"))
      .toDF("q_sym", "q_ts", "quote")
    val t = Seq((1L, 12L), (1L, 15L), (1L, 18L), (1L, 3L), (1L, 40L))
      .toDF("sym", "ts")
    val got = AsOf.join(t, q, "sym", "q_sym", "ts", "q_ts",
        direction = "nearest")
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(1), r.getString(2))).toMap
    assert(got == Map(
      12L -> "early", // |12-10| < |20-12|
      15L -> "early", // equidistant → backward wins
      18L -> "late",
      3L -> "early",  // only a forward candidate
      40L -> "late")) // only a backward candidate
  }

  test("all three directions agree when exactly one candidate exists per left row") {
    import spark.implicits._
    val q = Seq((1L, 10L, "only")).toDF("q_sym", "q_ts", "quote")
    val t = Seq((1L, 10L)).toDF("sym", "ts")
    for (d <- Seq("backward", "forward", "nearest")) {
      val r = AsOf.join(t, q, "sym", "q_sym", "ts", "q_ts", direction = d)
        .select("quote").collect().map(_.getString(0)).toSeq
      assert(r == Seq("only"), s"direction $d")
    }
  }

  test("tolerance nulls matches beyond the bound, inclusive at the boundary") {
    // trades (1,25): backward match q1-20 at distance 5
    val within = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts",
        tolerance = Some(5.0))
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(within.contains((1L, 25L, "q1-20"))) // distance 5 == tol: match
    assert(within.contains((1L, 10L, "q1-10"))) // distance 0
    assert(within.contains((1L, 99L, null)))    // q1-30 is 69 away: nulled
    assert(within.contains((2L, 16L, "q2-15")))

    val tight = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts",
        tolerance = Some(4.0))
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(tight.contains((1L, 25L, null))) // distance 5 > 4: nulled

    // composes with nearest: (1,25) nearest is q1-20 (5) vs q1-30 (5) →
    // tie backward q1-20; tolerance 4 nulls it
    val near = AsOf.join(trades, quotes, "sym", "q_sym", "ts", "q_ts",
        direction = "nearest", tolerance = Some(4.0))
      .select("sym", "ts", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(near.contains((1L, 25L, null)))
    assert(near.contains((1L, 5L, null))) // nearest is q1-10 at distance 5 > 4
  }

  test("a directly-constructed logical node still fails at planning with named errors") {
    import graft.plans.AsOfJoin
    import org.apache.spark.sql.graftbridge.Bridge
    import spark.implicits._
    def chainMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val lp = Bridge.analyzed(Seq((1L, 1L)).toDF("k", "t"))
    val rp = Bridge.analyzed(Seq((1L, 2L, "q")).toDF("k2", "t2", "v"))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    // bypass AsOf.join's API checks (the path a future SQL surface would
    // take): the exec node's own requires must fire at PLANNING, not as
    // an unorderable-runtime-values crash mid-task
    val bad = AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "k2"),
      attr(lp, "t"), attr(rp, "t2"), direction = "sideways")
    val e = intercept[Throwable] { Bridge.ofRows(spark, bad).collect() }
    assert(chainMsgs(e).contains("direction must be"), chainMsgs(e))
    val badTol = AsOfJoin(lp, rp, attr(lp, "k"), attr(rp, "k2"),
      attr(lp, "t"), attr(rp, "t2"), tolerance = Some(-1.0))
    val e2 = intercept[Throwable] { Bridge.ofRows(spark, badTol).collect() }
    assert(chainMsgs(e2).contains("tolerance must be"), chainMsgs(e2))
  }

  test("nearest rejects string time columns; unknown direction rejected") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("k", "t")
    val r = Seq((2L, "b")).toDF("k2", "t2")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "k2", "t", "t2", direction = "nearest")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "k2", "t", "t2", direction = "sideways")
    }
  }
}
