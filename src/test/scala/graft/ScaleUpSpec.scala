package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the scale-evidence tooling.
  *
  * [[graft.tools.ScaleUp]] claims two properties that make its fixtures
  * honest scale-ups rather than N identical shards: (1) keys shift per
  * replica so referential integrity holds within every replica and
  * joins never cross replicas; (2) document perturbation keeps
  * duplicate families replica-local — the near-dup pair count scales
  * LINEARLY in N, not quadratically (exact cross-replica twins would
  * manufacture quadratic pair growth and invalidate every dedup
  * scaling measurement taken on the fixture).
  *
  * [[graft.operators.DedupOps.lshBandingFor]] claims its (b, r) choice
  * meets an explicit recall target; the spec re-derives the curve.
  */
class ScaleUpSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-scaleup-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("lshBandingFor sits on the least-volume point meeting the recall target") {
    import operators.DedupOps.lshBandingFor
    assert(lshBandingFor(0.9) == (16, 4))
    // at 0.8, r=3/b=21 misses at 2.9e-7 > target, so r=2 wins
    assert(lshBandingFor(0.8) == (32, 2))
    assert(lshBandingFor(0.7) == (32, 2))
    for (t <- Seq(0.6, 0.7, 0.8, 0.85, 0.9, 0.95)) {
      val (b, r) = lshBandingFor(t)
      val miss = math.pow(1.0 - math.pow(t, r), b)
      assert(b * r <= 64 && miss <= 1e-7,
        s"t=$t -> ($b,$r) misses at rate $miss")
      // least-volume: one more row per band would break the target
      // (unless r is already at the scan cap)
      if (r < 16) {
        val rUp = r + 1
        val missUp = math.pow(1.0 - math.pow(t, rUp), 64 / rUp)
        assert(missUp > 1e-7, s"t=$t: ($b,$r) is not maximal, r=$rUp works")
      }
    }
  }

  test("ScaleUp shifts keys consistently and keeps dup families replica-local") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-scaleup-src").toString
    val dst = Files.createTempDirectory("graft-scaleup-dst").toString
    // two near-dup docs + one unrelated, a 2-customer/2-order star
    Seq(
      (0L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "s0", 100L),
      (1L, ((1 to 29).map(i => s"w$i") :+ "w99").mkString(" "), "en", "s0", 100L),
      (2L, (100 to 130).map(i => s"z$i").mkString(" "), "en", "s1", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$src/documents.parquet")
    Seq((1L, "c1", 1, 10.0, "m"), (2L, "c2", 2, 20.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$src/customer.parquet")
    Seq((10L, 1L, "O", 5.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (11L, 2L, "F", 6.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$src/orders.parquet")
    // empty-but-present remaining tables keep generate() total
    Seq.empty[(Long, Long, Long, Int, Double, Double, Double, Double, String, String, java.sql.Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .coalesce(1).write.parquet(s"$src/lineitem.parquet")
    Seq((1L, "p", "b", "t", 1, 1.0)).toDF("p_partkey", "p_name", "p_brand",
      "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$src/part.parquet")
    Seq((1L, "s", 1, 1.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.parquet(s"$src/supplier.parquet")
    Seq((1, "n", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$src/nation.parquet")
    Seq((1, "r")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.parquet(s"$src/region.parquet")
    Seq((1L, 1L, 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/events.parquet")
    Seq((1L, Seq(0.1f, 0.2f), 0)).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$src/embeddings.parquet")

    val replicas = 3
    tools.ScaleUp.generate(spark, src, dst, replicas)

    // rows scale by N
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    assert(docs.count() == 3L * replicas)
    // FK integrity inside every replica: zero orphan orders
    val orphans = spark.read.parquet(s"$dst/orders.parquet")
      .join(spark.read.parquet(s"$dst/customer.parquet")
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .count()
    assert(orphans == 0L)
    // dup families stay replica-local: the scaled corpus has exactly
    // N× the source's near-dup pairs, and every pair sits inside one
    // replica's key range (stride = max doc_id + 1 = 3)
    val pairs = operators.DedupOps.hashedWordSetsOf(docs)
    val verified = graft.operators.DedupOps
      .prefixFilterPairsOn(pairs, 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.length == 1 * replicas, // source had one pair: (0, 1)
      s"expected ${replicas} replica-local pairs, got ${verified.mkString(",")}")
    assert(verified.forall { case (a, b) => a / 3 == b / 3 },
      "a near-dup pair crosses replicas — perturbation too weak")
  }
}
