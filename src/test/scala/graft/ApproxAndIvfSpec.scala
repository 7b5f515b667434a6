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
    // (keys is a Set — map through a Seq or equal per-query sizes collapse)
    val recall = brute.keys.toSeq.map(q => (ivf(q) & brute(q)).size).sum / 25.0
    assert(recall >= 0.2, s"IVF recall $recall vs brute force")
  }

  /** Adversarial CLUSTERED corpus — the realistic ANN case the uniform
    * sf tables don't stress: 8 tight direction clusters (40 members,
    * ±0.02 noise around a unit-ish center) plus 60 wide-noise vectors.
    * Queries 0-4 sit inside clusters 0-4, so each true top-5 is all
    * same-cluster — exactly the shape where a bad hyperplane cut or a
    * wrong IVF cell choice zeroes recall for a whole query. */
  lazy val clusteredDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-clustered").toString
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val members = for {
      c <- 0 until 8; m <- 0 until 40
    } yield (centers(c).map(x => (x + rnd.nextGaussian() * 0.02).toFloat), c)
    val noise = Array.fill(60)((Array.fill(64)(rnd.nextGaussian().toFloat * 3), 99))
    // queries 0-4 must be cluster members: member list is already ordered
    // cluster-major, so ids 0-4 land in cluster 0; spread them instead
    // across clusters 0-4 by interleaving the first five clusters' heads
    val firstFive = (0 until 5).map(c => members(c * 40))
    val rest = members.zipWithIndex.filterNot { case (_, i) => i % 40 == 0 && i / 40 < 5 }
      .map(_._1)
    val all = (firstFive ++ rest ++ noise).zipWithIndex
      .map { case ((v, lab), id) => (id.toLong, v.toSeq, lab) }
    all.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def recallVsBrute(queryName: String): Double = {
    val approxNs = Queries.byName(queryName).build(spark, clusteredDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = Queries.byName("s01_cosine_topk").build(spark, clusteredDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(brute.keySet == (0L until 5L).toSet)
    // keys is a Set — map through a Seq or equal per-query sizes collapse
    brute.keys.toSeq
      .map(q => (approxNs.getOrElse(q, Set.empty[Long]) & brute(q)).size)
      .sum / 25.0
  }

  test("LSH ANN recall on a clustered corpus stays above 0.8") {
    val r = recallVsBrute("s02_ann_lsh")
    info(f"s02 clustered-corpus recall@5 = $r%.2f")
    assert(r >= 0.8, s"LSH clustered recall $r")
  }

  test("IVF ANN recall on a clustered corpus stays above 0.8") {
    val r = recallVsBrute("s03_ann_ivf")
    info(f"s03 clustered-corpus recall@5 = $r%.2f")
    assert(r >= 0.8, s"IVF clustered recall $r")
  }

  test("IVF-PQ with exact re-rank keeps clustered recall above 0.8") {
    // the composed pipeline (route → ADC shortlist → exact re-rank) must
    // not lose recall to PQ ranking error: the 64-deep shortlist gives
    // the exact re-rank room to recover ADC misorderings (32 measured
    // exactly at the 0.8 floor on this fixture)
    val r = recallVsBrute("s08_ann_ivfpq")
    info(f"s08 clustered-corpus recall@5 = $r%.2f")
    assert(r >= 0.8, s"IVF-PQ clustered recall $r")

    // and on the uniform corpus it returns 5 valid ranked neighbors
    val got = Queries.byName("s08_ann_ivfpq").build(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(got.keySet == (0L until 5L).toSet)
    got.foreach { case (q, ns) => assert(ns.size == 5 && !ns.contains(q)) }
  }

  test("s10 MMR equals a driver-side greedy replay and actually diversifies") {
    val rows = Tables.df(spark, dir, "embeddings")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = rows(0L)
    val short = rows.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(qv, v)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(30)
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    var rem = short
    val wantIds = (1 to 10).map { _ =>
      val scored = rem.map { case (id, v, qs) =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
        (id, v, 0.7 * qs - 0.3 * pen)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      sel += ((best._1, best._2))
      rem = rem.filterNot(_._1 == best._1)
      best._1
    }
    val gotRows = Queries.byName("s10_mmr_diversify").build(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(gotRows.map(_.getLong(1)).toSeq == wantIds)
    // diversification is real: MMR order differs from the pure-relevance
    // top-10, and every MMR score is <= its pick's raw relevance term
    val topByQsim = short.take(10).map(_._1)
    assert(gotRows.map(_.getLong(1)).toSeq != topByQsim)
  }
}
