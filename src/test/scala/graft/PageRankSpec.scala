package graft

import graft.examples.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** Golden-math checks for the reference-parity PageRank semantics
  * (page_rank.ex:31-122): baseline only to sources, default rank 1.0,
  * plain contribution sum. The no-inlink baseline value mirrors the
  * reference's shipped golden file ((1-0.85)/41332, SURVEY §6). */
class PageRankSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("iteration 1 on a 3-node graph matches hand computation") {
    import spark.implicits._
    val lines = Seq("a\tb c", "b\tc").toDS()
    val links = PageRank.parseAdjacency(spark, lines)
    val ranks = PageRank.run(spark, links, iterations = 1,
      damping = 0.85, totalPages = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val base = 0.15 / 3
    assert(math.abs(ranks("a") - base) < 1e-12) // source only: baseline
    assert(math.abs(ranks("b") - (base + 0.85 / 2)) < 1e-12)
    assert(math.abs(ranks("c") - (0.85 / 2 + 0.85)) < 1e-12) // target-only: no baseline
  }

  test("iteration 2 uses iteration-1 ranks with 1.0 default") {
    import spark.implicits._
    val lines = Seq("a\tb", "b\ta").toDS()
    val links = PageRank.parseAdjacency(spark, lines)
    val r2 = PageRank.run(spark, links, 2, 0.85, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val base = 0.15 / 2
    val r1 = Map("a" -> (base + 0.85), "b" -> (base + 0.85))
    assert(math.abs(r2("a") - (base + 0.85 * r1("b"))) < 1e-12)
    assert(math.abs(r2("b") - (base + 0.85 * r1("a"))) < 1e-12)
  }

  test("adjacency parser handles missing targets and blank lines") {
    import spark.implicits._
    val lines = Seq("a\tb c", "solo", "", "  ").toDS()
    val links = PageRank.parseAdjacency(spark, lines)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(links("a") == Seq("b", "c"))
    assert(links("solo") == Seq())
    assert(links.size == 2)
  }

  test("no-inlink baseline matches the reference golden value") {
    // golden: shared/page_rank_iter_1.json has 3.6291493273976587e-6
    assert(math.abs((1 - 0.85) / 41332 - 3.6291493273976587e-6) < 1e-20)
  }

  test("runUntil converges to a fixed point within tolerance") {
    import spark.implicits._
    // a strongly connected 4-node graph → ranks converge geometrically
    val lines = Seq("a\tb c", "b\tc", "c\ta d", "d\ta").toDS()
    val links = PageRank.parseAdjacency(spark, lines)
    val eps = 1e-9
    val res = PageRank.runUntil(spark, links, eps,
      maxIterations = 200, damping = 0.85, totalPages = 4)

    assert(res.maxDelta < eps)
    assert(res.iterations > 2 && res.iterations < 200)

    // fixed point: one more iteration moves every rank by < eps
    val ranks = res.ranks.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val once = PageRank.iterate(links, res.ranks, 0.85, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ranks.foreach { case (p, r) => assert(math.abs(once(p) - r) < eps * 10) }
  }

  test("runUntil stops at maxIterations when tolerance is unreachable") {
    import spark.implicits._
    val lines = Seq("a\tb", "b\ta").toDS()
    val links = PageRank.parseAdjacency(spark, lines)
    val res = PageRank.runUntil(spark, links, eps = 0.0, // delta < 0 is impossible
      maxIterations = 3, damping = 0.85, totalPages = 2)
    assert(res.iterations == 3)
  }
}
