package graft

import graft.operators.{DedupOps, GraphOps}
import org.scalatest.funsuite.AnyFunSuite

/** Pins g05's k-core peel: hand-checkable cores on crafted graphs, and
  * the fixpoint claim on the real fixture (an extra round changes
  * nothing, so the fixed-round catalog answer is the true 3-core). */
class KCoreSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.kCorePeel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 4-clique with a pendant chain peels to exactly the clique") {
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // chain 4-5-6: node 5 and 6 die in round 1; their removal does not
    // lower the clique below degree 3
    val got = peel(clique ++ Seq((4L, 5L), (5L, 6L)), k = 3, rounds = 3)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cascading peel: a triangle fringe dies over multiple rounds") {
    // 5-cycle has min degree 2 → survives k=2 entirely; with k=3 it all
    // dies (round 1 kills everything at once).
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(peel(cycle, k = 2, rounds = 3).keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(peel(cycle, k = 3, rounds = 3).isEmpty)
    // chain hanging off a clique peels one node per round (cascade)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r1 = peel(g, k = 2, rounds = 1)
    assert(r1.contains(4L)) // only 5 died so far
    val r2 = peel(g, k = 2, rounds = 2)
    assert(!r2.contains(4L) && r2.keySet == Set(1L, 2L, 3L))
  }

  test("the fixture's 3-core reaches its fixpoint within the 3 budgeted rounds") {
    val edges = DedupOps.sharedPairGraph(spark, sf, 0.7).select("doc_a", "doc_b")
    def run(rounds: Int): Map[Long, Long] =
      GraphOps.kCorePeel(edges, k = 3, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r3 = run(3)
    assert(r3.nonEmpty, "fixture should contain a 3-core")
    assert(run(4) == r3, "round 4 must be a no-op: 3 rounds reach the fixpoint")
  }
}
