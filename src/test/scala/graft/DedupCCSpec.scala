package graft

import graft.operators.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** Connected components: the alt-star doubling path vs min-label
  * propagation, and the rounds-budget crossover between them. */
class DedupCCSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alt-star converges on a 64-chain within an O(log n) budget") {
    // path 1-2-...-64: diameter 63. Min-label needs 63 rounds; the
    // doubling form must settle well inside 12.
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = labels(DedupOps.connectedComponentsAltStar(chain, maxRounds = 12))
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.forall(_ == 1L))
  }

  test("pointer-jump propagation converges a 40-chain inside the budget") {
    // diameter 39 ≫ crossoverAfter = 8: plain per-round propagation
    // would hand off to alt-star, but the r16 pointer jump doubles the
    // label-pointer depth per round, so the loop itself must settle in
    // ≤ 8 rounds (O(log diameter)) — pinned via the diagnostic counter
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = labels(DedupOps.connectedComponents(chain))
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
    assert(DedupOps.lastPropagationRounds >= 1 &&
      DedupOps.lastPropagationRounds <= 8,
      s"expected propagation (not alt-star fallback) to converge the " +
        s"40-chain; rounds=${DedupOps.lastPropagationRounds}")
  }

  test("crossover to alt-star still fires when the budget truly runs out") {
    // crossoverAfter = 1: one hop+jump round cannot cover diameter 39,
    // so the fallback must take over and still be right
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = labels(DedupOps.connectedComponents(chain, crossoverAfter = 1))
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
    assert(DedupOps.lastPropagationRounds == -1,
      "expected the alt-star fallback path")
  }

  test("connectedComponents is correct for string node ids") {
    // string labels cast to NULL under the numeric label-sum shortcut —
    // the type check must route them to the join-count convergence path,
    // not silently declare convergence after one round
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("src", "dst")
    val got = DedupOps.connectedComponents(chain).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("alt-star labels equal propagation labels on a multi-component graph") {
    val rnd = new scala.util.Random(11)
    // several blobs + a chain + isolated pair, shuffled ids
    val edges = (
      Seq.fill(60)((rnd.nextInt(15).toLong + 1, rnd.nextInt(15).toLong + 1)) ++
        (20L until 30L).map(i => (i, i + 1)) ++
        Seq((100L, 101L))
      ).filter { case (a, b) => a != b }.toDF("src", "dst")
    val viaProp = labels(DedupOps.connectedComponents(
      edges, maxRounds = 100, crossoverAfter = 100))
    val viaStar = labels(DedupOps.connectedComponentsAltStar(edges))
    assert(viaStar == viaProp)
  }
}
