package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Instrument validity for the benign decade fixtures (BASELINE
  * R13.3/R13.9 rows depend on them): the generator must inject exactly
  * ⌊n/20⌋ near-dup pairs at J = 24/26 ≈ 0.923 — and must keep doing so
  * under the scaled-vocab knob, where hash collisions into a smaller
  * id-space could silently create extra true pairs or (by colliding a
  * doc's own words) change an injected pair's Jaccard. A fixture whose
  * ground truth drifted would turn every decade ratio built on it into
  * fiction, so the truth is recomputed here exactly and compared
  * against the full d02 output. */
class BenignCorpusSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-benigncorpus-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def truePairs(n: Long, vocab: Long): Set[(Long, Long)] = {
    // exact quadratic truth over the generator's own word sets
    val docs = tools.BenignCorpus.frame(spark, n, vocab)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSet))
    (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      if (sa & sb).size.toDouble / (sa | sb).size >= 0.9
    } yield (a, b)).toSet
  }

  private def kernelPairs(n: Long, vocab: Long): Set[(Long, Long)] =
    operators.DedupOps.prefixFilterPairsOn(
      operators.DedupOps.hashedWordSetsOf(
        tools.BenignCorpus.frame(spark, n, vocab).select("doc_id", "text")),
      0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("default vocab: exactly n/20 injected near-dups, the exact kernel finds precisely them") {
    val want = truePairs(1000L, 50000L)
    assert(want.size == 50, s"ground truth drifted: ${want.size} pairs")
    // every injected pair is (20k+18, 20k+19)
    assert(want.forall { case (a, b) => b == a + 1 && b % 20 == 19 }, want)
    assert(kernelPairs(1000L, 50000L) == want)
  }

  test("scaled vocab (5·n): injection and truth survive the smaller id space") {
    val want = truePairs(1000L, 5000L)
    // collisions may add a handful of accidental near-dups only if two
    // docs' 24-word draws collide almost entirely — astronomically
    // unlikely even at vocab 5n; the injected 50 must be exactly present
    val injected = want.filter { case (a, b) => b == a + 1 && b % 20 == 19 }
    assert(injected.size == 50, s"injected pairs: ${injected.size}")
    assert(want == injected,
      s"accidental pairs at vocab=5n: ${(want -- injected).take(5)}")
  }

  test("tiny vocab is the documented quadratic regime: candidate volume explodes, truth does not") {
    // vocab 100 at n=1000: df ≈ 240 per token — the R13.3 density
    // arithmetic. The point pinned: extra CANDIDATES, not extra TRUE
    // pairs (the verify culls them), so fixed-vocab fixtures distort
    // cost, never correctness.
    val want = truePairs(1000L, 100L)
    val injected = want.filter { case (a, b) => b == a + 1 && b % 20 == 19 }
    assert(injected.size == 50)
  }
}
