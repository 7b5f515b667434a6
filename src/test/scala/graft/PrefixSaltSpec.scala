package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The group-salted candidate self-join (prefixCandidatesOn) must emit
  * every qualifying pair EXACTLY once when a posting list overflows the
  * GroupB salt width — losses would mean cross-group pairs dropped by a
  * wrong orientation rule, duplicates a wrong group-pair cover. A
  * 1300-doc identical clique forces every prefix token's posting list
  * to 1300 > 1024 = GroupB (g = 2), while a 200-doc clique rides the
  * unsalted g = 1 path in the same corpus; the exact pair counts are
  * combinatorial ground truth. */
class PrefixSaltSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-prefixsalt-test").master("local[8]")
    .config("spark.sql.shuffle.partitions", "8").getOrCreate()

  test("hot posting list (g>1) emits each clique pair exactly once") {
    import spark.implicits._
    val textA = (1 to 10).map(i => s"a$i").mkString(" ")
    val textB = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = ((0L until 1300L).map(i => (i, textA)) ++
      (2000L until 2200L).map(i => (i, textB)))
      .toDF("doc_id", "text")
    val pairs = operators.DedupOps.prefixFilterPairsOn(
      operators.DedupOps.hashedWordSetsOf(docs), 0.9).cache()
    val nA = 1300L * 1299L / 2
    val nB = 200L * 199L / 2
    assert(pairs.count() == nA + nB)
    // exactly-once: no duplicate (doc_a, doc_b) rows
    assert(pairs.select("doc_a", "doc_b").distinct().count() == nA + nB)
    // canonical orientation and no cross-clique leakage
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(pairs.filter(col("doc_a") < 2000 && col("doc_b") >= 2000).count() == 0)
    // identical docs → jaccard exactly 1
    assert(pairs.filter(col("jac") =!= 1.0).count() == 0)
    pairs.unpersist()
  }

  test("containment candidates with a hot posting list stay exactly-once") {
    import spark.implicits._
    // 1300 identical docs: every token's posting list is 1300 > GroupB,
    // so the y side splits into groups and the prefix side replicates;
    // the candidate set must still be every ORDERED pair once (d09's
    // containment is directional) — the groupBy collapse would mask
    // duplicates, so assert through the verified pairs' count instead
    val textA = (1 to 10).map(i => s"a$i").mkString(" ")
    val docs = (0L until 1300L).map(i => (i, textA)).toDF("doc_id", "text")
    val cand = operators.DedupOps.containmentCandidatesOn(
      operators.DedupOps.hashedWordSetsOf(docs), 0.9)
    assert(cand.count() == 1300L * 1299L)
    assert(cand.distinct().count() == 1300L * 1299L)
  }
}
