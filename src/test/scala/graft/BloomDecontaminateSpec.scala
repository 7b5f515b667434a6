package graft

import graft.operators.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins the d13 Bloom-pruned decontamination path: identical output to
  * the d08 broadcast path (Bloom one-sided error + exact verify ⇒ no
  * result difference is ever acceptable), and the might_contain prune
  * sits in the plan BEFORE the verify join so only filter survivors
  * reach the shuffle — the runtime-filter shape that makes the operator
  * viable when the benchmark side is broadcast-hostile. */
class BloomDecontaminateSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = Session.get("graft-test-bloom")

  test("d13 output is bit-identical to d08 on the fixture") {
    val got = DedupOps.d13.build(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = DedupOps.d08.build(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty) // the fixture must actually exercise the path
  }

  test("the bloom prune runs before the verify join") {
    val plan = DedupOps.d13.build(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prune missing from the physical plan:\n$plan")
    // the prune must be a Filter under the join, not a post-join step:
    // might_contain appears below the first Join operator in the tree
    val joinIdx = plan.indexOf("Join")
    val mcIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      "might_contain should sit beneath the join in the plan tree " +
        s"(join@$joinIdx, might_contain@$mcIdx)")
  }
}
