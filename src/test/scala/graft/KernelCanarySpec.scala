package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fixed-size kernel drift probe must be deterministic — a canary
  * whose own workload moves is no canary. Pins the exact output shape
  * of the pinned cell (tools.KernelCanary): every family-of-4 yields
  * its 6 near-dup pairs at J = 50/56 and nothing else survives the
  * 0.8 verify, regardless of box, session or SF dir.
  */
class KernelCanarySpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-canary-test").master("local[8]")
    .config("spark.sql.shuffle.partitions", "8").getOrCreate()

  test("canary cell output is the exact family-pair set") {
    val out = tools.KernelCanary.build(spark)
      .select("doc_a", "doc_b", "jac").cache()
    val n = out.count()
    val families = tools.KernelCanary.NumDocs / 4
    assert(n == families * 6, s"expected ${families * 6} family pairs, got $n")
    // every surviving pair is within one family of 4 and above threshold
    val bad = out.filter(
      org.apache.spark.sql.functions.expr(
        "doc_a div 4 != doc_b div 4 or jac < 0.8")).count()
    assert(bad == 0)
    out.unpersist()
  }
}
