package graft

import graft.functions.Varint
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The delta-varint codec must agree bit-for-bit with the array-form
  * budgeted merge ([[graft.functions.SortedLongIntersectBudget]]'s
  * nullSafeEval contract) on every (sets, budget) input — it is the wire
  * format of the past-broadcast exact-verify attach, where a single
  * off-by-one in the miss accounting silently changes which pairs
  * survive. Randomized cross-check against an independent reference
  * implementation, plus the degenerate edges (empty sets, negative
  * budget, A-tail misses after B exhausts). */
class VarintSpec extends AnyFunSuite {

  /** Reference semantics, straight from SortedLongIntersectBudget. */
  private def refIntersect(a: Array[Long], b: Array[Long], budget: Int): Int = {
    var i = 0; var j = 0; var inter = 0; var miss = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) {
        miss += 1
        if (miss > budget) return -1
        i += 1
      } else j += 1
    }
    if (miss + (a.length - i) > budget) -1 else inter
  }

  private def enc(a: Array[Long]): Array[Byte] =
    Varint.encode(new GenericArrayData(a))

  test("round-trip gaps: single-byte through 9-byte varints") {
    // values chosen so consecutive gaps cover every LEB128 width
    val a = Array(0L, 1L, 128L, 16384L, 1L << 21, 1L << 28, 1L << 35,
      1L << 42, 1L << 49, 1L << 56, Long.MaxValue)
    assert(Varint.intersectWithin(enc(a), enc(a), 0) == a.length)
  }

  test("degenerate edges match the array form") {
    val e = Array.empty[Long]; val x = Array(1L, 5L, 9L)
    for ((a, b, bud) <- Seq((e, e, 0), (e, x, 0), (x, e, 0), (x, e, 2),
        (x, e, 3), (x, x, -1), (e, e, -1), (x, x, 0)))
      assert(Varint.intersectWithin(enc(a), enc(b), bud) ==
        refIntersect(a, b, bud), s"(${a.toSeq}, ${b.toSeq}, $bud)")
  }

  test("randomized equivalence with the array-form budgeted merge") {
    val rnd = new scala.util.Random(4211)
    for (_ <- 1 to 2000) {
      val universe = 1 + rnd.nextInt(400)
      val na = rnd.nextInt(60); val nb = rnd.nextInt(60)
      // draw from a small universe so intersections are common
      val a = Array.fill(na)(rnd.nextInt(universe).toLong).distinct.sorted
      val b = Array.fill(nb)(rnd.nextInt(universe).toLong).distinct.sorted
      val bud = rnd.nextInt(12) - 2 // include negative budgets
      assert(Varint.intersectWithin(enc(a), enc(b), bud) ==
        refIntersect(a, b, bud),
        s"a=${a.toSeq} b=${b.toSeq} bud=$bud")
    }
  }

  test("randomized wide-range ranks (multi-byte deltas)") {
    val rnd = new scala.util.Random(1107)
    for (_ <- 1 to 500) {
      val a = Array.fill(rnd.nextInt(40))(
        math.abs(rnd.nextLong()) % (1L << 50)).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(
        math.abs(rnd.nextLong()) % (1L << 50)).distinct.sorted
      // splice in shared elements so equality paths execute
      val shared = Array.fill(rnd.nextInt(10))(
        math.abs(rnd.nextLong()) % (1L << 50))
      val a2 = (a ++ shared).distinct.sorted
      val b2 = (b ++ shared).distinct.sorted
      val bud = rnd.nextInt(50)
      assert(Varint.intersectWithin(enc(a2), enc(b2), bud) ==
        refIntersect(a2, b2, bud))
    }
  }
}
