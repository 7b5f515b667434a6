package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused per-row MinHash signature: all `numHashes` running minima in
  * ONE pass over the word-hash array.
  *
  * Replaces the expression-space formulation
  * `array(array_min(transform(whs, h -> pmod(a_i*h + b_i, P))) for i)`,
  * which traverses the array `numHashes` times and allocates an
  * intermediate array per hash function per ROW — at 64 hashes that is
  * 64 array allocations and 64 traversals where one fused loop does
  * zero intermediate allocation. The arithmetic is identical
  * (`floorMod(a·h + b, P)` = SQL `pmod`; a, b < P = 2³¹−1 and inputs
  * are pre-reduced mod P, so a·h + b < 2⁶² never overflows), and the
  * (a_i, b_i) family comes from [[MinHashAgg.hashParams]] — the same
  * contract every sketch formulation in the engine draws from — so
  * signatures are bit-identical to both the transform-chain and the
  * [[MinHashAgg]] aggregate (pinned in MinHashSigSpec).
  *
  * Null elements are skipped (the transform-chain's `array_min`
  * ignores the nulls a null hash maps to); an EMPTY input yields all
  * Long.MaxValue (the aggregate's empty-buffer value) — every call
  * site filters empty token arrays before sketching.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.sig(a.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.sig($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Static kernel shared by interpreted eval and generated code (a
  * standalone object so codegen can call it as a plain static). */
object MinHashKernel {
  private val P = 2147483647L // 2^31 − 1, prime

  // (a_i[], b_i[]) per (numHashes, seed) — tiny, computed once per JVM
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, Long), (Array[Long], Array[Long])]

  private def params(k: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.getOrElseUpdate((k, seed), {
      val ab = MinHashAgg.hashParams(k, seed)
      (ab.map(_._1), ab.map(_._2))
    })

  def sig(whs: ArrayData, k: Int, seed: Long): ArrayData = {
    val (as, bs) = params(k, seed)
    val m = Array.fill(k)(Long.MaxValue)
    val n = whs.numElements()
    var j = 0
    while (j < n) {
      if (!whs.isNullAt(j)) {
        val h = whs.getLong(j)
        var i = 0
        while (i < k) {
          val v = java.lang.Math.floorMod(as(i) * h + bs(i), P)
          if (v < m(i)) m(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(m)
  }
}
