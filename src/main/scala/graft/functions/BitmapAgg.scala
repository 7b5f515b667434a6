package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dense-bitmap audience aggregates — the precomputed-segment primitive
  * behind retention/overlap analytics at scale: build one compact bitmap
  * per (cohort, day) ONCE, then any retention curve, audience overlap, or
  * rollup is bit-AND/OR arithmetic on kilobyte blobs instead of a
  * re-shuffle of the raw event log. Same persistence story as the HLL
  * sketches (e17) but EXACT, for the id domains where exactness is
  * affordable: a dense integer key space (user ids remapped to a dense
  * range, the standard audience-store layout).
  *
  * Merge is bitwise OR — associative, commutative, partial-merge-capable —
  * so the aggregate combines map-side like any sum. State per group is
  * nBits/8 bytes regardless of row count.
  *
  * Out-of-domain ids fail LOUDLY at update time: silently dropping (or
  * wrapping) a user id would produce plausible-but-wrong audience counts,
  * the worst failure mode an audience store can have.
  */
case class DenseBitmapAgg(
    child: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def checkInputDataTypes(): TypeCheckResult = {
    import TypeCheckResult._
    if (child.dataType == LongType || child.dataType == IntegerType) TypeCheckSuccess
    else TypeCheckFailure(
      s"dense_bitmap_agg requires a BIGINT/INT id column, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      require(x >= 0 && x < nBits,
        s"dense_bitmap_agg: id $x outside the dense domain [0, $nBits) — " +
          "remap ids or widen nBits; refusing to wrap or drop")
      buf.set(x.toInt)
    }
    buf
  }

  override def merge(b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2)
    b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.toByteArray

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "dense_bitmap_agg"

  override def withNewMutableAggBufferOffset(o: Int): DenseBitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DenseBitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** popcount of a bitmap blob. */
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_cardinality expects BINARY, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(b: Any): Any =
    java.util.BitSet.valueOf(b.asInstanceOf[Array[Byte]]).cardinality().toLong
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** |A ∩ B| of two bitmap blobs, without materializing the intersection. */
case class BitmapAndCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bitmap_and_cardinality expects (BINARY, BINARY)")
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = java.util.BitSet.valueOf(a.asInstanceOf[Array[Byte]])
    x.and(java.util.BitSet.valueOf(b.asInstanceOf[Array[Byte]]))
    x.cardinality().toLong
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** |A ∪ B| — the rollup direction (weekly audience from daily bitmaps). */
case class BitmapOrCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bitmap_or_cardinality expects (BINARY, BINARY)")
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = java.util.BitSet.valueOf(a.asInstanceOf[Array[Byte]])
    x.or(java.util.BitSet.valueOf(b.asInstanceOf[Array[Byte]]))
    x.cardinality().toLong
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitmapAgg {
  /** Aggregate Column: dense bitmap (binary) of an id column. */
  def dense_bitmap_agg(idCol: Column, nBits: Int = 1 << 22): Column =
    Bridge.column(
      DenseBitmapAgg(Bridge.expression(idCol), nBits).toAggregateExpression())

  def bitmap_cardinality(bm: Column): Column =
    Bridge.column(BitmapCardinality(Bridge.expression(bm)))

  def bitmap_and_cardinality(a: Column, b: Column): Column =
    Bridge.column(BitmapAndCardinality(Bridge.expression(a), Bridge.expression(b)))

  def bitmap_or_cardinality(a: Column, b: Column): Column =
    Bridge.column(BitmapOrCardinality(Bridge.expression(a), Bridge.expression(b)))
}
