package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches — the third leg of the sketch family
  * (HLL answers "how many distinct", Misra–Gries "which are frequent",
  * KLL "what does the distribution look like"). Build one compact sketch
  * per (group, day) in a single partial-merge pass; any coarser rollup —
  * weekly, per-type, whole-table — is a union of kilobyte blobs, never a
  * re-scan of the raw 100 TB values. Exact percentiles at that scale need
  * a full sort per question; the sketch answers every quantile question
  * from state logarithmic in n with a PROVEN normalized-rank-error bound
  * (~1.65% at 99% confidence for the default k=200).
  *
  * Determinism contract (differs from the HLL/bitmap family, and the
  * specs pin it honestly): KLL compaction flips random coins, so beyond
  * ~k retained values two different partition splits can produce
  * different — equally valid — sketches. Queries therefore gate on the
  * published rank-error bound (a boolean the oracle states), not on
  * bit-equality; below k items the sketch retains everything and IS
  * exact.
  *
  * Backed by the Apache DataSketches KLL implementation Spark already
  * ships for its own sketch functions.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll_agg: k must be in [8, 65535], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_agg expects a DOUBLE value column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_agg"

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union of serialized KLL sketch blobs — the rollup direction. */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll_union_agg: k must be in [8, 65535], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg expects a BINARY sketch column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_union_agg"

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantile lookup on a sketch blob: value at normalized rank q
  * (INCLUSIVE criteria — the DataSketches default). NULL on an empty
  * sketch rather than the library's exception: a group with no non-null
  * values is data, not a crash. An out-of-range rank (q < 0 or q > 1)
  * or a blob that is not a KLL sketch fails with a named, descriptive
  * error instead of a raw DataSketches exception deep in an executor. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // ImplicitCastInputTypes lets the analyzer cast SQL numeric literals
  // (0.5 parses as DECIMAL(1,1)) to DOUBLE instead of failing.
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType, DoubleType)
  override protected def nullSafeEval(blob: Any, q: Any): Any = {
    val rank = q.asInstanceOf[Double]
    if (rank < 0.0 || rank > 1.0 || rank.isNaN)
      throw new IllegalArgumentException(
        s"kll_quantile: normalized rank must be in [0, 1], got $rank")
    val sk = KllAgg.heapifyOrFail(blob.asInstanceOf[Array[Byte]], "kll_quantile")
    if (sk.isEmpty) null
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Normalized rank of a value in a sketch blob (INCLUSIVE). */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType, DoubleType)
  override protected def nullSafeEval(blob: Any, v: Any): Any = {
    val sk = KllAgg.heapifyOrFail(blob.asInstanceOf[Array[Byte]], "kll_rank")
    if (sk.isEmpty) null
    else sk.getRank(v.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object KllAgg {
  val DefaultK = 200

  /** Heapify a sketch blob, naming the calling function on failure so a
    * corrupt/foreign BINARY surfaces as a debuggable error, not a raw
    * SketchesArgumentException from executor internals. */
  private[functions] def heapifyOrFail(
      bytes: Array[Byte], fn: String): KllDoublesSketch =
    try KllDoublesSketch.heapify(Memory.wrap(bytes))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$fn: input is not a valid KLL doubles sketch " +
          s"(${bytes.length} bytes): ${e.getMessage}", e)
    }

  /** Aggregate Column: BINARY KLL sketch of a double column. */
  def kll_agg(value: Column, k: Int = DefaultK): Column =
    Bridge.column(KllDoublesAgg(Bridge.expression(value), k).toAggregateExpression())

  /** Aggregate Column: union of BINARY sketch blobs. */
  def kll_union_agg(sketch: Column, k: Int = DefaultK): Column =
    Bridge.column(KllUnionAgg(Bridge.expression(sketch), k).toAggregateExpression())

  def kll_quantile(sketch: Column, q: Column): Column =
    Bridge.column(KllQuantile(Bridge.expression(sketch), Bridge.expression(q)))

  def kll_rank(sketch: Column, v: Column): Column =
    Bridge.column(KllRank(Bridge.expression(sketch), Bridge.expression(v)))
}
