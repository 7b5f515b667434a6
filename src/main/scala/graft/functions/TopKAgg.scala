package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Bounded top-K-per-group as a native aggregate: keeps the K (sortKey,
  * payload) pairs with the smallest sortKey per group and emits the
  * payloads in (sortKey, payload) order.
  *
  * This is the straggler-free replacement for the
  * `row_number().over(Window.partitionBy(key).orderBy(sort)) <= K`
  * formulation: the window plan sorts each key's ENTIRE row set in one
  * task to keep K rows, so a dominant key (90%-English corpus at 100 TB)
  * becomes a single straggler. As an aggregate the state is a bounded
  * K-element heap with partial/merge support — every map task keeps at
  * most K candidates per key it sees, merge is K·log K, and no task ever
  * holds more than K rows per key regardless of skew.
  *
  * Both sortKey and payload accept any orderable atomic type from
  * {STRING, BIGINT, INT, DOUBLE, DATE, TIMESTAMP}; strings order by
  * UTF8 binary comparison — the same order a window `orderBy` uses, so
  * the kept set stays byte-identical to the window formulation with the
  * same `orderBy(sort, payload)` clause. Ties on sortKey are broken by
  * payload, making the kept set total-order deterministic. Payloads
  * should be UNIQUE per group (a row id): if the K-boundary falls inside
  * a run of fully identical (sortKey, payload) pairs, which duplicate is
  * kept is arbitrary on both formulations.
  */
case class TopKAgg(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, s"topk_agg: k must be positive, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    def bad(role: String, dt: DataType) = TypeCheckFailure(
      s"topk_agg: $role must be one of STRING, BIGINT, INT, DOUBLE, DATE, " +
        s"TIMESTAMP, got ${dt.simpleString}")
    if (!TopKAgg.supported(sortKey.dataType)) bad("sort key", sortKey.dataType)
    else if (!TopKAgg.supported(payload.dataType)) bad("payload", payload.dataType)
    else TypeCheckSuccess
  }

  @transient private lazy val pairOrd: Ordering[(Any, Any)] = {
    val so = TopKAgg.orderingFor(sortKey.dataType)
    val po = TopKAgg.orderingFor(payload.dataType)
    (a: (Any, Any), b: (Any, Any)) => {
      val c = so.compare(a._1, b._1)
      if (c != 0) c else po.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k, pairOrd)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = sortKey.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // clone copies — a UTF8String may point into a reused row buffer
      buf.offer(TopKAgg.copyValue(s), TopKAgg.copyValue(p))
    }
    buf
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    b2.foreach((s, p) => b1.offer(s, p))
    b1
  }

  override def eval(buf: TopKAgg.Buf): Any = new GenericArrayData(buf.sortedPayloads)

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val items = buf.items
    val n = 4 + items.map { case (s, p) =>
      TopKAgg.byteSize(sortKey.dataType, s) + TopKAgg.byteSize(payload.dataType, p)
    }.sum
    val bb = ByteBuffer.allocate(n)
    bb.putInt(items.length)
    items.foreach { case (s, p) =>
      TopKAgg.writeValue(bb, sortKey.dataType, s)
      TopKAgg.writeValue(bb, payload.dataType, p)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKAgg.Buf(k, pairOrd)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val s = TopKAgg.readValue(bb, sortKey.dataType)
      val p = TopKAgg.readValue(bb, payload.dataType)
      buf.offer(s, p)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), payload = newChildren(1))
}

object TopKAgg {

  private[functions] def supported(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | DoubleType | DateType |
         TimestampType => true
    case _ => false
  }

  /** Ordering over INTERNAL values (UTF8String for strings, Int for
    * dates, Long for timestamps). String order is UTF8 binary — the
    * order window `orderBy` and joins use, NOT java.lang.String's
    * UTF-16 code-unit order (they differ on supplementary characters). */
  private[functions] def orderingFor(dt: DataType): Ordering[Any] = dt match {
    case StringType =>
      (a: Any, b: Any) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case LongType | TimestampType =>
      (a: Any, b: Any) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      (a: Any, b: Any) => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType =>
      // matches Spark's sort order for doubles (NaN largest)
      (a: Any, b: Any) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case other => throw new IllegalArgumentException(s"topk_agg: unsupported $other")
  }

  private[functions] def copyValue(v: Any): Any = v match {
    case u: UTF8String => u.clone()
    case x => x
  }

  private[functions] def byteSize(dt: DataType, v: Any): Int = dt match {
    case StringType => 4 + v.asInstanceOf[UTF8String].numBytes()
    case LongType | TimestampType | DoubleType => 8
    case IntegerType | DateType => 4
    case other => throw new IllegalArgumentException(s"topk_agg: unsupported $other")
  }

  private[functions] def writeValue(bb: ByteBuffer, dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      bb.putInt(b.length); bb.put(b)
    case LongType | TimestampType => bb.putLong(v.asInstanceOf[Long])
    case IntegerType | DateType => bb.putInt(v.asInstanceOf[Int])
    case DoubleType => bb.putDouble(v.asInstanceOf[Double])
    case other => throw new IllegalArgumentException(s"topk_agg: unsupported $other")
  }

  private[functions] def readValue(bb: ByteBuffer, dt: DataType): Any = dt match {
    case StringType =>
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      UTF8String.fromBytes(b)
    case LongType | TimestampType => bb.getLong
    case IntegerType | DateType => bb.getInt
    case DoubleType => bb.getDouble
    case other => throw new IllegalArgumentException(s"topk_agg: unsupported $other")
  }

  /** Bounded max-heap of the K smallest (sort, payload) pairs seen.
    * Head of the priority queue is the current WORST kept pair; a new
    * pair replaces it only if strictly smaller, so state never exceeds
    * K entries. Values are internal representations, pre-copied. */
  final class Buf(k: Int, ord: Ordering[(Any, Any)]) {
    // max-heap: head = largest kept pair
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Any, Any)](ord)

    def offer(s: Any, p: Any): Unit = {
      if (heap.size < k) heap.enqueue((s, p))
      else if (ord.lt((s, p), heap.head)) { heap.dequeue(); heap.enqueue((s, p)) }
    }

    def foreach(f: (Any, Any) => Unit): Unit = heap.foreach { case (s, p) => f(s, p) }

    def items: Seq[(Any, Any)] = heap.toSeq

    /** Payloads of the kept pairs in ascending (sort, payload) order. */
    def sortedPayloads: Array[Any] = heap.toArray.sorted(ord).map(_._2)
  }

  /** Aggregate Column: payloads of the `k` rows with the smallest
    * `sort` value per group, in (sort, payload) order. */
  def topk_agg(sort: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(sort), Bridge.expression(payload), k)
        .toAggregateExpression())
}
