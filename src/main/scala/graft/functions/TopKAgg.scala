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
  * Ties on sortKey are broken by payload, so the kept set is total-order
  * deterministic — byte-identical to the window formulation with the
  * same `orderBy(sort, payload)` clause. Payloads should be UNIQUE per
  * group (a row id): if the K-boundary falls inside a run of fully
  * identical (sortKey, payload) pairs, which of the duplicates is kept
  * is arbitrary on both formulations.
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
    if (sortKey.dataType != StringType)
      TypeCheckFailure(s"topk_agg: sort key must be STRING, got ${sortKey.dataType.simpleString}")
    else if (payload.dataType != LongType)
      TypeCheckFailure(s"topk_agg: payload must be BIGINT, got ${payload.dataType.simpleString}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = sortKey.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // toString copies — the UTF8String may point into a reused row buffer
      buf.offer(s.asInstanceOf[UTF8String].toString, p.asInstanceOf[Long])
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
    var n = 4
    val enc = items.map { case (s, p) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8); n += 4 + b.length + 8; (b, p)
    }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(enc.length)
    enc.foreach { case (b, p) => bb.putInt(b.length); bb.put(b); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKAgg.Buf(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len); bb.get(sb)
      buf.offer(new String(sb, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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

  /** Bounded max-heap of the K smallest (sort, payload) pairs seen.
    * Head of the priority queue is the current WORST kept pair; a new
    * pair replaces it only if strictly smaller, so state never exceeds
    * K entries. */
  final class Buf(k: Int) {
    private val ord: Ordering[(String, Long)] = Ordering.Tuple2[String, Long]
    // max-heap: head = largest kept pair
    private val heap = scala.collection.mutable.PriorityQueue.empty[(String, Long)](ord)

    def offer(s: String, p: Long): Unit = {
      if (heap.size < k) heap.enqueue((s, p))
      else if (ord.lt((s, p), heap.head)) { heap.dequeue(); heap.enqueue((s, p)) }
    }

    def foreach(f: (String, Long) => Unit): Unit = heap.foreach { case (s, p) => f(s, p) }

    def items: Seq[(String, Long)] = heap.toSeq

    /** Payloads of the kept pairs in ascending (sort, payload) order. */
    def sortedPayloads: Array[Long] = heap.toArray.sorted(ord).map(_._2)
  }

  /** Aggregate Column: payloads of the `k` rows with the smallest
    * `sort` value per group, in (sort, payload) order. */
  def topk_agg(sort: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(sort), Bridge.expression(payload), k)
        .toAggregateExpression())
}
