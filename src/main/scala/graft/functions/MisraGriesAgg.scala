package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries frequent-items summary as a native partial-merge aggregate —
  * the candidate generator for EXACT heavy hitters over data too large to
  * shuffle by key.
  *
  * The straightforward top-N-by-count (t01's shape) shuffles the entire key
  * space: at 100 TB of text that is a token-cardinality-wide exchange just to
  * keep the head of a Zipf curve. Misra–Gries keeps at most `k` counters per
  * task (update: hit → +1; miss with a free slot → insert; miss with a full
  * table → decrement ALL counters, dropping zeros — each decrement "spends"
  * k+1 stream items, so items with true frequency > n/(k+1) can never be
  * fully spent and MUST survive). Merge sums counters pairwise and, when more
  * than `k` survive, subtracts the (k+1)-th largest count from all and drops
  * the non-positives — the Agarwal et al. "Mergeable Summaries" (PODS '12)
  * merge, which preserves the same n/(k+1) deficit bound. So the only bytes
  * that ever cross the wire are O(k)-sized summaries, one per map task.
  *
  * The summary's counts are lower bounds (each may be deficient by up to
  * n/(k+1)), so the operator contract is two-pass: pass 1 produces ≤ k
  * candidate keys (a superset of every item with true count > n/(k+1));
  * pass 2 re-scans, counting ONLY the broadcast candidates exactly. The
  * composition is exactly `HAVING count(*) > n/(k+1)` — a second engine can
  * verify it with plain SQL (t24's DuckDB oracle does).
  *
  * Reference analog: the WordCount job (`lib/mini_hadoop/examples/
  * word_count.ex:12-147`) computes the full exact histogram; this is the
  * sketch that answers the "head of the histogram" question without paying
  * for the body.
  *
  * Buffer layout: string key → count, plus the processed-item total `n`
  * (needed downstream for the threshold; riding it in the buffer saves a
  * separate count pass). eval emits `STRUCT<total: BIGINT, keys:
  * ARRAY<STRING>>` with keys sorted for determinism.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf] {

  require(k > 0, s"mg_sketch: k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch expects a STRING key column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MisraGriesAgg.Buf = new MisraGriesAgg.Buf()

  override def update(buf: MisraGriesAgg.Buf, input: InternalRow): MisraGriesAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.counters.getOrElse(key, 0L)
      if (cur > 0L) buf.counters(key) = cur + 1L
      else if (buf.counters.size < k) buf.counters(key) = 1L
      else {
        // Full table, new key: decrement every counter (the new item's own
        // +1 cancels against the table-wide −1, so it is simply not added).
        // Iterate a SNAPSHOT: scala.collection.mutable.HashMap.put grows the
        // table (contentSize+1 >= threshold) before discovering the key
        // already exists, so even a value-only write during foreach can
        // rehash mid-iteration and silently skip entries.
        MisraGriesAgg.snapshot(buf.counters).foreach { case (ky, c) =>
          if (c == 1L) buf.counters.remove(ky) else buf.counters(ky) = c - 1L
        }
      }
    }
    buf
  }

  override def merge(b1: MisraGriesAgg.Buf, b2: MisraGriesAgg.Buf): MisraGriesAgg.Buf = {
    b1.n += b2.n
    // b2 is a distinct deserialized buffer, so iterating it while writing b1
    // is safe; all writes below target b1 only.
    b2.counters.foreach { case (ky, c) =>
      b1.counters(ky) = b1.counters.getOrElse(ky, 0L) + c
    }
    if (b1.counters.size > k) {
      // Subtract the (k+1)-th largest count from everything; ≤ k survive.
      // Snapshot before mutating — see the update() decrement note.
      val counts = b1.counters.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      MisraGriesAgg.snapshot(b1.counters).foreach { case (ky, c) =>
        if (c - cut <= 0L) b1.counters.remove(ky) else b1.counters(ky) = c - cut
      }
    }
    b1
  }

  override def eval(buf: MisraGriesAgg.Buf): Any = {
    val keys = buf.counters.keysIterator.toArray
    java.util.Arrays.sort(keys, Ordering[String])
    new GenericInternalRow(Array[Any](
      buf.n, new GenericArrayData(keys.map(UTF8String.fromString))))
  }

  override def serialize(buf: MisraGriesAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    // length-prefixed UTF-8, not writeUTF: a general STRING key (raw
    // text, URLs, payloads) can exceed writeUTF's 64 KB modified-UTF-8
    // cap, which would throw at shuffle time instead of summarizing
    buf.counters.foreach { case (ky, c) =>
      val kb = ky.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesAgg.Buf()
    buf.n = in.readLong()
    var rem = in.readInt()
    while (rem > 0) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counters(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      rem -= 1
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("keys", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "mg_sketch"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Mutable Misra–Gries state: bounded counter table + processed total. */
  final class Buf {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var n: Long = 0L
  }

  /** Materialized (key, count) pairs — safe to iterate while mutating the
    * source map. An Array, not a view: views/iterators over the map would
    * still break when a write rehashes it. */
  private[functions] def snapshot(m: mutable.HashMap[String, Long]): Array[(String, Long)] =
    m.toArray

  /** Aggregate Column: `STRUCT<total, keys>` candidate summary of a string
    * key column, at most `k` candidates, superset-of-heavy-hitters
    * guarantee at threshold total/(k+1). */
  def mg_sketch(key: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(key), k).toAggregateExpression())
}
