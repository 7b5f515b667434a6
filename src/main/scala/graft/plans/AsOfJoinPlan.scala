package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join: SURVEY §7.3 tier (c) — a whole-operator extension as
  * custom LogicalPlan + SparkStrategy + SparkPlan, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (graft.GraftExtensions).
  *
  * Semantics: for every left row, append the right row with the same key
  * and the greatest time <= the left row's time (nulls if none) — i.e.
  * DuckDB `ASOF JOIN ... ON l.key = r.key AND l.time >= r.time`, left-outer
  * flavor. EventOps.e05 expresses the same thing compositionally
  * (union + last-over-window); this operator is the dedicated physical
  * implementation, and e06 checks both against the same DuckDB oracle.
  *
  * Scale design: requiredChildDistribution co-partitions both sides by key
  * (one hash shuffle each, exactly what a shuffle join pays) and
  * requiredChildOrdering sorts within partitions by (key, time) — then the
  * merge is a single forward pass per partition holding ONE buffered right
  * row: no range explosion, no per-key buffering of the right side, state
  * O(1) regardless of key skew. This is the sort-merge-join shape, with
  * the inner loop replaced by last-candidate tracking.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Double] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin to its physical operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    direction: String = "backward",
    tolerance: Option[Double] = None) extends BinaryExecNode {

  // Validate at planning, not first execution: a logical AsOfJoin built
  // directly (bypassing AsOf.join's API checks — e.g. a future SQL
  // surface) must still fail with a named message, not a generic
  // "unorderable runtime values" IllegalStateException mid-task.
  require(Set("backward", "forward", "nearest")(direction),
    s"asof join: direction must be backward|forward|nearest, got $direction")
  require(tolerance.forall(_ >= 0), "asof join: tolerance must be >= 0")
  require(direction != "nearest" || leftTime.dataType.typeName != "string",
    "asof join: direction=nearest needs a numeric/timestamp/date time " +
      "column (string times have no distance)")
  require(tolerance.isEmpty || leftTime.dataType.typeName != "string",
    "asof join: tolerance needs a numeric/timestamp/date time column " +
      "(string times have no distance)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition by key: EnsureRequirements inserts compatible hash
    * exchanges (or reuses existing ones) for both children. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Within-partition (key, time) order on both sides → one-pass merge. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  /** Orderable atomic types only (long/int/string/timestamp/date/double) —
    * checked when the operator is built (AsOf.join). */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(x, y)
    case (x: java.lang.Integer, y: java.lang.Integer) => java.lang.Integer.compare(x, y)
    case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: java.lang.Comparable[Any] @unchecked, y) => x.compareTo(y)
    case _ => throw new IllegalStateException(
      s"asof join: unorderable runtime values $a / $b")
  }

  /** |a − b| as double, for the nearest direction's distance comparison.
    * Time values reaching here are numeric at runtime (timestamp → micros
    * long, date → days int; AsOf.join rejects string times for nearest). */
  private def dist(a: Any, b: Any): Double = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number) =>
      math.abs(x.doubleValue() - y.doubleValue())
    case _ => throw new IllegalStateException(
      s"asof nearest: non-numeric time values $a / $b")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyE = BindReferences.bindReference(lk, lOut)
      val lTimeE = BindReferences.bindReference(lt, lOut)
      val rKeyE = BindReferences.bindReference(rk, rOut)
      val rTimeE = BindReferences.bindReference(rt, rOut)
      // Bind against a RIGHT-side-nullable input schema: the unmatched-left
      // case feeds an all-null row for the right half, and a BoundReference
      // that kept the child's nullable=false would skip the null check —
      // reading 0/garbage for primitives and NPE-ing on strings.
      val proj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // One-row lookahead over the right side; `cand` is the latest right
      // row whose (key, time) is <= the current left (key, time) — the only
      // state the merge keeps, copied out of the iterator's reused buffer.
      //
      // The SAME consumption frontier serves every direction: a consumed
      // row has (rk < lk) or (rk == lk && rt <= lt), and since left rows
      // arrive in ascending (key, time), no future left row can need a
      // consumed row as its forward match (its time floor only rises).
      // Backward reads `cand`; forward reads the unconsumed `rHead` (the
      // FIRST same-key row strictly after lt, or `cand` itself when
      // rt == lt); nearest picks whichever side is closer, ties backward.
      var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
      var candRow: InternalRow = null
      var candKey: Any = null
      var candTime: Any = null
      val dir = direction
      val tol = tolerance

      lIt.map { lrow =>
        val lkV = lKeyE.eval(lrow)
        val ltV = lTimeE.eval(lrow)
        var fwdRow: InternalRow = null
        if (lkV != null && ltV != null) {
          var scanning = true
          while (scanning && rHead != null) {
            val rkV = rKeyE.eval(rHead)
            val rtV = rTimeE.eval(rHead)
            if (rkV == null || rtV == null) {
              rHead = if (rIt.hasNext) rIt.next() else null // null keys never match
            } else {
              val c = cmp(rkV, lkV)
              if (c < 0 || (c == 0 && cmp(rtV, ltV) <= 0)) {
                if (c == 0) {
                  candRow = rHead.copy()
                  candKey = rKeyE.eval(candRow)
                  candTime = rTimeE.eval(candRow)
                }
                rHead = if (rIt.hasNext) rIt.next() else null
              } else {
                if (c == 0) fwdRow = rHead // same key, strictly after lt
                scanning = false
              }
            }
          }
        }
        val backRow =
          if (lkV != null && candRow != null && cmp(candKey, lkV) == 0) candRow
          else null
        val chosen = dir match {
          case "backward" => backRow
          case "forward" =>
            // rt == lt is a forward match too, and it lives in `cand`
            if (backRow != null && cmp(candTime, ltV) == 0) backRow else fwdRow
          case "nearest" =>
            if (backRow == null) fwdRow
            else if (fwdRow == null) backRow
            else if (dist(ltV, candTime) <= dist(rTimeE.eval(fwdRow), ltV)) backRow
            else fwdRow
        }
        // tolerance: a match farther than `tol` time units is no match —
        // applied AFTER direction resolution, so backward-with-tolerance is
        // "latest at-or-before, if recent enough", the merge_asof contract
        val kept =
          if (chosen == null || tol.isEmpty) chosen
          else if (dist(ltV, rTimeE.eval(chosen)) <= tol.get) chosen
          else null
        proj(joined(lrow, if (kept != null) kept else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator. */
object AsOf {

  private val Orderable = Set("long", "int", "double", "string", "timestamp",
    "timestamp_ntz", "date", "float", "short", "byte")

  /** `left ASOF JOIN right ON left.keyCol = right.keyCol AND
    * left.timeCol >= right.timeCol` (left-outer). Column names must be
    * unique per side; the two sides must not share attribute ids (alias
    * the right side's columns if both derive from the same scan).
    *
    * `direction`:
    *   - "backward" (default): latest right row at or before the left time;
    *   - "forward": earliest right row at or after the left time;
    *   - "nearest": whichever of the two is closer in time, ties backward
    *     (numeric/timestamp/date times only — strings have no distance).
    * `tolerance`: maximum |Δt| for a match, in the time column's runtime
    * units (micros for timestamps, days for dates); a resolved match
    * farther away becomes null — pandas merge_asof's contract. Applied
    * after direction resolution in the same one-pass merge, so it costs
    * nothing and composes with all three directions.
    * Same plan shape for all: co-partitioned, sorted, one-pass,
    * O(1) state. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof join: unknown direction '$direction'")
    require(tolerance.forall(_ >= 0), "asof join: tolerance must be >= 0")
    val spark = left.sparkSession
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asof join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val dup = lPlan.outputSet.intersect(rPlan.outputSet)
    require(dup.isEmpty,
      s"asof join: sides share attributes ${dup.toSeq.map(_.name).mkString(", ")} — " +
        "alias one side's columns first")
    val (lKey, rKey) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lTime, rTime) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lKey.dataType == rKey.dataType && lTime.dataType == rTime.dataType,
      s"asof join: key/time types must match across sides, got " +
        s"${lKey.dataType.simpleString}/${rKey.dataType.simpleString} and " +
        s"${lTime.dataType.simpleString}/${rTime.dataType.simpleString}")
    Seq(lKey, lTime).foreach { a =>
      require(Orderable.contains(a.dataType.typeName),
        s"asof join: ${a.name} has unorderable type ${a.dataType.simpleString}")
    }
    require(direction != "nearest" || lTime.dataType.typeName != "string",
      "asof join: nearest needs a numeric/timestamp/date time column")
    require(tolerance.isEmpty || lTime.dataType.typeName != "string",
      "asof join: tolerance needs a numeric/timestamp/date time column " +
        "(units = the column's runtime units: micros for timestamps, days for dates)")
    Bridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan, lKey, rKey, lTime, rTime, direction, tolerance))
  }
}
