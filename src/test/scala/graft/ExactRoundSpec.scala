package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactRound

/** Pins [[graft.operators.ExactRound]] — the one emitter behind every
  * rounded integer-ratio column (the r14 knife-edge class) — against a
  * BigDecimal HALF_UP reference, through actual Spark evaluation:
  * exact half ties round UP, the overflow zone that killed the naive
  * `(2·10ᵏ·p + q)` form is handled (p near Long.MaxValue), nulls
  * propagate, and the result type is DOUBLE (a `10000.0` literal in
  * Spark SQL is DECIMAL — the sf0.001 board caught the first draft
  * rendering `0.5833000`). */
class ExactRoundSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-exactround-test").master("local[2]")
    .config("spark.sql.shuffle.partitions", "2").getOrCreate()

  private def reference(p: Long, q: Long, k: Int): Double =
    new JBigDecimal(p)
      .divide(new JBigDecimal(q), k, RoundingMode.HALF_UP)
      .doubleValue()

  private def viaSpark(p: Long, q: Long, k: Int): (Double, String) = {
    import spark.implicits._
    val df = Seq((p, q)).toDF("p", "q")
      .select(expr(ExactRound.spark("p", "q", k)).as("r"))
    (df.head().getDouble(0), df.schema("r").dataType.typeName)
  }

  private val cases = Seq[(Long, Long, Int)](
    (33492L, 64000L, 6),          // q33's sf10 catch: exactly 0.5233125
    (216348000L, 23232L, 8),      // t04's rational, deeper precision
    (1L, 32L, 4),                 // 0.03125 — exact 4-digit half from t16
    (5L, 66L, 4),                 // non-tie control (0.0758)
    (0L, 7L, 6), (7L, 7L, 4),     // zero and exact-1 edges
    (1234567L, 1L, 2),            // q = 1: pure integer
    // the old form's overflow zone: 2·10ᵏ·p would wrap, the
    // remainder-only form must not (p ≈ Long.Max/2, q a plain count)
    (Long.MaxValue / 2 - 3L, 997L, 2),
    (4611686018427387123L, 1000000L, 2)) // e04 shape: Σµs over n·10⁶

  test("matches BigDecimal HALF_UP, including exact halves and the overflow zone") {
    cases.foreach { case (p, q, k) =>
      val want = reference(p, q, k)
      val (got, tpe) = viaSpark(p, q, k)
      assert(tpe == "double", s"($p/$q, k=$k) must be DOUBLE, got $tpe")
      // ipart + frac may differ from the reference double by one ulp of
      // the integer part; require exactness where the reference is a
      // clean k-digit decimal near 1, and ≤1-ulp agreement elsewhere
      assert(math.abs(got - want) <= math.ulp(want),
        s"($p/$q, k=$k): got $got want $want")
    }
  }

  test("the documented knife edges round half UP exactly") {
    assert(viaSpark(33492L, 64000L, 6)._1 == 0.523313)
    assert(viaSpark(1L, 32L, 4)._1 == 0.0313)
  }

  test("unitMean: a qk-unit sum averages back to natural units, ties up") {
    import spark.implicits._
    // Σqk = 18627, n = 2 → mean 9313.5 qk → half-up 9314 → 0.9314
    val r = Seq((18627L, 2L)).toDF("sq", "n")
      .select(expr(ExactRound.unitMeanSpark("sq", "n", 4)).as("r"))
    assert(r.schema("r").dataType.typeName == "double")
    assert(r.head().getDouble(0) == 0.9314)
  }

  test("out-of-domain inputs raise in BOTH emitters (r14 verdict ask #6)") {
    import spark.implicits._
    // Spark `div` truncates toward zero, DuckDB `//` floors — a negative
    // numerator would silently diverge between the engines, so the
    // emitted SQL itself must refuse (not just the scaladoc).
    Seq((-3L, 7L), (3L, 0L), (3L, -7L)).foreach { case (p, q) =>
      val e = intercept[Exception] {
        Seq((p, q)).toDF("p", "q")
          .select(expr(ExactRound.spark("p", "q", 4)).as("r")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("ExactRound domain")),
        s"($p/$q) must raise the domain error, got: ${e.getMessage}")
      val eu = intercept[Exception] {
        Seq((p, q)).toDF("p", "q")
          .select(expr(ExactRound.unitMeanSpark("p", "q", 4)).as("r")).collect()
      }
      assert(msgs(eu).exists(_.contains("ExactRound domain")))
    }
    // and the DuckDB emitter carries the equivalent guard text
    assert(ExactRound.duck("p", "q", 4).contains(
      "CASE WHEN (p) IS NULL OR (q) IS NULL THEN CAST(NULL AS DOUBLE) " +
        "WHEN (p) < 0 OR (q) <= 0 THEN CAST(error("))
    // in-domain rows are untouched by the guard (whole-path sanity)
    assert(viaSpark(29L, 32L, 4)._1 == 0.9063) // the jaccard 4-decimal half
  }

  test("null inputs propagate to null, not an error") {
    import spark.implicits._
    val r = Seq((Some(3L), Option.empty[Long])).toDF("p", "q")
      .select(expr(ExactRound.spark("p", "q", 4)).as("r"),
        expr(ExactRound.unitMeanSpark("q", "p", 4)).as("u"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // the three-valued-logic corner (r15 ADVICE): p NULL with q OUT OF
    // domain must still propagate NULL — a bare `p < 0 OR q <= 0` guard
    // evaluates NULL OR TRUE = TRUE and raises instead
    val c = Seq((Option.empty[Long], Some(0L))).toDF("p", "q")
      .select(expr(ExactRound.spark("p", "q", 4)).as("r"),
        expr(ExactRound.unitMeanSpark("p", "q", 4)).as("u"))
      .head()
    assert(c.isNullAt(0) && c.isNullAt(1))
  }
}
