package graft.operators

/** Exact round-half-up of an integer rational p/q at 10⁻ᵏ, emitted as
  * engine SQL producing a DOUBLE — the one definition behind every
  * rounded ratio-of-integers column in the catalog (the r14 knife-edge
  * class: a true value landing exactly on a half at the rounding
  * precision makes `round(double, k)` engine-dependent; see t04/q33 in
  * BASELINE.md R14.2/R14.8).
  *
  * Overflow-safe form — the NUMERATOR is never multiplied:
  * {{{
  *   round_k(p/q) = (p div q) + ((2·(p mod q)·10ᵏ + q) div (2·q)) / 10ᵏ
  * }}}
  * The remainder is < q, so the largest intermediate is ~2·q·10ᵏ. The
  * naive `(2·10ᵏ·p + q) div (2q)` overflows long when p > ~4.6·10¹⁸/10ᵏ
  * — e04's summed microsecond deltas get there within one decade of
  * sf10, while DuckDB silently computes the same expression in HUGEINT
  * (r14 review finding #1). Domain: p ≥ 0, q > 0, and 2·q·10ᵏ must fit
  * in long (q ≤ ~4.6·10¹⁴ at k=4) — q is a count at every call site.
  * Null in p or q propagates to a null result in both engines.
  *
  * Both emitters produce the IDENTICAL arithmetic (integer div/mod, one
  * double division, one addition), so the engines agree bit-for-bit.
  */
object ExactRound {
  private def pow10(k: Int): Long = {
    require(k >= 1 && k <= 9, s"k=$k out of the supported 1..9")
    var p = 1L; (1 to k).foreach(_ => p *= 10); p
  }

  // NOTE: a `10000.0` literal is DECIMAL in Spark SQL (and DuckDB), so
  // every division below is written CAST(int AS DOUBLE) / int-literal —
  // otherwise the result column silently comes out DECIMAL on the Spark
  // side (caught by the board: `0.5833000` vs the oracle's `0.5833`).
  private def emit(p: String, q: String, k: Int, div: String): String = {
    val pw = pow10(k)
    s"(CAST(($p) $div ($q) AS DOUBLE) + " +
      s"CAST((2*(($p) % ($q))*$pw + ($q)) $div (2*($q)) AS DOUBLE) / $pw)"
  }

  /** Spark SQL (for `expr(...)`): integer division is `div`. */
  def spark(p: String, q: String, k: Int): String = emit(p, q, k, "div")

  /** DuckDB SQL (for oracle strings): integer division is `//`. */
  def duck(p: String, q: String, k: Int): String = emit(p, q, k, "//")

  /** Mean of a sum `p` ALREADY in 10⁻ᵏ units (e.g. Σqk where qk =
    * quality·10⁴) over count `q`, rounded half-up to the unit and
    * presented back in natural units: `round_half_up(p/q) / 10ᵏ`.
    * Overflow-safe: the carry term works on the remainder only. */
  private def emitUnitMean(p: String, q: String, k: Int,
      div: String): String = {
    val pw = pow10(k)
    s"(CAST(((($p) $div ($q)) + ((2*(($p) % ($q)) + ($q)) $div (2*($q)))) " +
      s"AS DOUBLE) / $pw)"
  }

  def unitMeanSpark(p: String, q: String, k: Int): String =
    emitUnitMean(p, q, k, "div")

  def unitMeanDuck(p: String, q: String, k: Int): String =
    emitUnitMean(p, q, k, "//")
}
