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
  * The p ≥ 0 / q > 0 domain is ENFORCED in the emitted SQL, not just
  * documented: Spark's integer `div` truncates toward zero while
  * DuckDB's `//` floors, so a future call site fed a negative numerator
  * (a signed value sum, say) would silently reopen the exact
  * engine-divergence class this helper exists to close. Both emitters
  * wrap the arithmetic in a CASE whose out-of-domain branch raises
  * (`raise_error` / `error`) — loud and identical in both engines, one
  * comparison per output row (the rounding sites are aggregate final
  * projections or pair-stream tails; measured noise). NULL inputs take
  * an explicit leading CASE branch to a NULL result — relying on the
  * comparison's NULL would both mis-fire the guard (p NULL, q <= 0 →
  * NULL OR TRUE = TRUE raises) and, under Spark's default ANSI mode,
  * reach a raising `div 0` in the arithmetic — preserving the
  * null-propagation contract above.
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
  /** Out-of-domain branch: raises in the engine named by `div` (Spark
    * `div` ↔ `raise_error`, DuckDB `//` ↔ `error`), CAST so the CASE
    * type-checks as DOUBLE in both. */
  private def domainGuard(p: String, q: String, body: String,
      div: String): String = {
    val raise =
      if (div == "div") "raise_error('ExactRound domain: p < 0 or q <= 0')"
      else "error('ExactRound domain: p < 0 or q <= 0')"
    // The leading IS NULL branch keeps the NULL-propagation contract
    // airtight under three-valued logic (r15 ADVICE: with a bare
    // `p < 0 OR q <= 0`, p NULL with q <= 0 gives NULL OR TRUE = TRUE
    // and the guard raises on an input the contract says yields NULL)
    // AND keeps the arithmetic body unevaluated for such rows — under
    // Spark's default ANSI mode `NULL div 0` in the ELSE branch would
    // itself raise DIVIDE_BY_ZERO.
    s"(CASE WHEN ($p) IS NULL OR ($q) IS NULL THEN CAST(NULL AS DOUBLE) " +
      s"WHEN ($p) < 0 OR ($q) <= 0 THEN CAST($raise AS DOUBLE) " +
      s"ELSE $body END)"
  }

  private def emit(p: String, q: String, k: Int, div: String): String = {
    val pw = pow10(k)
    domainGuard(p, q,
      s"(CAST(($p) $div ($q) AS DOUBLE) + " +
        s"CAST((2*(($p) % ($q))*$pw + ($q)) $div (2*($q)) AS DOUBLE) / $pw)",
      div)
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
    domainGuard(p, q,
      s"(CAST(((($p) $div ($q)) + ((2*(($p) % ($q)) + ($q)) $div (2*($q)))) " +
        s"AS DOUBLE) / $pw)",
      div)
  }

  def unitMeanSpark(p: String, q: String, k: Int): String =
    emitUnitMean(p, q, k, "div")

  def unitMeanDuck(p: String, q: String, k: Int): String =
    emitUnitMean(p, q, k, "//")
}
