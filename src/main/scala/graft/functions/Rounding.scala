package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding for ratio-valued outputs.
  *
  * `round(x, 6)` is NOT engine-stable on arbitrary rationals: Spark rounds
  * the double's exact binary expansion (BigDecimal HALF_UP) while DuckDB
  * multiplies by 1e6 in floating point first — on boundary-adjacent values
  * the two disagree in the last digit (observed: quality score 0.817647 vs
  * 0.817646 on one fixture doc). [[stableRound6]] instead computes
  * `floor(x·1e6 + 0.5) / 1e6` as ordinary double arithmetic — the SAME
  * instruction sequence both engines execute — so identical inputs give
  * identical outputs by construction. The DuckDB replay is
  * [[duckSql]]: `floor(x * 1000000 + 0.5) / 1000000`.
  *
  * Use this for ratios/similarities (rationals with arbitrary
  * denominators). Sums of k-decimal data keep plain `round(sum, k)` —
  * there the true value is a k-decimal multiple sitting half a unit from
  * any boundary (see graft.queries.Q).
  */
object Rounding {
  def stableRound6(c: Column): Column = stableRound(c, 6)

  def duckSql(expr: String): String = duckSql(expr, 6)

  /** [[stableRound6]] at an arbitrary decimal scale (1 ≤ scale ≤ 9) —
    * same both-engines-run-identical-IEEE-ops guarantee. Use for
    * averages and other arbitrary rationals whose true value has no
    * grid-distance argument (r7 money audit: q01's avg columns, q17's
    * sum/7.0); k-decimal-exact sums keep plain `round(sum, k)`. */
  def stableRound(c: Column, scale: Int): Column = {
    val p = pow10(scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB replay of [[stableRound]] — textually the same arithmetic. */
  def duckSql(expr: String, scale: Int): String = {
    val p = pow10(scale).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }

  private def pow10(scale: Int): Double = {
    require(scale >= 1 && scale <= 9, s"scale must be in [1, 9], got $scale")
    math.pow(10.0, scale.toDouble)
  }
}
