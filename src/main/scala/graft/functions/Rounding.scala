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
  def stableRound6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  def duckSql(expr: String): String =
    s"floor(($expr) * 1000000 + 0.5) / 1000000"
}
