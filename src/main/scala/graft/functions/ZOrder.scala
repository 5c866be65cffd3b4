package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * clustering key behind "sorted by two columns at once" file layouts:
  * range-partition + sort by the interleaved key and BOTH dimensions get
  * locality, so min/max row-group stats prune selective filters on either
  * column (a plain sort gives this for the leading column only).
  *
  * Built entirely from codegen'd bitwise built-ins (shiftleft / & / |) —
  * no UDF, no custom Expression — and replayable bit-for-bit in the
  * DuckDB oracle via [[duckSql]]: the classic power-of-two magic-mask
  * spread, all in exact BIGINT arithmetic.
  *
  * [[interleave16]] takes the LOW 16 BITS of each dimension (callers
  * bucket wider domains first — e.g. `pmod(k, 65536)` or a range-rank);
  * two 16-bit dims → a 32-bit z-value. At 100 TB the op stays a narrow
  * projection; the layout win comes from `repartitionByRange(zval)` +
  * `sortWithinPartitions(zval)` before the write.
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL),
    (4, 0x0F0F0F0FL),
    (2, 0x33333333L),
    (1, 0x55555555L))

  /** Spread the low 16 bits of `c` so bit i lands at position 2i. */
  private def spread(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (sh, mask)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  /** Morton code of (low 16 bits of x, low 16 bits of y): x in the even
    * bit positions, y in the odd.
    */
  def interleave16(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Min-max stretch of a non-negative column into the full 16-bit
    * domain: `(c · 65536) div (maxVal + 1)`. Interleaving only helps when
    * BOTH dimensions occupy comparable bit widths — a dimension with few
    * distinct values contributes only low-order bits, and the z-order
    * degenerates to a plain sort on the wider column (measured by
    * tools.ZOrderProbe: un-stretched suppkey pruned nothing). Production
    * layouts use a per-column range-bucket rank (the Delta/Iceberg
    * approach); min-max stretch is the cheap shuffle-free variant for
    * roughly-uniform keys. Exact integer arithmetic (`div`, never `/`).
    */
  def stretch16(c: Column, maxVal: Long): Column = {
    require(maxVal >= 0, s"maxVal must be non-negative, got $maxVal")
    call_function("div", c.cast("long") * lit(65536L), lit(maxVal + 1)).cast("long")
  }

  private def spreadSql(e: String): String =
    Masks.foldLeft(s"(($e)::BIGINT & 65535)") { case (x, (sh, mask)) =>
      s"(($x | ($x << $sh)) & $mask)"
    }

  /** DuckDB replay of [[interleave16]] — identical BIGINT mask/shift
    * chain (the sub-expression is duplicated textually; inputs should be
    * short column references).
    */
  def duckSql(xExpr: String, yExpr: String): String =
    s"(${spreadSql(xExpr)} | (${spreadSql(yExpr)} << 1))"
}
