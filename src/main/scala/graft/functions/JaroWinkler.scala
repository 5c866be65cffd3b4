package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression —
  * Spark has `levenshtein` but no Jaro-Winkler, and the record-linkage
  * literature (Fellegi-Sunter matchers, q279) leans on JW for
  * name/title fields because it rewards shared prefixes and tolerates
  * transpositions.
  *
  * Semantics are pinned BYTE-FOR-BYTE to DuckDB's
  * `jaro_winkler_similarity` (the oracle), verified empirically on 20k
  * random pairs plus unicode probes:
  *  - operates on the UTF-8 BYTE sequences, not code points ('café' vs
  *    'cafe' is a 5-vs-4-byte comparison; confirmed 0.8483... both
  *    engines). That makes `UTF8String.getBytes` the natural input —
  *    no string decode at all.
  *  - either side empty → 0.0 (DuckDB returns 0.0 even for two empty
  *    strings).
  *  - jaro = (m/len1 + m/len2 + (m-t)/m) / 3.0 in exactly that
  *    left-to-right order (each division correctly rounded, so the
  *    three-term sum is bit-identical across engines).
  *  - Winkler boost only when jaro > 0.7: jw = j + l·0.1·(1-j) with l
  *    = common prefix length capped at 4 BYTES.
  *
  * The match window is max(len1,len2)/2 - 1 (floored at 0); the
  * two-pass matches/transpositions walk is the textbook algorithm. The
  * O(len1·window) inner loop runs over a stack byte pair — for the
  * bounded fields this engine scores (title prefixes, names) it stays
  * cache-resident; whole-stage codegen calls the shared static helper
  * so interpreted and compiled paths are one implementation.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.simBytes(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.simBytes(" +
        s"$l.getBytes(), $r.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The one shared implementation — called by both `nullSafeEval` and
    * the generated code (the companion's static forwarder makes this
    * reachable from Janino-compiled Java).
    */
  def simBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true
          m2(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val j0 = (md / l1 + md / l2 + (m - t).toDouble / md) / 3.0
    if (j0 > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1(l) == s2(l)) l += 1
      j0 + l * 0.1 * (1.0 - j0)
    } else j0
  }

  def sim(a: String, b: String): Double =
    simBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  def apply(l: Column, r: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(l), Bridge.expression(r)))
}
