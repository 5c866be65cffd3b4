package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau-Levenshtein distance (unrestricted adjacent
  * transpositions, Lowrance-Wagner) as a native codegen'd Catalyst
  * expression — Spark ships plain `levenshtein` only, and fuzzy
  * matching over typo-shaped corpora wants the transposition edit
  * ("ab"→"ba" is one error, not two).
  *
  * Semantics are pinned to DuckDB's `damerau_levenshtein` (the oracle),
  * verified empirically on 3000 random pairs plus unicode probes:
  *  - operates on UTF-8 BYTE sequences, not code points ('café' vs
  *    'cafe' is 2 — a two-byte é collapses to e via substitute+delete;
  *    confirmed against DuckDB). `UTF8String.getBytes` is therefore the
  *    natural input, no decode.
  *  - UNRESTRICTED transpositions: dl("CA","ABC") = 2 (CA→AC→ABC),
  *    where the restricted OSA variant would answer 3 — the
  *    Lowrance-Wagner `da`/`db` last-match recurrence, not the common
  *    three-term OSA loop.
  *  - empty sides degrade to plain length (insertions only).
  *
  * O(len1·len2) time and space per call over a flat int matrix; the
  * `da` last-occurrence table is a 256-slot byte index (byte-level
  * semantics make the alphabet finite — no per-call hash map). Both the
  * interpreted path and whole-stage codegen call the one static helper.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distBytes(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.distBytes(" +
        s"$l.getBytes(), $r.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner over bytes — the single shared implementation for
    * the interpreted and Janino-compiled paths.
    */
  def distBytes(s1: Array[Byte], s2: Array[Byte]): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(s2(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (s1(i - 1) == s2(j - 1)) { cost = 0; db = j }
        var v = d(i * w + j) + cost // substitute / match
        val ins = d((i + 1) * w + j) + 1
        if (ins < v) v = ins
        val del = d(i * w + j + 1) + 1
        if (del < v) v = del
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        if (tra < v) v = tra
        d((i + 1) * w + j + 1) = v
        j += 1
      }
      da(s1(i - 1) & 0xFF) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  def dist(a: String, b: String): Int =
    distBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  def apply(l: Column, r: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(l), Bridge.expression(r)))
}
