package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash over a string's code points:
  * `h = fold(0, cp => (h * 31 + cp) mod 1e9+7)`.
  *
  * This is the engine's shared, *oracle-replayable* hash: unlike
  * xxhash64/murmur (whose exact values differ between engines), this is
  * plain integer arithmetic DuckDB reproduces verbatim with
  * `list_reduce(list_prepend(0, list_transform(regexp_extract_all(s,'.'),
  * c -> unicode(c)::BIGINT)), (acc,c) -> (acc*31 + c) % 1000000007)`.
  * It seeds document fingerprinting, shingle hashing, MinHash permutations
  * and SimHash bits (graft.ext.Dedup / TextAnalysis).
  *
  * Codegen: a tight per-codepoint loop inside whole-stage codegen — no UDF
  * boxing; values never exceed ~2^60 so the modular arithmetic stays in
  * long range. ASCII inputs match the DuckDB replay exactly; supplementary
  * planes also match (both sides walk code points).
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def apply(c: Column): Column =
    Bridge.column(PolyHash(Bridge.expression(c)))

  /** The DuckDB replay of this hash for oracle SQL construction. */
  def duckSql(sExpr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"regexp_extract_all($sExpr, '.'), c -> unicode(c)::BIGINT)), " +
      s"(acc, c) -> (acc * 31 + c) % 1000000007)"
}
