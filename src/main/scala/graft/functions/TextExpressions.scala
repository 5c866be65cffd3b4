package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-pipeline expressions replacing the interpreted
  * higher-order-function formulations (measured at sf0.1: the HOF shingle
  * builder spent 6s constructing intermediate n-gram strings through
  * per-element `element_at` lambda dispatch; these evaluate once per row
  * in compiled code with zero intermediate allocation beyond the output).
  *
  * Both produce BIT-IDENTICAL results to the formulations they replace —
  * the DuckDB oracles don't change:
  *  - [[ShingleHashes]] == `transform(array_distinct(3-grams), PolyHash)`:
  *    the hash folds word chars and the single joining space (cp 32)
  *    exactly as PolyHash folds the materialized "w1 w2 w3" string.
  *  - [[TokenizeWithOffsets]] == the `aggregate` HOF in graft.ops.Text:
  *    split on single spaces, empty tokens emit nothing and do NOT
  *    advance the offset (the reference's drift quirk,
  *    mapper_word_count.py:18-20), lengths counted in code points.
  *
  * Codegen: both generate a single static call into their `compute`
  * helper — the stage stays inside whole-stage codegen (no
  * CodegenFallback, which would force the surrounding scan+explode into
  * interpreted row-at-a-time eval); the loop itself is branchy
  * string-walking that gains nothing from inlining into the generated
  * method body, and the static call keeps generated-code size under the
  * JIT's inline caps.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c.toString(), $n);")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String].toString, n)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Mod = PolyHash.Mod

  def compute(s: String, n: Int): ArrayData = {
    // tokenize: split on single spaces, drop empties (Text.words semantics)
    val toks = new ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new ArrayBuffer[Long](toks.length - n + 1)
    var t = 0
    while (t <= toks.length - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31L + 32L) % Mod // the joining space
        val w = toks(t + j)
        var k = 0
        while (k < w.length) {
          val cp = w.codePointAt(k)
          h = (h * 31L + cp) % Mod
          k += Character.charCount(cp)
        }
        j += 1
      }
      if (seen.add(h)) out += h
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))
}

case class TokenizeWithOffsets(left: Expression, right: Expression)
    extends BinaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, b) =>
      s"${ev.value} = graft.functions.TokenizeWithOffsets.compute($l, $b);")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("off", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "tokenize_with_offsets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_with_offsets expects (string, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(line: Any, base: Any): Any =
    TokenizeWithOffsets.compute(line.asInstanceOf[UTF8String], base.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenizeWithOffsets {
  def compute(line: UTF8String, base: Long): ArrayData = {
    val s = line.toString
    var off = base
    val out = new ArrayBuffer[InternalRow]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) {
          val w = s.substring(start, i)
          out += new GenericInternalRow(Array[Any](UTF8String.fromString(w), off))
          off += w.codePointCount(0, w.length) + 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(line: Column, base: Column): Column =
    Bridge.column(TokenizeWithOffsets(Bridge.expression(line), Bridge.expression(base)))
}

/** Word n-gram STRINGS in one compiled pass — the string twin of
  * [[ShingleHashes]], with multiplicity kept (`distinct = false`, the
  * repetition-stats basis) or first-occurrence dedup (`distinct = true`,
  * the decontamination/shingle basis). Exists because the HOF
  * formulation (`transform(sequence(...), i -> concat_ws over n
  * element_at calls)`) re-evaluates the token split per element after
  * CollapseProject inlining — measured at sf0.1: q78's 8-gram explode
  * dropped 12.8s → ~1s when this replaced it.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c.toString(), $n, $distinct);")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String].toString, n, distinct)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  def compute(s: String, n: Int, distinct: Boolean): ArrayData = {
    // tokenize: split on single spaces, drop empties (Text.words semantics)
    val toks = new ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = if (distinct) new java.util.HashSet[String]() else null
    val out = new ArrayBuffer[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var t = 0
    while (t <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(t + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out += UTF8String.fromString(g)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(c), n, distinct))

  /** SQL-registry builder: `word_ngrams(str, n[, distinct])` with
    * literal n/distinct args (same literal-arg convention as
    * `lsh_bucket`).
    */
  def builder(es: Seq[Expression]): Expression = {
    val n = es(1).eval(null) match {
      case i: Number => i.intValue
      case other => throw new IllegalArgumentException(
        s"word_ngrams arg 1 must be an integer literal, got $other")
    }
    val distinct = if (es.length < 3) false else es(2).eval(null) match {
      case b: java.lang.Boolean => b.booleanValue
      case other => throw new IllegalArgumentException(
        s"word_ngrams arg 2 must be a boolean literal, got $other")
    }
    WordNgrams(es.head, n, distinct)
  }
}

/** Intersection CARDINALITY of two SORTED distinct long arrays by merge
  * walk — O(|a|+|b|), zero allocation. Replaces
  * `size(array_intersect(a, b))` in the Jaccard verify hot path, which
  * builds a hash set AND materializes the intersection array per
  * evaluation — and the filter-into-join pushdown evaluates the
  * condition's intersect up to three times per candidate row. Inputs
  * MUST be sorted ascending and duplicate-free (both shingle-hash
  * producers guarantee it: `sort_array` + ShingleHashes' first-seen
  * dedup); unsorted input silently undercounts, so the callers own that
  * invariant.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      // the sorted/dup-free invariant lives in caller discipline; a
      // violated invariant must THROW here (one extra read+compare per
      // step), not silently undercount the intersection
      if (i > 0 && a.getLong(i - 1) >= x)
        throw new IllegalArgumentException(
          s"sorted_intersect_count: left array not strictly ascending at index $i " +
            s"(${a.getLong(i - 1)} >= $x) - sort_array(array_distinct(...)) the input")
      if (j > 0 && b.getLong(j - 1) >= y)
        throw new IllegalArgumentException(
          s"sorted_intersect_count: right array not strictly ascending at index $j " +
            s"(${b.getLong(j - 1)} >= $y) - sort_array(array_distinct(...)) the input")
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}

/** Unicode NFC normalization — canonical composition (e + COMBINING
  * ACUTE → é), the hygiene step web-crawl text needs before any
  * fingerprint/dedup/tokenize pass: visually identical strings with
  * different codepoint sequences must hash identically. Wraps
  * `java.text.Normalizer` (ICU-equivalent for the canonical forms) as a
  * codegen'd expression — NOT a UDF — with an ASCII fast path: an ASCII
  * string is NFC by construction (for UTF8String, bytes == chars ⟺
  * ASCII), so the overwhelmingly-ASCII common case costs one compare and
  * zero allocation. Replayed in the oracle by DuckDB's `nfc_normalize`
  * (both implement Unicode canonical composition — q103 gates the
  * agreement byte-for-byte).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    // ASCII ⟺ numBytes == numChars: already NFC, skip the Normalizer
    // (and its char[] round-trip) entirely
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}

/** Winnowed document fingerprints (the MOSS window-min selection) in ONE
  * compiled pass per document — the operator-shaped twin of
  * graft.ext.Dedup's original formulation (posexplode the gram hashes →
  * hash-partition by doc → per-doc window min): winnowing state is
  * doc-local by definition, so distributing it as a window function paid
  * a full shuffle + sort for what a per-row monotonic-deque scan computes
  * in O(#grams). Emits the distinct selected (hash, position) pairs as
  * `array<struct<h bigint, fp_pos bigint>>`; the rightmost-on-ties rule
  * is the deque's pop-back-on->= invariant (an equal hash entering from
  * the right evicts the older occurrence), and consecutive dedup equals
  * global dedup because a displaced selection can never be re-selected
  * (its displacer is righter and ≤, and outlives it in every later
  * window). Bit-identical to the window formulation for positions
  * < 2²⁰ (the arithmetic tie-encoding the DuckDB oracle replays);
  * results are gram hashes via [[PolyHash]] over [[WordNgrams]] strings,
  * so the q208 oracle is unchanged.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowedFingerprints.compute($c.toString(), $k, $w);")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("fp_pos", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnowed_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnowed_fingerprints expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprints.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedFingerprints {

  def compute(s: String, k: Int, w: Int): ArrayData = {
    val grams = WordNgrams.compute(s, k, distinct = false)
    val n = grams.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = PolyHash.hash(grams.getUTF8String(i).toString)
      i += 1
    }
    // monotonic deque of indices: hs strictly increasing front→back;
    // >= on the pop keeps the RIGHTMOST occurrence of equal hashes
    val dq = new java.util.ArrayDeque[Integer]()
    val out = new ArrayBuffer[Any]()
    var lastSel = -1
    i = 0
    while (i < n) {
      while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      val wStart = i - w + 1
      if (wStart >= 0) { // full windows only
        while (dq.peekFirst < wStart) dq.pollFirst()
        val sel: Int = dq.peekFirst
        if (sel != lastSel) {
          out += new GenericInternalRow(Array[Any](hs(sel), sel.toLong))
          lastSel = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowedFingerprints(Bridge.expression(c), k, w))

  /** SQL-registry builder: `winnowed_fingerprints(str, k, w)` with
    * literal k/w args (the `lsh_bucket` literal-arg convention).
    */
  def builder(es: Seq[Expression]): Expression = {
    def intArg(i: Int): Int = es(i).eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"winnowed_fingerprints arg $i must be an integer literal, got $other")
    }
    WinnowedFingerprints(es.head, intArg(1), intArg(2))
  }
}
