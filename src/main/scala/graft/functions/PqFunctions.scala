package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization (PQ) expressions — the vector-compression path for
  * ANN at 100 TB scale (Jegou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011). The embedding is split into `m`
  * subspaces; each subspace is quantized independently against a `ksub`-
  * entry codebook, so a 64-dim float vector (256 bytes) compresses to `m`
  * small codes (8 bytes at m=8) — a 32x reduction of what the query-time
  * scan has to read. Queries never decode the corpus: a per-query lookup
  * table (LUT) of subspace dot products turns each candidate's score into
  * `m` array lookups (asymmetric distance computation, ADC).
  *
  * All three expressions follow the [[CentroidRanks]] pattern: the
  * codebook rides along as a codegen reference object and the hot loop
  * compiles into whole-stage codegen (interpreted `eval` kept in sync for
  * the fallback path). Determinism contract (same as the IVF/k-means
  * family): every dot product accumulates left-to-right in double over
  * float inputs, so the DuckDB oracle replays bit-identical values with
  * `list_dot_product` over `DOUBLE[]` casts.
  *
  * Codebook layout: `codebook(j)(i)` = codeword `i` of subspace `j`
  * (length = subDim). Encoding picks, per subspace, the codeword
  * minimizing squared L2 distance via the expansion
  * `argmin_i (c_i.c_i - 2 x_j.c_i)` (the `x_j.x_j` term is constant per
  * row) with ties broken toward the smaller index — a pure function of
  * the inputs, so re-partitioning cannot change any code.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  private val m = codebook.length
  private val ksub = codebook.head.length
  private val subDim = codebook.head.head.length

  /** Flat float matrix: row j*ksub+i = codeword i of subspace j. */
  @transient private lazy val mat: Array[Array[Float]] =
    codebook.flatMap(_.map(_.map(_.toFloat).toArray)).toArray

  /** Codeword self-dot c.c per flat row, double left-to-right — the
    * constant term of the squared-L2 expansion. */
  @transient private lazy val cc: Array[Double] =
    mat.map { row =>
      var d = 0.0
      var i = 0
      while (i < row.length) { d += row(i).toDouble * row(i).toDouble; i += 1 }
      d
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var bestI = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < ksub) {
        val row = mat(j * ksub + i)
        var dot = 0.0
        var t = 0
        while (t < subDim) {
          dot += row(t).toDouble * x.getFloat(base + t).toDouble
          t += 1
        }
        val d = cc(j * ksub + i) - 2.0 * dot
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      out(j) = bestI
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: no generated line may START with '|' (codegen Blocks stripMargin
    // the assembled source a second time — see CentroidRanks).
    val matRef = ctx.addReferenceObj("pqmat", mat, "float[][]")
    val ccRef = ctx.addReferenceObj("pqcc", cc, "double[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val row = ctx.freshName("row")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val bestI = ctx.freshName("bestI")
      val bestD = ctx.freshName("bestD")
      s"""
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $bestI = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $i = 0; $i < $ksub; $i++) {
         |    float[] $row = $matRef[$j * $ksub + $i];
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      $dot += (double) $row[$t] * (double) $v.getFloat($j * $subDim + $t);
         |    }
         |    double $d = $ccRef[$j * $ksub + $i] - 2.0 * $dot;
         |    if ($d < $bestD) { $bestD = $d; $bestI = $i; }
         |  }
         |  $out[$j] = $bestI;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `lut[j*ksub+i] = dot(x_subj, c_{j,i})`
  * (double, left-to-right). Computed once per QUERY row — the m*ksub*subDim
  * multiplies happen on the tiny broadcast side, turning every corpus
  * candidate's score into `m` array reads ([[PqAdcLookup]]).
  */
case class PqLut(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  private val m = codebook.length
  private val ksub = codebook.head.length
  private val subDim = codebook.head.head.length

  @transient private lazy val mat: Array[Array[Float]] =
    codebook.flatMap(_.map(_.map(_.toFloat).toArray)).toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var i = 0
      while (i < ksub) {
        val row = mat(j * ksub + i)
        var dot = 0.0
        var t = 0
        while (t < subDim) {
          dot += row(t).toDouble * x.getFloat(j * subDim + t).toDouble
          t += 1
        }
        out(j * ksub + i) = dot
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqmat", mat, "float[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val row = ctx.freshName("row")
      val dot = ctx.freshName("dot")
      s"""
         |double[] $out = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $i = 0; $i < $ksub; $i++) {
         |    float[] $row = $matRef[$j * $ksub + $i];
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      $dot += (double) $row[$t] * (double) $v.getFloat($j * $subDim + $t);
         |    }
         |    $out[$j * $ksub + $i] = $dot;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_j lut[j*ksub + codes[j]], summed in subspace order — the
  * approximate inner product between the query (via its LUT) and a
  * PQ-encoded corpus vector. The per-candidate cost is `m` array reads:
  * this is the expression the 100 TB scan spends its time in, which is
  * why it is a codegen'd primitive loop and not a HOF chain.
  */
case class PqAdcLookup(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double> lut, array<int> codes), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      s += lut.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val mv = ctx.freshName("m")
      s"""
         |double $s = 0.0;
         |int $mv = $r.numElements();
         |for (int $j = 0; $j < $mv; $j++) {
         |  $s += $l.getDouble($j * $ksub + $r.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {

  def encode(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebook))

  def lut(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqLut(Bridge.expression(vec), codebook))

  def adc(lut: Column, codes: Column, ksub: Int): Column =
    Bridge.column(PqAdcLookup(Bridge.expression(lut), Bridge.expression(codes), ksub))
}
