package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-order dot product of two numeric array columns as a native
  * codegen'd Catalyst expression.
  *
  * Why not `aggregate(zip_with(...))`: the higher-order-function plan
  * allocates an intermediate ArrayData per row and evaluates a lambda call
  * per element — measured ~2× slower on the similarity queries' hot loop,
  * and that per-element overhead is where an ANN scorer at 100 TB spends
  * nearly all its time. This expression compiles to a tight primitive loop
  * over the two arrays (`getFloat`/`getDouble`, no boxing) inside
  * whole-stage codegen.
  *
  * Accumulation is left-to-right in double with each element widened before
  * the multiply — EXACTLY the order and widening of the HOF formulation it
  * replaces, so results are bit-identical and the DuckDB oracle SQL
  * (OracleSqlGen.dot) stays valid.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  // mismatched lengths → null, not a silent partial dot product: a ragged
  // vector is bad data, and the SQL formulation (indexing past the short
  // array) yields NULL — silent truncation would diverge from it
  override def nullable: Boolean = true

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (la.numElements() != ra.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    val n = la.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, matching SQL multiplication semantics
      // (the HOF/oracle formulations both yield NULL)
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, lt, i) * get(ra, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (la, ra) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // per-element null checks only when the array type can hold nulls
      val nullCheck =
        if (containsNull(left) || containsNull(right))
          s"if ($la.isNullAt($i) || $ra.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($la.numElements() != $ra.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $la.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ${getter(elemType(left), la, i)} * ${getter(elemType(right), ra, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** All banded-SRP band keys of one vector in a single pass — the fused
  * form of `bands × planesPerBand` [[VectorDot]]-against-literal-array
  * subtrees. Building those as separate expressions costs a 64-literal
  * array node per plane (256 subtrees for 16×16 banding): slow to
  * analyze, slow to codegen, and each row re-walks 256 expression
  * evaluations. Here the hyperplane matrix lives in ONE reference object
  * (a primitive double[][]) and the whole banding is one tight loop —
  * measured ~4× on the banded near-dup query.
  *
  * Math is BIT-IDENTICAL to the unfused form ([[graft.operators
  * .Similarity.srpBucketFrom]], which remains the constant source for the
  * DuckDB oracle SQL): per plane, elements widen float→double and
  * accumulate left-to-right; bit p of band b is set iff the dot with
  * hyperplane `b·planesPerBand + p` is > 0; key = b·2^planesPerBand +
  * bucket. A NULL element or a vector whose length differs from the
  * matrix row makes every dot NULL, and `when(dot > 0, ...)` lowers NULL
  * to bit 0 — reproduced here as an all-zero-bucket key per band.
  */
case class SrpBandKeys(child: Expression, planes: Array[Array[Double]],
                       planesPerBand: Int) extends UnaryExpression {
  require(planes.nonEmpty && planes.length % planesPerBand == 0,
    "plane count must be a positive multiple of planesPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    SrpMath.bandKeys(v.asInstanceOf[ArrayData], planes, planesPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpMath.bandKeys($v, $mat, $planesPerBand, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
}

/** Static core of [[SrpBandKeys]] (shared by eval and generated code). */
object SrpMath {
  def bandKeys(v: ArrayData, planes: Array[Array[Double]],
               planesPerBand: Int, isFloat: Boolean): ArrayData = {
    val bands = planes.length / planesPerBand
    val keys = new Array[Long](bands)
    val dims = planes(0).length
    val n = v.numElements()
    // ragged vector or null element → every dot is NULL → all bits 0
    var degenerate = n != dims
    if (!degenerate) {
      var i = 0
      while (i < n && !degenerate) { degenerate = v.isNullAt(i); i += 1 }
    }
    val stride = 1L << planesPerBand
    if (!degenerate) {
      val x = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        i += 1
      }
      var b = 0
      while (b < bands) {
        var bucket = 0L
        var p = 0
        while (p < planesPerBand) {
          val w = planes(b * planesPerBand + p)
          var acc = 0.0
          var d = 0
          while (d < dims) { acc += x(d) * w(d); d += 1 }
          if (acc > 0) bucket |= 1L << p
          p += 1
        }
        keys(b) = b * stride + bucket
        b += 1
      }
    } else {
      var b = 0
      while (b < bands) { keys(b) = b * stride; b += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(keys)
  }
}

object VectorMath {
  /** Column API over [[VectorDot]]. */
  def vectorDot(a: Column, b: Column): Column =
    GraftShim.column(VectorDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API over [[SrpBandKeys]]. */
  def srpBandKeys(v: Column, planes: Array[Array[Double]],
                  planesPerBand: Int): Column =
    GraftShim.column(SrpBandKeys(GraftShim.expression(v), planes, planesPerBand))
}
