package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native sequential squared-L2 distance over two numeric vectors
 * (array<float> or array<double>): acc = Σ (aᵢ−bᵢ)² accumulated
 * left-to-right in double — the exact fold order and arithmetic of
 * the composed `aggregate(zip_with(a, b, (x, y) -> (x−y)*(x−y)),
 * 0.0, +)` form, so results stay bit-identical to the previous
 * implementation and to the oracles' list folds.
 *
 * The composed form pays interpreted lambda dispatch per element
 * (zip_with/aggregate are CodegenFallback); the PQ family calls this
 * fold once per (vector, subspace, code) triple in encode and per
 * distance-table cell in ADC — the [[VecDot]] hot-path argument,
 * applied to the distance kernel (round 17).
 *
 * Null contract, identical to the composed form: a length mismatch
 * or a null ELEMENT in either vector nulls the whole fold (zip_with
 * null-pads the short side and the null poisons the sum) — a
 * malformed vector yields NULL, never a plausible partial distance.
 */
case class VecDist2(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVec(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dist2 requires two array<float|double> inputs, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDist2 = copy(left = newLeft, right = newRight)

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else VecDist2.dist2OrNull(av, bv, isFloat(left), isFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("d2Res")
      s"""
        if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
        else {
          java.lang.Double $boxed = graft.plans.VecDist2.dist2OrNull($a, $b,
            ${isFloat(left)}, ${isFloat(right)});
          if ($boxed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $boxed.doubleValue(); }
        }"""
    })
}

object VecDist2 {

  /** Left-to-right (x−y)² double fold; null on any null element —
    * see the class scaladoc for the contract argument. */
  def dist2OrNull(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (x - y) * (x - y)
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dist2", exprs => VecDist2(exprs.head, exprs(1)), "built-in")

  def dist2(a: Column, b: Column): Column = call_function("vec_dist2", a, b)
}
