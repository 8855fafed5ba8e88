package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native sequential dot product over two numeric vectors
 * (array<float> or array<double>): acc = Σ aᵢ·bᵢ accumulated
 * left-to-right in double — the exact fold order and arithmetic of the
 * composed `aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, +)` form, so
 * results stay bit-identical to both the previous implementation and
 * DuckDB's list fold (which the q_ann_topk oracle hash-checks).
 *
 * The composed form pays interpreted lambda dispatch per element
 * (zip_with/aggregate are CodegenFallback); candidate re-ranking calls
 * three folds per pair (dot + two norms), so this is the ANN hot path.
 */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVec(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double> inputs, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VecDot.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")
}

object VecDot {

  /** Left-to-right double fold, identical to aggregate(zip_with(...)).
    * Lengths must match (zip_with would null-pad and null-poison the
    * sum; vectors in one column family share a width by construction). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")

  def apply(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
