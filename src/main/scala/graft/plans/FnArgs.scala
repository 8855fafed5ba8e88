package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Literal-argument extraction for SQL function registration. The
 * native expressions take compile-time parameters (k, n, seed, flags)
 * that must be foldable literals; without the check, a column
 * reference in that position surfaces as an opaque
 * eval/ClassCastException during analysis instead of a proper
 * analyzer error naming the function.
 */
private[plans] object FnArgs {

  private def fold(fn: String, param: String, tpe: String, e: Expression): Any = {
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> fn, "paramName" -> param, "paramType" -> tpe))
    e.eval()
  }

  def intArg(fn: String, param: String, e: Expression): Int =
    fold(fn, param, "\"INT\"", e) match {
      case n: Number => n.intValue()
      case other => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> fn, "paramName" -> param, "paramType" -> s""""INT" (got $other)"""))
    }

  def longArg(fn: String, param: String, e: Expression): Long =
    fold(fn, param, "\"BIGINT\"", e) match {
      case n: Number => n.longValue()
      case other => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> fn, "paramName" -> param, "paramType" -> s""""BIGINT" (got $other)"""))
    }

  def stringArg(fn: String, param: String, e: Expression): String =
    fold(fn, param, "\"STRING\"", e) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> fn, "paramName" -> param, "paramType" -> s""""STRING" (got $other)"""))
    }

  /** Optional trailing boolean flag; absent → false. */
  def flagArg(fn: String, param: String, e: Option[Expression]): Boolean =
    e.exists(x => fold(fn, param, "\"BOOLEAN\"", x) == true)
}
