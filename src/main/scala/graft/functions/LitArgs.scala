package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Literal-argument extraction for the SQL-registered expression builders:
  * several graft functions take a plan-time constant (a signature width, a
  * band count, a modulus) that parameterizes the generated code and so
  * must be a foldable integral literal, not a column. A bare
  * `eval(null)` on a column reference dies with an opaque NPE at planning
  * time; this guard raises the same analysis error Spark's built-in
  * literal-argument functions use (`NON_FOLDABLE_ARGUMENT`), naming the
  * function and parameter.
  */
private[functions] object LitArgs {
  private def integral(fn: String, param: String, e: Expression): Long = {
    val ok = e.foldable && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val v = if (ok) e.eval(null) else null
    if (v == null) throw new AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s""""$fn"""", "paramName" -> s""""$param"""",
        "paramType" -> "\"INT\""))
    v.asInstanceOf[Number].longValue()
  }

  /** Foldable non-null integral argument as Int. An out-of-Int-range long
    * literal raises an analysis error instead of silently wrapping
    * (e.g. `graft_minhash_sig(text, 5000000000)` must not become a
    * negative k) — with a RANGE-oriented message, not NON_FOLDABLE:
    * the argument IS a foldable literal, its value is merely too large,
    * and the error must name the actual problem. */
  def int(fn: String, param: String, e: Expression): Int = {
    val v = integral(fn, param, e)
    if (v < Int.MinValue || v > Int.MaxValue) throw new AnalysisException(
      "INVALID_NUMERIC_LITERAL_RANGE",
      Map("rawStrippedQualifier" -> s"$v (parameter $param of $fn)",
        "typeName" -> "INT", "minValue" -> Int.MinValue.toString,
        "maxValue" -> Int.MaxValue.toString))
    v.toInt
  }

  /** Foldable non-null integral argument as Long. */
  def long(fn: String, param: String, e: Expression): Long =
    integral(fn, param, e)
}
