package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a compiled runtime helper: the
  * already-normalized fast path (the overwhelming majority of crawl text
  * is ASCII, which `isNormalized` confirms in one linear scan without
  * allocating) returns the input `UTF8String` untouched; only
  * decomposed-form strings pay the compose-and-reencode cost. */
object TextNormOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — Unicode NFC normalization as a native codegen
  * expression (stays inside whole-stage codegen; no UDF serialization,
  * no Row boxing). Null-safe: NULL in, NULL out. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullSafeEval(input: Any): Any =
    TextNormOps.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormOps.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormExpressions {
  /** Idempotently registers the normalization expressions. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")

  def nfc(c: Column): Column = call_function("graft_nfc", c)
}
