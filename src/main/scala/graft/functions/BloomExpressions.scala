package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen probe of a broadcast [[BloomFilter]] — the map-side prefilter
  * [[graft.operators.CurationOps.decontamBloom]] runs over every corpus
  * shingle. Spark's own `BloomFilterMightContain` is internal API, and a
  * scala `udf` breaks whole-stage codegen at exactly the hottest filter
  * in the pipeline; this expression keeps the probe inside the generated
  * loop. The probe hashes the UTF-8 BYTES (`mightContainBinary` over
  * `UTF8String.getBytes`) — bit-compatible with the `putString` path
  * `DataFrameStatFunctions.bloomFilter` used to build the filter, and no
  * per-row String decode. NULL in → NULL out (standard null-safe scalar
  * semantics; the caller's filter drops NULL shingles either way).
  */
case class BloomMightContain(child: Expression, bfB: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    bfB.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle rides the generated class's reference array;
    // .value() resolves executor-side to the local deserialized filter
    val ref = ctx.addReferenceObj("bloomBroadcast", bfB,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $ref.value()).mightContainBinary($c.getBytes());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column probing `bfB` with full codegen. Registers a per-broadcast
    * temp function (the registry is how a library Column reaches a
    * custom Expression without private Spark API) — one tiny registry
    * entry per built filter, re-registration idempotent. */
  def might_contain(s: SparkSession, bfB: Broadcast[BloomFilter], c: Column): Column = {
    val name = s"graft_bloom_might_contain_${bfB.id}"
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContain(exprs.head, bfB), "built-in")
    call_function(name, c)
  }
}
