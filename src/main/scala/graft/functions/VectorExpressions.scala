package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Cosine similarity over two `array<float>` columns as a native Catalyst
  * expression with whole-stage codegen: one fused loop computing dot
  * product and both norms.
  *
  * The composable alternative — `aggregate(zip_with(a, b, ...))` — builds
  * per-element lambda frames in the interpreted evaluator (~µs/element);
  * on pair-generation workloads (LSH candidate verification at 10⁵..10⁹
  * pairs × 64 dims) that lambda overhead dominates end-to-end runtime.
  * This expression JIT-compiles to a tight primitive loop instead.
  *
  * Accumulation order (sequential adds, double precision) matches both the
  * higher-order-function formulation and DuckDB's list_dot_product, so
  * results are bit-identical to the oracle's.
  *
  * Degenerate inputs yield NULL, never NaN: a zero-norm vector makes the
  * quotient 0/0, and Spark SQL orders NaN ABOVE every real number — one
  * corrupt embedding row would rank #1 in every descending top-k it
  * touches and pass every `>= threshold` filter. NULL instead drops out
  * of threshold filters and sorts last under the default DESC ordering,
  * so corrupt rows lose instead of win.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def nullable: Boolean = true
  // The eval/codegen paths read 4-byte floats via ArrayData.getFloat; an
  // array<double> argument (e.g. a SQL array literal) would silently
  // produce garbage without this declaration — ImplicitCastInputTypes
  // coerces castable inputs and rejects the rest at analysis time.
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isFinite(r)) r else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val r = ctx.freshName("r")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |double $r = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |if (java.lang.Double.isFinite($r)) { ${ev.value} = $r; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns (same codegen rationale,
  * same finite-or-NULL contract as [[CosineSimilarity]]: a NaN/Inf
  * component yields NULL rather than a NaN that outranks every real
  * score). */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  override def nullable: Boolean = true
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    if (java.lang.Double.isFinite(dot)) dot else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (java.lang.Double.isFinite($dot)) { ${ev.value} = $dot; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One fused kernel for a multi-table hyperplane-LSH bucket array: plane
  * p's projection is the LEFT-FOLD sum Σᵢ (double)emb[i]·w[p·dim+i] in
  * index order — bit-identical (IEEE-754) to the
  * `aggregate(zip_with(emb, w, (x,ww) -> x·ww), 0.0, +)` chain it
  * replaces, which the portable DuckDB oracle reproduces with
  * `list_reduce`. The composed form evaluated nTables×bits interpreted
  * higher-order folds per row (48 lambda-frame walks per vector); this
  * loops over ONE flattened `array<double>` plane matrix in generated
  * code, same result, same cost model (O(nPlanes·dim) flops), no
  * interpretation. Bucket t = sign bits of its planes + (t << 32), the
  * table-id fold the join key expects. */
object HyperplaneOps {
  /** `planes` is nPlanes row-major dim-length blocks; nPlanes must be a
    * multiple of bitsPerTable and align with emb's dim, else empty (a
    * silent misalignment would bucket every row wrong). The modulo check
    * cannot catch an off-dim vector whose length merely DIVIDES the
    * flattened matrix (it would slice into garbage pseudo-tables) — the
    * caller must gate on the index's fixed dim, as
    * [[graft.operators.SimilarityOps.lshBuckets]] does. */
  def buckets(emb: ArrayData, planes: ArrayData, bitsPerTable: Int): ArrayData = {
    val dim = emb.numElements()
    if (dim == 0 || bitsPerTable <= 0 || planes.numElements() % dim != 0)
      return new GenericArrayData(Array.empty[Any])
    val nPlanes = planes.numElements() / dim
    if (nPlanes % bitsPerTable != 0)
      return new GenericArrayData(Array.empty[Any])
    val nTables = nPlanes / bitsPerTable
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bits = 0L
      var j = 0
      while (j < bitsPerTable) {
        val off = (t * bitsPerTable + j) * dim
        var s = 0.0
        var i = 0
        while (i < dim) {
          s += emb.getFloat(i).toDouble * planes.getDouble(off + i)
          i += 1
        }
        if (s >= 0) bits |= (1L << j)
        j += 1
      }
      out(t) = bits + (t.toLong << 32)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `hyperplane_buckets(emb, flatPlanes, bitsPerTable)` → array<long>. */
case class HyperplaneBuckets(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HyperplaneOps.buckets(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.HyperplaneOps.buckets($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Idempotently registers the custom expressions in the session's
    * function registry (also makes them available to `spark.sql`). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_buckets",
      exprs => HyperplaneBuckets(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  def hyperplane_buckets(emb: Column, flatPlanes: Column,
      bitsPerTable: Column): Column =
    call_function("graft_hyperplane_buckets", emb, flatPlanes, bitsPerTable)

  /** Column API for the codegen'd cosine (register(s) must have run). */
  def cosine_similarity(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def float_dot(a: Column, b: Column): Column =
    call_function("graft_float_dot", a, b)
}
