package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Centroid-scan expressions for the IVF ANN index.
  *
  * The composable formulation — `array_max(array(struct(cos(emb, c0), 0),
  * struct(cos(emb, c1), 1), ...))` with one struct per centroid — unrolls
  * kC copies of the cosine loop into the generated code. At the √N
  * cluster heuristic's kC=45 (sf0.1 corpus) that made Janino compilation
  * dominate the query (measured: ann_ivf_topk 3.2s → 41.8s after the
  * heuristic landed). These expressions take the centroid matrix as ONE
  * flattened `array<float>` literal and LOOP over it — generated code
  * size is constant in kC, per-row cost is the same O(kC·dim) multiply
  * chain, still no join and no shuffle for the assignment stage.
  *
  * Ties on equal cosine pick the lower centroid id (deterministic).
  */
object CentroidOps {
  /** Cosine-ranking score of every centroid against `emb`; `cents` is kC
    * row-major dim-length blocks. Query-side norm is rank-invariant and
    * skipped; centroid norms are recomputed per row — dim·kC flops,
    * negligible vs the dot products. Zero-norm centroids and NaN inputs
    * score -Infinity. Returns an empty array on degenerate input (empty
    * embedding, or a centroid matrix not a multiple of the embedding
    * dim — a silent misalignment would mis-score every row). */
  private def scores(emb: ArrayData, cents: ArrayData): Array[Double] = {
    val dim = emb.numElements()
    if (dim == 0 || cents.numElements() % dim != 0) return Array.empty
    val kC = cents.numElements() / dim
    val out = new Array[Double](kC)
    var c = 0
    while (c < kC) {
      var dot = 0.0; var nc = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        val x = emb.getFloat(i).toDouble
        val y = cents.getFloat(off + i).toDouble
        dot += x * y; nc += y * y
        i += 1
      }
      val s = if (nc == 0.0) Double.NegativeInfinity else dot / math.sqrt(nc)
      out(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    out
  }

  /** Index of the max-cosine centroid (ties → lower id), or -1 on
    * degenerate input. */
  def nearest(emb: ArrayData, cents: ArrayData): Int = {
    val sc = scores(emb, cents)
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < sc.length) {
      if (sc(c) > bestScore) { bestScore = sc(c); best = c }
      c += 1
    }
    if (best < 0 && sc.nonEmpty) 0 else best // all -Inf: any id, pick 0
  }

  /** Ids of the `k` highest-cosine centroids, descending (ties → lower
    * id first). kC is at most a few thousand; selection is a simple
    * k-pass argmax over the score array. All--Infinity tails fall back
    * to ascending ids so the result always has min(k, kC) entries. */
  def probe(emb: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val sc = scores(emb, cents)
    val kC = sc.length
    val n = math.max(0, math.min(k, kC))
    val out = new Array[Int](n)
    val taken = new Array[Boolean](kC)
    var j = 0
    while (j < n) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c2 = 0
      while (c2 < kC) {
        if (!taken(c2) && sc(c2) > bestScore) { bestScore = sc(c2); best = c2 }
        c2 += 1
      }
      if (best < 0) { // remaining scores all -Infinity: first untaken id
        var c3 = 0
        while (best < 0 && c3 < kC) { if (!taken(c3)) best = c3; c3 += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out.map(Int.box))
  }
}

/** `nearest_centroid(emb, flatCents)` → int centroid id. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any =
    CentroidOps.nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CentroidOps.nearest($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `probe_centroids(emb, flatCents, k)` → array<int> of top-k ids. */
case class ProbeCentroids(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "probe_centroids"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    CentroidOps.probe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.CentroidOps.probe($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Element-wise vector sum over an `array<float>` column — the Lloyd-round
  * mean's aggregation, as a typed [[org.apache.spark.sql.expressions.Aggregator]]
  * (ObjectHashAggregate with map-side partial aggregation): each input
  * split contributes ONE kC×dim partial per cluster to the shuffle. The
  * `posexplode → groupBy(cl, pos) → avg` formulation it replaces shuffled
  * a 64× row blowup of the corpus every Lloyd round. Empty buffer = no
  * rows; mismatched dims fail fast (a silent zip would mis-train every
  * centroid). */
object VecSumAgg
    extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.empty[Double]
  override def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
    if (b.isEmpty) a.toArray.map(_.toDouble)
    else {
      require(b.length == a.length, s"dim mismatch: ${b.length} vs ${a.length}")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }
  }
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length, s"dim mismatch: ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
  }
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object CentroidExpressions {
  /** Idempotent per-session registration (same pattern as
    * [[VectorExpressions.register]]). */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_probe_centroids",
      exprs => ProbeCentroids(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  def nearest_centroid(emb: Column, flatCents: Column): Column =
    call_function("graft_nearest_centroid", emb, flatCents)

  def probe_centroids(emb: Column, flatCents: Column, k: Column): Column =
    call_function("graft_probe_centroids", emb, flatCents, k)
}
