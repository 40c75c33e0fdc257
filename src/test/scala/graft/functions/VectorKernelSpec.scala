package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pins the similarity kernels' finite-or-NULL contract on BOTH
  * evaluation paths — interpreted (`eval`) and whole-stage codegen (via
  * `spark.sql`). The contract matters at corpus scale: Spark SQL orders
  * NaN above every real number, so a kernel that let 0/0 or a NaN
  * component through would rank one corrupt embedding #1 in every
  * descending top-k and pass every `>= threshold` filter
  * ([[PathologicalContentSpec]] demonstrates the end-to-end version).
  */
class VectorKernelSpec extends GraftSpec {

  private def lit(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType))

  private def cosEval(a: Seq[Float], b: Seq[Float]): Any =
    CosineSimilarity(lit(a), lit(b)).eval(null)

  private def dotEval(a: Seq[Float], b: Seq[Float]): Any =
    FloatDotProduct(lit(a), lit(b)).eval(null)

  /** The same expression through the planner — exercises doGenCode. */
  private def sqlOne(fn: String, a: Seq[Float], b: Seq[Float]): Any = {
    def arr(xs: Seq[Float]) =
      if (xs.isEmpty) "CAST(array() AS ARRAY<FLOAT>)"
      else xs.map {
        case x if x.isNaN => "CAST('NaN' AS FLOAT)"
        case x if x.isPosInfinity => "CAST('Infinity' AS FLOAT)"
        case x => s"CAST($x AS FLOAT)"
      }.mkString("array(", ", ", ")")
    val r = spark.sql(s"SELECT $fn(${arr(a)}, ${arr(b)}) AS v").head()
    if (r.isNullAt(0)) null else r.getDouble(0)
  }

  private val zeros = Seq.fill(4)(0.0f)
  private val nans = Seq(1.0f, Float.NaN, 3.0f, 4.0f)
  private val infs = Seq(1.0f, Float.PositiveInfinity, 3.0f, 4.0f)
  private val v34 = Seq(3.0f, 4.0f)

  test("cosine: exact on clean input, both paths") {
    assert(cosEval(v34, v34) == 1.0)
    assert(sqlOne("graft_cosine", v34, v34) == 1.0)
    assert(cosEval(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)) == 0.0)
    assert(cosEval(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)) == -1.0)
  }

  test("cosine: degenerate input is NULL, never NaN, both paths") {
    for (bad <- Seq(zeros, nans, infs, Seq.empty[Float])) {
      assert(cosEval(bad, v34 ++ v34) == null, s"eval on $bad")
      assert(cosEval(v34 ++ v34, bad) == null, s"eval on $bad (rhs)")
      assert(sqlOne("graft_cosine", bad, v34 ++ v34) == null, s"codegen on $bad")
    }
    // and NaN never leaks even when BOTH sides are degenerate
    assert(cosEval(zeros, zeros) == null)
    assert(sqlOne("graft_cosine", nans, nans) == null)
  }

  test("cosine: length mismatch uses the common prefix (documented min-n)") {
    // powers of two: sqrt(4)*sqrt(4) is exact, so identical prefixes give
    // exactly 1.0 and the assert needs no epsilon
    assert(cosEval(Seq(2.0f, 0.0f), Seq(2.0f, 0.0f, 99.0f)) == 1.0)
  }

  test("float_dot: exact on clean input, NULL on non-finite, both paths") {
    assert(dotEval(v34, v34) == 25.0)
    assert(sqlOne("graft_float_dot", v34, v34) == 25.0)
    assert(dotEval(nans, v34 ++ v34) == null)
    assert(dotEval(infs, v34 ++ v34) == null)
    assert(sqlOne("graft_float_dot", nans, v34 ++ v34) == null)
    // empty/zero input is a legitimate 0.0 dot, not NULL
    assert(dotEval(Seq.empty[Float], v34) == 0.0)
    assert(dotEval(zeros, zeros ++ zeros) == 0.0)
  }
}
