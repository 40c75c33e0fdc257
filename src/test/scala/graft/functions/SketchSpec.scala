package graft.functions

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

/** The fused sketch expressions must be BIT-IDENTICAL to the
  * explode→aggregate pipelines they replaced, on the real corpus — the
  * replaced forms are reconstructed here verbatim as the ground truth.
  */
class SketchSpec extends GraftSpec {

  private val P = 1000000007L

  test("SimHash64 equals the 64-vote aggregation") {
    SketchExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val votes = (0 until 64).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"b$b"))
    val fold = (0 until 64).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    val old = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fold.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = docs
      .select(col("doc_id"), SketchExpressions.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === old)
  }

  test("PortableSimHash equals the 60-vote affine aggregation") {
    SketchExpressions.register(spark)
    HashExpressions.register(spark)
    val SB = 60
    val simA = (0 until SB).map(b => (2654435761L * (b + 1)) % P)
    val simC = (0 until SB).map(b => (40503L * (b + 7) * (b + 13)) % P)
    val docs = Tables.documents(spark, sfDir)
    val votes = (0 until SB).map(b =>
      sum(when((col("h0") * simA(b) + simC(b)) % P >= P / 2, 1).otherwise(-1)).as(s"v$b"))
    val fold = (0 until SB).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    val old = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"), HashExpressions.poly_hash(col("tok")).as("h0"))
      .groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fold.as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = docs
      .select(col("doc_id"),
        SketchExpressions.portable_simhash(col("text"), SB, P).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === old)
  }

  test("MinHashSignature equals the K min(xxhash64) aggregation") {
    SketchExpressions.register(spark)
    GeneratorExpressions.register(spark)
    val K = 32
    val docs = Tables.documents(spark, sfDir)
    val mins = (1 to K).map(i => min(expr(s"xxhash64(shingle, $i)")).as(s"h$i"))
    val old = docs
      .select(col("doc_id"),
        GeneratorExpressions.ngram_rows(col("text"), 3).as(Seq("shingle", "n_sh")))
      .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((1 to K).map(i => col(s"h$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = docs
      .select(col("doc_id"), SketchExpressions.minhash_sig(col("text"), K).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused === old)
  }

  test("PortableMinHashSignature equals the affine-min aggregation; short docs are NULL") {
    SketchExpressions.register(spark)
    HashExpressions.register(spark)
    GeneratorExpressions.register(spark)
    val KP = 16
    val docs = Tables.documents(spark, sfDir)
    val mins = (0 until KP).map(k =>
      min((col("h0") * (37 + 2 * k) + (1000 + k)) % P).as(s"p$k"))
    val old = docs
      .select(col("doc_id"),
        GeneratorExpressions.ngram_rows(col("text"), 3).as(Seq("shingle", "n_sh")))
      .select(col("doc_id"), HashExpressions.poly_hash(col("shingle")).as("h0"))
      .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (0 until KP).map(i => r.getLong(i + 1))).toMap
    val fused = docs
      .select(col("doc_id"),
        SketchExpressions.portable_minhash_sig(col("text"), KP, P).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.view.mapValues(_.toSeq).toMap ===
      old.view.mapValues(_.toSeq).toMap)
    // a doc with < 3 tokens has no shingle and therefore NO signature
    import spark.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"),
        SketchExpressions.minhash_sig(col("text"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("an out-of-Int-range literal arg raises a RANGE error, not a wrap") {
    import spark.implicits._
    SketchExpressions.register(spark)
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_minhash_sig(text, 5000000000)")).collect()
    }
    // the argument IS foldable — the diagnostic must name the actual
    // problem (value out of INT range), not claim non-foldability
    assert(e.getCondition == "INVALID_NUMERIC_LITERAL_RANGE")
    assert(e.getMessage.contains("5000000000"))
  }
}
