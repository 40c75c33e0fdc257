package graft.functions

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

/** The compiled [[NgramRows]] generator must be row-for-row equivalent to
  * the interpreted `explode(array_distinct(<zip_with chain>))` it
  * replaced — same distinct n-gram multiset per doc (it IS a set), same
  * count — on the real corpus, plus edge cases the corpus lacks.
  */
class GeneratorSpec extends GraftSpec {

  private def chainNgrams(n: Int): org.apache.spark.sql.Column = {
    val tk = "split(text, ' ')"
    val m = s"size($tk) - ${n - 1}"
    val chain = (2 to n).foldLeft(s"slice($tk, 1, $m)") { (acc, i) =>
      s"zip_with($acc, slice($tk, $i, $m), (a, b) -> concat(a, ' ', b))"
    }
    expr(s"CASE WHEN size($tk) >= $n THEN array_distinct($chain) ELSE array() END")
  }

  test("generator equals the zip_with chain on the corpus (n=3 and n=5)") {
    GeneratorExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    Seq(3, 5).foreach { n =>
      val viaChain = docs
        .select(col("doc_id"), explode(chainNgrams(n)).as("sh"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val viaGen = docs
        .select(col("doc_id"),
          GeneratorExpressions.ngram_rows(col("text"), n).as(Seq("sh", "n_sh")))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(viaGen.map(t => (t._1, t._2)).toSet === viaChain, s"n=$n row set")
      // no duplicate emissions, and n_sh is the doc's distinct count
      assert(viaGen.length === viaChain.size, s"n=$n duplicate rows")
      viaGen.groupBy(_._1).foreach { case (_, rows) =>
        assert(rows.forall(_._3 === rows.length.toLong), s"n=$n n_sh")
      }
    }
  }

  test("window generator equals the transform(sequence) chain on the corpus") {
    GeneratorExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val viaChain = docs
      .select(col("doc_id"), expr("split(text, ' ')").as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 8), " +
          "i -> struct(CAST(i AS BIGINT) AS i, array_join(slice(tk, i + 1, 8), ' ') AS w))")).as("s"))
      .select(col("doc_id"), col("s.i"), col("s.w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val viaGen = docs
      .select(col("doc_id"),
        GeneratorExpressions.ngram_windows(col("text"), 8).as(Seq("i", "w")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(viaGen === viaChain)
  }

  test("ngram_distinct_count equals size(array_distinct(chain)) on the corpus") {
    graft.functions.HashExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    Seq(2, 3).foreach { n =>
      val rows = docs.select(
          size(chainNgrams(n)).cast("long").as("viaChain"),
          graft.functions.HashExpressions.ngram_distinct_count(col("text"), n).as("viaExpr"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"n=$n"))
    }
  }

  test("generator edge cases: short docs, trailing spaces, nulls, SQL surface") {
    GeneratorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),            // < n tokens: no rows
      (2L, "a b c"),          // exactly n
      (3L, "x x x x"),        // all-identical: ONE distinct shingle
      (4L, "a b c "),         // trailing space = trailing empty token (split -1)
      (5L, null.asInstanceOf[String])) // null: no rows
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        GeneratorExpressions.ngram_rows(col("text"), 3).as(Seq("sh", "n_sh")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
    assert(got === List(
      (2L, "a b c"),
      (3L, "x x x"),
      (4L, "a b c"), (4L, "b c ")))
    // SQL path via LATERAL VIEW, as a pure-SQL user would call it
    df.createOrReplaceTempView("g_gen_docs")
    val sqlRows = spark.sql(
      """SELECT doc_id, t.sh FROM g_gen_docs
        |LATERAL VIEW graft_ngram_rows(text, 3) t AS sh, n_sh""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
    assert(sqlRows === got)
  }
}
