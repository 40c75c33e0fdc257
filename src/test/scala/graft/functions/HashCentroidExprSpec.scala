package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Ground truth for the codegen'd PolyHash and centroid-scan expressions:
  * PolyHash must equal both a plain Scala code-point fold AND the
  * higher-order-function formulation it replaced (same integers the
  * DuckDB oracles verify); centroid ops must match driver-side argmax
  * with lower-id tie-breaking.
  */
class HashCentroidExprSpec extends GraftSpec {
  import spark.implicits._

  private def refFold(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  test("poly_hash equals the reference code-point fold (ASCII + unicode)") {
    HashExpressions.register(spark)
    val inputs = Seq("", "a", "abc def", "the quick brown fox",
      "àÅœ mixed ascii", "日本語テキスト", "emoji 😀 pair")
    val got = inputs.toDF("s")
      .select(HashExpressions.poly_hash(col("s")).as("h"))
      .as[Long].collect()
    assert(got.toSeq === inputs.map(refFold))
  }

  test("poly_hash equals the aggregate(split) formulation on fixture text") {
    HashExpressions.register(spark)
    val P = 1000000007L
    val old = aggregate(filter(split(col("text"), ""), ch => ch =!= ""),
      lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P)
    val diff = graft.Tables.documents(spark, sfDir)
      .select(HashExpressions.poly_hash(col("text")).as("a"), old.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0L)
  }

  test("poly_hash of null is null") {
    HashExpressions.register(spark)
    val r = Seq(Some("x"), None).toDF("s")
      .select(HashExpressions.poly_hash(col("s"))).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("nearest_centroid / probe_centroids match driver-side argmax with " +
    "lower-id ties") {
    CentroidExpressions.register(spark)
    // centroids: c0 = x-axis, c1 = y-axis, c2 = x-axis DUPLICATE (tie)
    val flat = Seq(1f, 0f, 0f, 1f, 1f, 0f)
    val df = Seq(
      (0L, Seq(2f, 0.1f)),   // → c0 (tie with c2 → lower id wins)
      (1L, Seq(0.1f, 3f))    // → c1
    ).toDF("id", "emb")
    val got = df.select(col("id"),
        CentroidExpressions.nearest_centroid(col("emb"), typedlit(flat)).as("n"),
        CentroidExpressions.probe_centroids(col("emb"), typedlit(flat), lit(2)).as("p"))
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap
    assert(got(0L)._1 === 0)
    assert(got(1L)._1 === 1)
    assert(got(0L)._2 === Seq(0, 2)) // both x-axis copies before y-axis
    assert(got(1L)._2 === Seq(1, 0))
  }
}
