package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ground truth for the embedding-metadata operators: centroids against a
  * scalar mean recomputation, and k-NN classification against a planted
  * aligned cluster whose label must win every vote. */
class EmbeddingAnalyticsSpec extends GraftSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-embmeta-").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, v, l) => Row(id, v, l) }),
        embSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("centroids: every (label, dim) cell equals the scalar mean") {
    val dim = 64
    val vecs = Seq(
      (10L, Array.tabulate(dim)(i => 0.1f * i), 0),
      (11L, Array.tabulate(dim)(i => 0.3f * i), 0),
      (12L, Array.tabulate(dim)(i => 1.0f + i), 1))
    val got = SimilarityOps.embeddingCentroids(spark, writeEmb(vecs)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size === 2 * dim)
    for (i <- 0 until dim) {
      val m0 = BigDecimal(((0.1f * i).toDouble + (0.3f * i).toDouble) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((0, i)) === ((2L, m0)), s"label 0 dim $i")
      val m1 = BigDecimal((1.0f + i).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((1, i)) === ((1L, m1)), s"label 1 dim $i")
    }
  }

  test("kNN classify: a planted aligned cluster wins all ten votes") {
    val dim = 64
    val base = Array.tabulate(dim)(i => 0.5f + 0.01f * i)
    def scaled(f: Float) = base.map(_ * f)
    val vecs: Seq[(Long, Array[Float], Int)] =
      // query 0 plus ten same-direction vectors (cosine exactly 1) all label 3
      Seq((0L, base, 9)) ++
      (100L to 109L).map(id => (id, scaled(1.0f + (id - 99L) * 0.1f), 3)) ++
      // noise: different directions, labels != 3
      (1L to 30L).map(id =>
        (id, Array.tabulate(dim)(i => 0.02f * (((id * 17 + i * 5) % 11).toFloat - 5f)),
          (id % 3).toInt))
    val got = SimilarityOps.annKnnClassify(spark, writeEmb(vecs)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(0L) === ((3, 10L)),
      "query 0's top-10 are the aligned cluster; its label must sweep the vote")
  }
}
