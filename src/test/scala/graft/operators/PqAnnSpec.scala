package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-quantization ANN ground truth: the sampled-codebook PQ is
  * deterministic end to end, so (a) a driver-side scalar replay of the
  * ENTIRE pipeline — scales, int8 quantize, anchor draw, encoding, ADC
  * LUT, ranking — must reproduce the Spark result exactly; (b) a
  * clustered corpus must recall its own cluster; (c) the declared query
  * is well-formed on the real corpus. */
class PqAnnSpec extends GraftSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v, 0) }),
        embSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def h32(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Scalar replay of the whole PQ pipeline over an in-memory corpus. */
  private def scalarPq(vecs: Seq[(Long, Array[Float])])
      : Seq[(Long, Long, Long, Long)] = {
    val dim = 64
    val scales = (0 until dim).map(i =>
      vecs.map { case (_, v) => math.abs(v(i).toDouble) }.max)
    def quant(v: Array[Float]): Array[Long] =
      Array.tabulate(dim) { i =>
        if (scales(i) > 0)
          BigDecimal(v(i).toDouble * 127.0 / scales(i))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else 0L
      }
    val qv = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val anchors = vecs.map(_._1).sortBy(id => (h32(id.toString), id)).take(16)
    // codebook(sub)(j) = anchor j's 8-dim subvector
    def sub(a: Array[Long], s: Int): Array[Long] = a.slice(s * 8, s * 8 + 8)
    def codeOf(v: Array[Long], s: Int): Int =
      anchors.indices.minBy { j =>
        val c = sub(qv(anchors(j)), s)
        val x = sub(v, s)
        (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }
    val codes = qv.map { case (id, v) =>
      id -> Array.tabulate(8)(s => codeOf(v, s))
    }
    val queries = vecs.map(_._1).filter(_ < 5)
    val results = queries.flatMap { q =>
      val lut = Array.tabulate(8, 16) { (s, j) =>
        sub(qv(q), s).zip(sub(qv(anchors(j)), s)).map { case (a, b) => a * b }.sum
      }
      val scored = qv.keys.filter(_ != q).map { id =>
        (id, (0 until 8).map(s => lut(s)(codes(id)(s))).sum)
      }.toSeq
      scored.sortBy { case (id, sc) => (-sc, id) }.take(10).zipWithIndex.map {
        case ((id, sc), r) => (q, id, sc, (r + 1).toLong)
      }
    }
    results.sortBy(t => (t._1, t._4))
  }

  test("PQ search equals the scalar replay of the full pipeline") {
    // deterministic pseudo-random corpus, 60 vectors
    val vecs: Seq[(Long, Array[Float])] = (0L until 60L).map(id =>
      id -> Array.tabulate(64)(i => 0.1f * (((id * 37 + i * 11) % 19).toFloat - 9f)))
    val dir = writeEmb(vecs)
    val got = SimilarityOps.annPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === scalarPq(vecs))
  }

  test("clustered corpus: PQ recalls its own cluster") {
    // 3 well-separated clusters of 20; queries 0..4 sit in cluster 0
    def centre(c: Int) = Array.tabulate(64)(i =>
      if (i / 22 == c) 1.0f else 0.0f)
    val vecs: Seq[(Long, Array[Float])] = (0L until 60L).map { id =>
      val c = (id / 20).toInt
      val base = centre(c)
      id -> Array.tabulate(64)(i =>
        base(i) + 0.01f * (((id * 13 + i * 5) % 7).toFloat - 3f))
    }
    val dir = writeEmb(vecs)
    val got = SimilarityOps.annPqTopK(spark, dir).collect()
    val byQ = got.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(q < 20, "queries are cluster-0 members")
      val sameCluster = rows.count(_.getLong(1) < 20)
      assert(sameCluster >= 8,
        s"query $q: only $sameCluster/10 neighbors from its own cluster")
    }
  }

  test("declared query well-formed on the real corpus") {
    val got = SimilarityOps.annPqTopK(spark, sfDir).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.size === 5)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to 10L))
      // scores non-increasing in rank order
      val byRank = rows.sortBy(_.getLong(3)).map(_.getLong(2))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }
}
