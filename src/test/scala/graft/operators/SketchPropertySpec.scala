package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property tests for the compression sketches on seeded-random inputs:
  * the distributed count-min sketch and int8 quantizer must reproduce a
  * driver-side scalar implementation BIT-FOR-BIT — estimates, scores,
  * ranks, everything — on corpora the fixed fixtures never exercise. */
class SketchPropertySpec extends GraftSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("CMS heavy hitters bit-equal a scalar sketch on random corpora (3 seeds)") {
    for (seed <- Seq(11, 97, 4242)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish pool: token k appears with weight ~ 1/(k+1)
      val pool = (0 until 120).map(k => s"tok_${seed}_$k")
      val tokens = Seq.fill(4000) {
        val k = math.min((1.0 / (rnd.nextDouble() + 0.01) - 1).toInt, pool.size - 1)
        pool(math.max(k, 0))
      }
      val docs = tokens.grouped(40).zipWithIndex.map { case (tk, i) =>
        (i.toLong, tk.mkString(" "), "en", "t", 40L)
      }.toSeq
      val got = TextOps.textCmsHeavyHitters(spark, writeDocs(docs)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // scalar CMS: one md5 per token, four 8-hex-char slices mod 1024
      val cells = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
      tokens.foreach { t =>
        val h = md5hex(t)
        for (r <- 0 until 4) {
          val b = java.lang.Long.parseLong(h.substring(8 * r, 8 * r + 8), 16) % 1024
          cells((r, b)) += 1
        }
      }
      val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = exact.toSeq
        .sortBy { case (t, n) => (-n, t) }.take(50)
        .map { case (t, n) =>
          val h = md5hex(t)
          val est = (0 until 4).map { r =>
            cells((r, java.lang.Long.parseLong(h.substring(8 * r, 8 * r + 8), 16) % 1024))
          }.min
          (t, n, est)
        }
      assert(got === expected, s"seed $seed diverged")
    }
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  test("int8 quantizer bit-equal a scalar recomputation on random vectors (3 seeds)") {
    val dim = 64
    for (seed <- Seq(5, 303, 90210)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0L until 40L).map(id =>
        id -> Array.fill(dim)((rnd.nextGaussian() * 0.7).toFloat))
      val dir = java.nio.file.Files.createTempDirectory("graft-sqprop-").toString
      spark.createDataFrame(
          spark.sparkContext.parallelize(
            vecs.map { case (id, v) => Row(id, v, 0) }),
          embSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = SimilarityOps.annQuantizedTopK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val scales = Array.tabulate(dim)(i =>
        vecs.map { case (_, v) => math.abs(v(i).toDouble) }.max)
      def quant(v: Array[Float]): Array[Long] = Array.tabulate(dim) { i =>
        if (scales(i) > 0)
          BigDecimal(v(i).toDouble * 127.0 / scales(i))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else 0L
      }
      val qmap = vecs.toMap.map { case (id, v) => id -> quant(v) }
      val expected = (0L until 5L).flatMap { qid =>
        qmap.toSeq.filter(_._1 != qid)
          .map { case (id, qv) =>
            (id, qmap(qid).zip(qv).map { case (a, b) => a * b }.sum) }
          .sortBy { case (id, sc) => (-sc, id) }
          .take(10).zipWithIndex
          .map { case ((id, sc), r) => (qid, id, sc, (r + 1).toLong) }
      }
      assert(got === expected, s"seed $seed diverged")
    }
  }
}
