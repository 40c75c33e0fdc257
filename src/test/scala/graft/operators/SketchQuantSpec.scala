package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ground truth for the two compression-sketch operators: the count-min
  * heavy hitters must respect the CMS one-sided error bound (estimate is
  * NEVER below the exact count) and agree with exact counts on a fixture
  * with a known token distribution; the int8-quantized ANN must match a
  * full driver-side recomputation of the quantizer (scales → rounding →
  * integer dots) and rank a planted aligned twin first. */
class SketchQuantSpec extends GraftSpec {

  test("CMS heavy hitters: exact counts right, estimate >= exact everywhere") {
    // 60 "alpha", 40 "beta", 10 "gamma", 300 singletons as collision noise
    val docs =
      (1L to 20L).map(i => (i, Array.fill(3)("alpha").mkString(" "), "en", "t", 17L)) ++
      (21L to 40L).map(i => (i, "beta beta", "en", "t", 9L)) ++
      (41L to 50L).map(i => (i, "gamma", "en", "t", 5L)) ++
      (51L to 350L).map(i => (i, s"one_off_$i", "en", "t", 10L))
    val dir = writeDocs(docs)
    val got = TextOps.textCmsHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byTok = got.map(t => t._1 -> t).toMap
    assert(byTok("alpha")._2 === 60L)
    assert(byTok("beta")._2 === 40L)
    assert(byTok("gamma")._2 === 10L)
    // the CMS invariant: collisions only ever INFLATE an estimate
    got.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS under-estimated '$tok': $est < $exact")
    }
    // the heavy hitters dominate the top of the exact ranking
    assert(got.take(2).map(_._1).toSet === Set("alpha", "beta"))
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-quant-").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v, 0) }),
        embSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("quantized ANN: matches a scalar recomputation; aligned twin ranks first") {
    // query 0 and its exact twin 77 point the same way with large norm;
    // the rest are low-magnitude deterministic noise
    val dim = 64
    val aligned = Array.tabulate(dim)(i => (0.5f + 0.005f * i))
    val vecs: Seq[(Long, Array[Float])] =
      Seq(0L -> aligned, 77L -> aligned.clone()) ++
      (1L to 40L).filter(_ != 5).map(id =>
        id -> Array.tabulate(dim)(i => 0.01f * (((id * 31 + i * 7) % 13).toFloat - 6f)))
    val dir = writeEmb(vecs)
    val got = SimilarityOps.annQuantizedTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // scalar recomputation of the whole quantizer
    val scales = Array.tabulate(dim)(i =>
      vecs.map { case (_, v) => math.abs(v(i).toDouble) }.max)
    def quant(v: Array[Float]): Array[Long] = Array.tabulate(dim) { i =>
      if (scales(i) > 0)
        BigDecimal(v(i).toDouble * 127.0 / scales(i))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L
    }
    val qmap = vecs.toMap.map { case (id, v) => id -> quant(v) }
    val expected = (0L until 5L).filter(qmap.contains).flatMap { qid =>
      qmap.toSeq.filter(_._1 != qid)
        .map { case (id, qv) =>
          (id, qmap(qid).zip(qv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(10).zipWithIndex
        .map { case ((id, s), r) => (qid, id, s, (r + 1).toLong) }
    }
    assert(got.toSeq === expected)
    // the exact twin is query 0's top neighbor
    assert(got.find(_._1 == 0L).map(_._2) === Some(77L))
  }
}
