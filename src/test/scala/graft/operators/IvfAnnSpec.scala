package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** IVF ANN ground truth: the index is approximate by design, so the spec
  * checks (a) recall against the exact brute-force baseline, (b) that
  * returned cosines are exact (any pair the index returns must score
  * identically to the brute-force scorer), and (c) determinism — two
  * builds of the deterministic-seed index return identical rows.
  */
class IvfAnnSpec extends GraftSpec {

  test("IVF top-5 recalls most of the brute-force top-5 and scores exactly") {
    val brute = SimilarityOps.annBruteForce(spark, sfDir)
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteCos = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val ivf = SimilarityOps.annIvf(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet

    // exactness of returned scores: rerank is the same exact cosine
    ivf.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      bruteCos.get(k).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
    // recall: nProbe=3 of 16 clusters must still find most true neighbors
    val recall = (bruteSet & ivfSet).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"IVF recall $recall < 0.5 (hit ${(bruteSet & ivfSet).size}/${bruteSet.size})")
  }

  test("IVF index build is deterministic") {
    val a = SimilarityOps.annIvf(spark, sfDir).collect().toSeq
    val b = SimilarityOps.annIvf(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("IVF plan has no cartesian product") {
    val plan = SimilarityOps.annIvf(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct"))
  }
}
