package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** Ground-truth pin for the DISTRIBUTED IVF training pipeline: on a tiny
  * fixed single-partition corpus, the whole build — xxhash64 seed
  * sampling, every Lloyd round's assign+sum, empty-cluster carry-over,
  * the movement-based early stop, and the final inverted-list assignment
  * — is replayed sequentially on the driver and must agree BIT-FOR-BIT.
  * The replay reuses the per-row kernels ([[graft.functions.CentroidOps]]
  * scoring, double-sum means in row order) but re-implements all
  * orchestration, so any drift in seed ordering, round structure, mean
  * arithmetic, or assignment plumbing breaks the comparison. This
  * shrinks the `ann_ivf_topk` rows-only surface to pure hash-family
  * variance: the training itself is exact and pinned.
  */
class IvfTrainReplaySpec extends GraftSpec {

  private val dim = 4
  private val kC = 2
  // 8 fixed vectors, two loose groups plus two stragglers — values picked
  // so clusters move on both rounds (no accidental first-round fixpoint)
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1.0f, 0.1f, 0.0f, 0.0f),
    1L -> Seq(0.9f, 0.2f, 0.1f, 0.0f),
    2L -> Seq(0.0f, 0.1f, 1.0f, 0.8f),
    3L -> Seq(0.1f, 0.0f, 0.9f, 1.0f),
    4L -> Seq(0.8f, 0.3f, 0.2f, 0.1f),
    5L -> Seq(0.2f, 0.1f, 0.8f, 0.9f),
    6L -> Seq(0.5f, 0.5f, 0.5f, 0.5f),
    7L -> Seq(1.0f, 0.0f, 0.1f, 0.2f))

  private def arr(v: Seq[Float]) = new GenericArrayData(v.map(Float.box).toArray)

  private def nearestId(v: Seq[Float], cents: Seq[Seq[Float]]): Int =
    graft.functions.CentroidOps.nearest(arr(v), arr(cents.flatten))

  /** Sequential replay of [[SimilarityOps.trainCentroids]]'s contract. */
  private def replayTraining(): Seq[Seq[Float]] = {
    var cents: Seq[Seq[Float]] = vecs
      .sortBy { case (id, _) => (XXH64.hashLong(id, 42L), id) }
      .take(kC).map(_._2)
    var iter = 0
    var moved = Double.MaxValue
    while (iter < 2 && moved > 1e-4) {
      // per-cluster double sums in ROW ORDER (the single-partition
      // aggregation order), then mean → Float
      val grouped = vecs.groupBy { case (_, v) => nearestId(v, cents) }
      val next = cents.indices.map { c =>
        grouped.get(c) match {
          case None => cents(c) // empty cluster keeps its centroid
          case Some(rows) =>
            val sum = new Array[Double](dim)
            rows.foreach { case (_, v) =>
              var i = 0; while (i < dim) { sum(i) += v(i); i += 1 }
            }
            sum.map(x => (x / rows.size).toFloat).toSeq
        }
      }
      moved = cents.iterator.zip(next.iterator).map { case (a, b) =>
        a.iterator.zip(b.iterator).map(p => math.abs(p._1 - p._2).toDouble).max
      }.max
      cents = next
      iter += 1
    }
    cents
  }

  test("distributed IVF training and assignment replay bit-for-bit") {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding").coalesce(1)
    val idx = SimilarityOps.buildIvfIndex(df, clusters = Some(kC))

    val expectedCents = replayTraining()
    assert(idx.centroids == expectedCents,
      s"trained centroids ${idx.centroids} != sequential replay $expectedCents")

    // the full inverted-list contents, via the persisted assignment
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-replay-").toString
    idx.save(dir)
    val assigned = graft.sources.SnapshotTable
      .readAsOf(spark, s"$dir/corpus", Int.MaxValue)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = vecs.map { case (id, v) => id -> nearestId(v, expectedCents) }.toMap
    assert(assigned == expected,
      s"inverted lists $assigned != replayed assignment $expected")
    idx.close()
  }
}
