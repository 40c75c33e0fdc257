package graft.operators

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Index persistence: an ANN index is built once and served across many
  * sessions at 100 TB, so the trained state must round-trip through
  * parquet. The contract under test: a SAVED-then-LOADED index answers
  * `search()` bit-identically to the in-session index it was saved from —
  * same neighbor ids, same cosines, same ranks — without retraining
  * (IVF) or re-hashing (LSH).
  */
class IndexPersistSpec extends GraftSpec {

  private def vecs = {
    graft.functions.VectorExpressions.register(spark)
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
  }

  private def canon(rows: Array[Row]): Seq[(Long, Long, Double, Long)] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
      r.getAs[Double]("cos"), r.getAs[Long]("rank"))).toSeq.sorted

  test("IVF index save/load round-trips and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx-").toString
    val idx = SimilarityOps.buildIvfIndex(vecs)
    val live = canon(idx.search(col("vec_id") < 5, 5).collect())
    assert(live.nonEmpty, "in-session IVF search returned nothing")
    idx.save(dir)
    idx.close()

    val loaded = SimilarityOps.loadIvfIndex(spark, dir)
    assert(loaded.centroids == idx.centroids,
      "reloaded centroid matrix differs from the trained one")
    assert(loaded.nProbe == idx.nProbe)
    val replayed = canon(loaded.search(col("vec_id") < 5, 5).collect())
    assert(replayed == live,
      s"loaded-index search differs: ${replayed.size} vs ${live.size} rows")
    loaded.close()

    // the stored inverted lists really carry the assignment — the loaded
    // corpus has a cl column and every vector appears exactly once
    // (the corpus is a snapshot TABLE now: appends land as new versions)
    val stored = graft.sources.SnapshotTable
      .readAsOf(spark, s"$dir/corpus", Int.MaxValue)
    assert(stored.columns.toSet == Set("vec_id", "embedding", "cl"))
    assert(stored.groupBy(col("vec_id")).count().filter(col("count") > 1).isEmpty)
  }

  test("LSH bucket table save/load round-trips and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-idx-").toString
    val live = canon(SimilarityOps.annLsh(spark, sfDir).collect())
    assert(live.nonEmpty, "in-session LSH search returned nothing")
    SimilarityOps.saveLshBuckets(vecs, dir)
    val replayed = canon(
      SimilarityOps.lshSearchSaved(spark, dir, 5).collect())
    assert(replayed == live,
      s"saved-bucket search differs: ${replayed.size} vs ${live.size} rows")
  }
}
