package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** SemDedup-style semantic dedup ([[DedupOps.semDedup]]): the one-row
  * audit's counts must tie to an independently-derived recount of the
  * fixture, and every structural verdict must hold. */
class SemDedupSpec extends GraftSpec {

  private val sf = "/root/testdata/sf0.001"

  test("planted exact twins are always dropped; audit ties to the recount") {
    val row = DedupOps.semDedup(spark, sf).head()
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
        size(col("embedding")) > 0)
    val nBase = base.count()
    val nPlanted = base.filter(col("vec_id") % 101 === 0).count()
    assert(nPlanted > 0, "fixture must plant at least one twin")
    assert(row.getLong(0) == nBase + nPlanted)          // n_vectors
    assert(row.getLong(1) == nPlanted)                  // n_planted
    assert(row.getLong(2) == nPlanted,                  // n_dropped_twins
      "every planted exact twin must be dropped")
    assert(row.getBoolean(3), "a dropped vector's survivor must be kept")
    assert(row.getBoolean(4), "no two kept vectors may still exceed tau")
    assert(row.getBoolean(5), "labeling must conserve the corpus")
  }
}
