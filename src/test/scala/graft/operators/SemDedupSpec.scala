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

  test("a zero-norm embedding on the plant residue cannot break the audit") {
    // cosine(zero, anything) is NULL, so an exact twin of an all-zero
    // vector can never connect at >= tau — the plant (and the oracle's
    // plant count) must exclude it, or n_dropped_twins < n_planted on any
    // corpus containing a zero vector at the plant residue.
    val real = spark.read.parquet(s"$sf/embeddings.parquet")
    val dim = real.select(size(col("embedding"))).head().getInt(0)
    val maxId = real.agg(max(col("vec_id"))).head().getLong(0)
    val zid = ((maxId / 101) + 1) * 101 // fresh id on the plant residue
    val zero = real.limit(1)
      .withColumn("vec_id", lit(zid))
      .withColumn("embedding",
        array_repeat(lit(0.0), dim).cast(real.schema("embedding").dataType))
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup0-").toString
    real.unionByName(zero).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val row = DedupOps.semDedup(spark, dir).head()
    val nBase = real.filter(col("vec_id").isNotNull &&
      col("embedding").isNotNull && size(col("embedding")) > 0).count() + 1
    val nPlanted = real.filter(col("vec_id") % 101 === 0 &&
      SimilarityOps.cosine(col("embedding"), col("embedding")).isNotNull).count()
    assert(row.getLong(0) == nBase + nPlanted)          // n_vectors
    assert(row.getLong(1) == nPlanted, "zero vector must not be planted")
    assert(row.getLong(2) == nPlanted, "all guarded twins still dropped")
    assert(row.getBoolean(3) && row.getBoolean(4) && row.getBoolean(5))
  }
}
