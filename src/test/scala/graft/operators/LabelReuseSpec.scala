package graft.operators

import graft.{CacheRegistry, GraftSpec}

/** The shared component labeling: `dedup_components` and
  * `dedup_survivors` must label the corpus ONCE per (application, dir) —
  * the second consumer reuses the checkpointed labels — and
  * [[CacheRegistry.clear]] is the explicit invalidation boundary.
  */
class LabelReuseSpec extends GraftSpec {

  test("survivors reuse the memoized labeling; clear() forces a rebuild") {
    CacheRegistry.clear(spark)
    val b0 = DedupOps.labelBuilds.get()
    val components = DedupOps.connectedComponents(spark, sfDir)
    assert(components.count() > 0)
    val survivors = DedupOps.dedupSurvivors(spark, sfDir)
    assert(survivors.count() > 0)
    assert(DedupOps.labelBuilds.get() === b0 + 1,
      "second consumer must reuse the checkpointed labels, not rebuild")
    CacheRegistry.clear(spark)
    assert(DedupOps.dedupSurvivors(spark, sfDir).count() > 0)
    assert(DedupOps.labelBuilds.get() === b0 + 2,
      "clear() must invalidate the memoized labeling")
  }

  test("the ngram pair relation is built once, shared with the labeling") {
    CacheRegistry.clear(spark)
    val j0 = DedupOps.jaccardBuilds.get()
    assert(DedupOps.connectedComponents(spark, sfDir).count() > 0)
    DedupOps.ngramJaccard(spark, sfDir).count()
    assert(DedupOps.jaccardBuilds.get() === j0 + 1,
      "the declared Jaccard query must reuse the relation the labeling built")
  }

  test("in-place source regeneration rebuilds AND evicts the stale generation") {
    CacheRegistry.clear(spark)
    val dir = writeDocs(Seq((1L, "a b c", "en", "s", 5L),
      (2L, "a b c", "en", "s", 5L)))
    val b0 = DedupOps.labelBuilds.get()
    assert(DedupOps.connectedComponents(spark, dir).count() >= 0)
    assert(DedupOps.labelBuilds.get() === b0 + 1)
    // same PATH, new data: the data-version key must miss, and the
    // superseded entry must be EVICTED — a session that regenerates a
    // source N times between pass boundaries must hold one generation,
    // not N checkpointed copies
    import spark.implicits._
    Seq((1L, "completely different much longer text", "en", "s", 37L),
      (3L, "another regenerated row", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(DedupOps.connectedComponents(spark, dir).count() >= 0)
    assert(DedupOps.labelBuilds.get() === b0 + 2,
      "in-place regeneration must rebuild, not serve stale labels")
    assert(DedupOps.labelCacheSize === 1,
      "the stale generation must be evicted, not accumulated")
    CacheRegistry.clear(spark)
  }

  test("components and survivors agree on the component ids") {
    CacheRegistry.clear(spark)
    val labels = DedupOps.connectedComponents(spark, sfDir)
    val survivorComponents = DedupOps.dedupSurvivors(spark, sfDir)
      .select("component").collect().map(_.getLong(0)).toSet
    val labelComponents =
      labels.select("component").collect().map(_.getLong(0)).toSet
    assert(survivorComponents.subsetOf(labelComponents))
  }
}
