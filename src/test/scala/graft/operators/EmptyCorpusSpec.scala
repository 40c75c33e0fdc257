package graft.operators

import graft.{GraftSpec, SparkEntry}

/** Every declared query must survive a schema-faithful ZERO-ROW corpus.
  *
  * At production scale empty slices are routine — an empty date
  * partition, a filter stage that dropped everything, a new tenant with
  * no data yet — and an engine whose operators throw on them turns a
  * benign no-op into a failed job. The fixture is `limit(0)` of every
  * sf0.001 table written to a fresh directory, so schemas (including the
  * events table's raw long-ts layout) match the real corpus exactly.
  *
  * This sweep is what forced the zero-row guards in the streaming
  * sentinel probe (max ts has no row to read), the backfill read-back
  * (no micro-batch fires, so the sink dir has no schema to infer), and
  * the IVF Lloyd loop (no seeds to train).
  */
class EmptyCorpusSpec extends GraftSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf-").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events.parquet is TIMESTAMP(NANOS): stage its empty twin through the
    // raw-long layout (the loaders' own convention) so the zero-row dir
    // exercises the same normalization branch as the real fixture
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.read.parquet(s"$sfDir/events.parquet").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    dir
  }

  test("every declared query runs (and returns no data rows) on a zero-row corpus") {
    // single-row aggregate summaries (counts/ratios over the whole corpus)
    // legitimately return their one summary row even when the input is
    // empty, and q40's full outer join preserves its literal 3-row quota
    // side as quota_only rows; everything else must come back with zero
    // rows
    val summaryRows = Set("dedup_exact_stats", "dedup_sketch_recall",
      "ann_recall", "ann_ivf_append", "ann_rp_recall", "text_token_budget",
      "q6_revenue_filter", "q40_full_outer", "layout_compaction",
      "profile_columns")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, emptyDir).collect().length
          if (n > 0 && !summaryRows.contains(name))
            Some(s"$name: expected 0 rows on empty corpus, got $n")
          else None
        } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(160)
            Some(s"$name: threw ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
