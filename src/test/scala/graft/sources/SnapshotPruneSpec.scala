package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Manifest zone-map data skipping: per-file min/max/null stats are
  * collected at commit (one distributed pass over the batch) and
  * [[SnapshotTable.readAsOf]]'s FileIndex drops files whose recorded
  * range REFUTES the pushed-down filters — with range-clustered layout
  * a selective query reads a handful of files. Pruning must be
  * strictly conservative: every predicate result must equal the
  * unpruned evaluation, including nulls, NaN, and multi-byte strings
  * (binary collation). */
class SnapshotPruneSpec extends GraftSpec {

  /** Executes `df` and returns (rows, files actually scanned). */
  private def run(df: DataFrame): (Seq[String], Long) = {
    val rows = df.collect().map(_.toString).toSeq.sorted
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val files = plan.collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    (rows, files)
  }

  test("range-clustered table: selective filters scan a fraction of files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune1-").toString
    val t = s"$dir/tbl"
    val src = spark.range(0, 1000)
      .select(col("id"),
        concat(lit("u"), lpad(col("id").cast("string"), 6, "0")).as("name"),
        (col("id").cast("double") / 10.0).as("score"))
      .repartitionByRange(8, col("id"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    val (all, allFiles) = run(snap)
    assert(all.size == 1000 && allFiles == 8)
    // long equality: one id lives in exactly one range file
    val (one, oneFiles) = run(snap.filter(col("id") === 417))
    assert(one.size == 1 && oneFiles == 1, s"scanned $oneFiles files for one id")
    // long range: a 100-wide slice spans 1-2 of the 8 range files
    val (slice, sliceFiles) = run(snap.filter(col("id") >= 300 && col("id") < 400))
    assert(slice.size == 100 && sliceFiles <= 2)
    // string equality prunes by the binary-collated name range
    val (byName, nameFiles) = run(snap.filter(col("name") === "u000042"))
    assert(byName.size == 1 && nameFiles == 1)
    // double range
    val (byScore, scoreFiles) = run(snap.filter(col("score") < 5.0))
    assert(byScore.size == 50 && scoreFiles == 1)
    // an IN list touching two distant ranges scans exactly those files
    val (inList, inFiles) = run(snap.filter(col("id").isin(3, 998)))
    assert(inList.size == 2 && inFiles == 2)
    // a predicate refuting everything scans nothing
    val (none, noneFiles) = run(snap.filter(col("id") === 5000))
    assert(none.isEmpty && noneFiles == 0)
  }

  test("pruning is sound over nulls, NaN, infinities, and unicode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-prune2-").toString
    val t = s"$dir/tbl"
    val rows: Seq[(java.lang.Long, String, java.lang.Double)] = Seq(
      (1L, "alpha", 1.5), (2L, "beta", Double.NaN), (3L, null, 2.5),
      (4L, "", Double.PositiveInfinity), (5L, "é-accent", -3.5),
      (6L, "😀-emoji", Double.NegativeInfinity),
      (null, "gap", 0.0), (8L, "zz", null))
    // one row per file: maximally prunable layout, every edge case its
    // own zone map entry
    val src = rows.toDF("id", "name", "score").repartition(8, col("id"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    // baseline: the SAME parquet files through the plain read path —
    // identical engine semantics (incl. Spark's nan-safe comparators,
    // where NaN > 2.0 is TRUE), minus the manifest zone-map pruning.
    // (A .cache()d baseline would smuggle in InMemoryTableScan's own
    // batch-stats pruning, which diverges on NaN.)
    val mem = spark.read.schema(snap.schema).parquet(snap.inputFiles: _*)
    val predicates = Seq(
      col("id") === 5, col("id") <= 2, col("id") > 6,
      col("id").isNull, col("id").isNotNull,
      col("name") === "é-accent", col("name") === "😀-emoji",
      col("name") >= "beta", col("name") < "a", col("name") === "",
      col("name").isNull, col("name").startsWith("z"),
      col("score") > 2.0, col("score") < 0.0,
      col("score") === Double.PositiveInfinity,
      col("score").isNotNull && isnan(col("score")),
      col("id").isin(1, 6, 99),
      col("id") === 3 || col("name") === "alpha")
    predicates.foreach { p =>
      val got = run(snap.filter(p))._1
      val want = mem.filter(p).collect().map(_.toString).toSeq.sorted
      assert(got == want, s"pruned result diverged for predicate $p")
    }
  }

  test("signed zeros never prune a matching file") {
    import spark.implicits._
    // SQL comparison treats -0.0 == 0.0 while java.lang.Double.compare
    // orders -0.0 < 0.0: a file whose stored max is -0.0 must still be
    // scanned for `score = 0.0` / `score >= 0.0`. Each commit is its own
    // file, so the all-negative-zero file gets its own zone map entry.
    val dir = java.nio.file.Files.createTempDirectory("graft-prune0-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, -0.0), (2L, -0.0)).toDF("id", "score").coalesce(1),
      overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((3L, 0.0)).toDF("id", "score"), overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((4L, 5.5)).toDF("id", "score"), overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 3)
    val mem = spark.read.schema(snap.schema).parquet(snap.inputFiles: _*)
    val predicates = Seq(
      col("score") === 0.0, col("score") === -0.0,
      col("score") >= 0.0, col("score") <= 0.0, col("score") <= -0.0,
      col("score") > -0.0, col("score") < 0.0,
      col("score").isin(0.0, 5.5), col("score").isin(-0.0))
    predicates.foreach { p =>
      val got = run(snap.filter(p))._1
      val want = mem.filter(p).collect().map(_.toString).toSeq.sorted
      assert(got == want, s"pruned result diverged for predicate $p")
    }
    // Closed-form core of the bug, with the PARQUET pushdown disabled to
    // isolate the manifest layer: stock Spark's parquet row-group stats
    // have the very same Double.compare defect (a -0.0-only row group is
    // skipped for `= 0.0` even through plain spark.read.parquet — verified
    // against vanilla 4.1.2), so with pushdown ON the engine can do no
    // better than parquet parity, which the equivalence loop above pins.
    // With it OFF, the only skipping left is ours — and it must keep the
    // -0.0 file.
    val pd = "spark.sql.parquet.filterPushdown"
    val saved = spark.conf.get(pd)
    spark.conf.set(pd, "false")
    try {
      assert(run(snap.filter(col("score") === 0.0))._1.size == 3)
      assert(run(snap.filter(col("score") >= 0.0))._1.size == 4)
      assert(run(snap.filter(col("score") <= -0.0))._1.size == 3)
      // and the zone map still PRUNES where it soundly can
      val (_, f) = run(snap.filter(col("score") === 5.5))
      assert(f == 1, s"expected 1 file for = 5.5, scanned $f")
    } finally spark.conf.set(pd, saved)
  }

  test("columns without stats and post-evolution files stay unpruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-prune3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2, col("id")),
      overwrite = false)
    // evolution: the new column exists only in v2's files — old files
    // carry no stats entry for it and must be KEPT (their rows read
    // NULL, which three-valued logic then drops, not the planner)
    SnapshotTable.commit(spark, t,
      Seq((3L, "c", 7L)).toDF("id", "v", "extra"), overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 2)
    val (hit, _) = run(snap.filter(col("extra") === 7))
    assert(hit.size == 1)
    val (miss, missFiles) = run(snap.filter(col("extra") === 8))
    assert(miss.isEmpty)
    // the v2 file is refuted by its stats; v1 files lack an entry for
    // `extra` and stay — so at most the two v1 files are scanned
    assert(missFiles <= 2)
    val (notNull, _) = run(snap.filter(col("extra").isNotNull))
    assert(notNull.size == 1)
  }
}
