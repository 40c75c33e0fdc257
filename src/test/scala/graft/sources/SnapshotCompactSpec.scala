package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Snapshot-native OPTIMIZE ([[SnapshotTable.compact]]): bin-pack small
  * files into one new version, rows identical, large files untouched,
  * history intact until vacuum — and optimistic concurrency: a
  * conflicting rewrite in the race window aborts the compaction while
  * concurrent appends commute. */
class SnapshotCompactSpec extends GraftSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("compaction merges small files, preserves rows, history, and stats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt1-").toString
    val t = s"$dir/tbl"
    // three appends of 2 files each -> 6 small files
    (0 until 3).foreach { k =>
      SnapshotTable.commit(spark, t,
        spark.range(k * 100, k * 100 + 100).select(col("id"))
          .repartitionByRange(2, col("id")),
        overwrite = false)
    }
    assert(SnapshotTable.readAsOf(spark, t, 3).inputFiles.length == 6)
    val before = ids(SnapshotTable.readAsOf(spark, t, 3))
    val v = SnapshotTable.compact(spark, t,
      smallFileBytes = 1L << 20, targetFileBytes = 1L << 30)
    assert(v.contains(4))
    val after = SnapshotTable.readAsOf(spark, t, 4)
    assert(ids(after) == before)
    assert(after.inputFiles.length == 1, "6 small files should pack into 1")
    // history still serves the pre-compaction layout
    assert(SnapshotTable.readAsOf(spark, t, 3).inputFiles.length == 6)
    assert(ids(SnapshotTable.readAsOf(spark, t, 2)).size == 200)
    // zone maps were recollected for the packed file: a refuted
    // predicate scans zero files
    val (noneRows, noneFiles) = {
      val df = after.filter(col("id") === 99999)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      (rows.length, plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum)
    }
    assert(noneRows == 0 && noneFiles == 0)
    // vacuum reclaims the superseded small files; the packed read is intact
    SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == before)
    // nothing left to compact
    assert(SnapshotTable.compact(spark, t, 1L << 20, 1L << 30).isEmpty)
  }

  test("files >= the small threshold are carried through untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 4).select(col("id")).repartition(4), overwrite = false)
    // threshold BELOW every file size -> nothing is small -> no-op
    assert(SnapshotTable.compact(spark, t, smallFileBytes = 10,
      targetFileBytes = 1L << 30).isEmpty)
    // threshold above: all 4 pack; the entry set changes but rows don't
    val packed = SnapshotTable.compact(spark, t, 1L << 20, 1L << 30)
    assert(packed.contains(2))
    assert(ids(SnapshotTable.readAsOf(spark, t, 2)) == (0L until 4L).toSet)
  }

  test("a conflicting overwrite in the race window aborts the compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id")).repartition(4), overwrite = false)
    // inject a concurrent overwrite between the compaction's data write
    // and its publish attempt: the files it packed are no longer live
    SnapshotTable.beforePublishHook = () =>
      SnapshotTable.commit(spark, t, Seq(777L).toDF("id"), overwrite = true)
    try {
      val res = SnapshotTable.compact(spark, t, 1L << 20, 1L << 30)
      assert(res.isEmpty, "compaction must abort when its inputs were rewritten")
    } finally SnapshotTable.beforePublishHook = () => ()
    // the overwrite's state is intact, nothing resurrected
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == Set(777L))
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2))
  }

  test("a concurrent append in the race window commutes with compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id")).repartition(4), overwrite = false)
    SnapshotTable.beforePublishHook = () =>
      SnapshotTable.commit(spark, t, Seq(777L).toDF("id"), overwrite = false)
    try {
      val res = SnapshotTable.compact(spark, t, 1L << 20, 1L << 30)
      assert(res.contains(3), "append and compaction must both land")
    } finally SnapshotTable.beforePublishHook = () => ()
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) ==
      (0L until 100L).toSet + 777L)
  }

  test("zorder rewrite: rows identical, files z-clustered, both-dim pruning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zopt-").toString
    val t = s"$dir/tbl"
    // keys laid out ANTI-clustered for (x, y): a straight row-major grid
    SnapshotTable.commit(spark, t,
      spark.range(0, 4096).select((col("id") / 64).cast("long").as("x"),
        pmod(col("id"), lit(64)).cast("long").as("y"), col("id")),
      overwrite = false)
    val v = SnapshotTable.rewriteZordered(spark, t, "x", "y", nFiles = 8)
    assert(v.contains(2))
    val after = SnapshotTable.readAsOf(spark, t, 2)
    assert(after.count() == 4096 &&
      ids(after) == (0L until 4096L).toSet)
    assert(after.inputFiles.length == 8)
    // zone-map pruning now works on BOTH dimensions: a narrow band on x
    // and a narrow band on y must each scan a strict subset of files
    def filesScanned(p: org.apache.spark.sql.Column): Long = {
      val df = SnapshotTable.readAsOf(spark, t, 2).filter(p)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case pl => pl
      }
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
    }
    assert(filesScanned(col("x") === 7L) < 8,
      "x-band must prune under the z layout")
    assert(filesScanned(col("y") === 7L) < 8,
      "y-band must prune under the z layout")
    // history: v1 still serves the unclustered layout
    assert(ids(SnapshotTable.readAsOf(spark, t, 1)) == (0L until 4096L).toSet)
    // a concurrent overwrite in the race window aborts the rewrite
    SnapshotTable.beforePublishHook = () => {
      SnapshotTable.beforePublishHook = () => ()
      SnapshotTable.commit(spark, t,
        Seq((1L, 1L, 9999L)).toDF("x", "y", "id"), overwrite = true)
    }
    try assert(SnapshotTable.rewriteZordered(spark, t, "x", "y").isEmpty)
    finally SnapshotTable.beforePublishHook = () => ()
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == Set(9999L),
      "the conflicting overwrite wins; the aborted rewrite leaves no trace")
  }
}
