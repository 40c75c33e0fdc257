package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Write-audit-publish branches ([[SnapshotTable.branchCreate]] /
  * [[SnapshotTable.publishBranch]]): zero-copy fork, independent
  * writes through every normal API, one atomic publish back — a
  * fast-forward when main is unmoved, a file-granularity rebase when
  * it moved, a loud refusal when both sides rewrote a file. */
class SnapshotBranchSpec extends GraftSpec {

  private def sliceA = spark.range(0, 100)
    .select(col("id").as("k"), col("id").as("v"))
  private def sliceB = spark.range(100, 160)
    .select(col("id").as("k"), col("id").as("v"))
  private def sliceC = spark.range(200, 250)
    .select(col("id").as("k"), col("id").as("v"))

  test("fast-forward: branch state lands atomically on unmoved main") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    assert(SnapshotTable.branchCreate(spark, t, "audit") == 1)
    assert(SnapshotTable.branches(spark, t) == Seq("audit"))
    val b = SnapshotTable.branchDir(t, "audit")
    // the branch is a full table: append + DML land there, main is
    // untouched until the publish
    SnapshotTable.commit(spark, b, sliceB.repartition(1), overwrite = false)
    assert(SnapshotTable.updateWhere(spark, b, col("k") < 10L,
      Map("v" -> (col("v") + 1000L))).nonEmpty)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 100)
    val v = SnapshotTable.publishBranch(spark, t, "audit")
    assert(v == 2)
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 160)
    assert(main.filter(col("k") < 10L)
      .agg(sum(col("v"))).head().getLong(0) == (0 until 10).sum + 10000L)
    // time travel: the pre-publish main is intact
    assert(SnapshotTable.readAsOf(spark, t, 1).count() == 100)
    assert(SnapshotTable.readAsOf(spark, t, 1)
      .filter(col("v") >= 1000L).count() == 0)
    // the fork marker is consumed — publishing twice refuses
    assert(SnapshotTable.branches(spark, t).isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotTable.publishBranch(spark, t, "audit") }
  }

  test("rebase: the branch delta replays onto a moved main") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "fix")
    val b = SnapshotTable.branchDir(t, "fix")
    SnapshotTable.commit(spark, b, sliceB.repartition(1), overwrite = false)
    // branch rewrites the A file (the fix); main gains C AFTER the fork
    assert(SnapshotTable.updateWhere(spark, b, col("k") === 5L,
      Map("v" -> lit(-5L))).nonEmpty)
    SnapshotTable.commit(spark, t, sliceC.repartition(1), overwrite = false)
    SnapshotTable.publishBranch(spark, t, "fix")
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 210) // A + B + C, nothing lost or doubled
    assert(main.filter(col("k") === 5L).head().getLong(1) == -5L)
    assert(main.filter(col("k") >= 200L).count() == 50)
    // rowCount metadata agrees after the splice
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(210L))
  }

  test("rewrite-rewrite conflict refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "risky")
    val b = SnapshotTable.branchDir(t, "risky")
    assert(SnapshotTable.updateWhere(spark, b, col("k") === 1L,
      Map("v" -> lit(-1L))).nonEmpty)
    // main rewrites the SAME (only) file after the fork
    assert(SnapshotTable.updateWhere(spark, t, col("k") === 2L,
      Map("v" -> lit(-2L))).nonEmpty)
    val e = intercept[IllegalStateException] {
      SnapshotTable.publishBranch(spark, t, "risky") }
    assert(e.getMessage.contains("both sides rewrote"))
    // main is untouched by the failed publish
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 100)
    assert(SnapshotTable.branches(spark, t) == Seq("risky"))
  }

  test("publish races a concurrent main commit: atomic replan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "wap")
    val b = SnapshotTable.branchDir(t, "wap")
    SnapshotTable.commit(spark, b, sliceB.repartition(1), overwrite = false)
    // a main append lands INSIDE the publish's commit window: the
    // planned fast-forward must abort and replan as a rebase
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        if (!interleaved) {
          interleaved = true // the racing commit's own publish: no recursion
          SnapshotTable.commit(spark, t, sliceC.repartition(1),
            overwrite = false)
        }
      }
      SnapshotTable.publishBranch(spark, t, "wap")
    } finally SnapshotTable.beforePublishHook = saved
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 210, "racing append or branch rows lost")
    assert(main.filter(col("k") >= 200L).count() == 50)
    assert(main.filter(col("k") >= 100L && col("k") < 160L).count() == 60)
  }

  test("drop guard: published branch data is load-bearing until migrated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "gone")
    val b = SnapshotTable.branchDir(t, "gone")
    SnapshotTable.commit(spark, b, sliceB.repartition(1), overwrite = false)
    SnapshotTable.publishBranch(spark, t, "gone")
    // main now references files under the branch dir — drop refuses
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.dropBranch(spark, t, "gone") }
    assert(e.getMessage.contains("migrate"))
    // a full repack migrates the bytes into main's own data dir —
    // but the PRE-compact retained version still time-travels into
    // the branch files, so the drop must STILL refuse (the vacuum
    // keep-set rule: any retained version's references are
    // load-bearing, not just the latest's)
    assert(SnapshotTable.compact(spark, t, 1L << 30, 1L << 30).nonEmpty)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.dropBranch(spark, t, "gone") }
    assert(e2.getMessage.contains("retained version"))
    // the time travel the second refusal protects: the publish-era
    // snapshot is still fully readable
    assert(SnapshotTable.readAsOf(spark, t, 2).count() == 160)
    // vacuum past the publish version → no retained reference → drop ok
    SnapshotTable.vacuum(spark, t, keepVersions = 1)
    SnapshotTable.dropBranch(spark, t, "gone")
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 160)
    // and the branch directory is gone
    val f = new org.apache.hadoop.fs.Path(b)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(b)))
  }
}
