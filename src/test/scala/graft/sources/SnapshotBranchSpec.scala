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

  test("rebase composes deletion vectors added on both sides") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "mor")
    val b = SnapshotTable.branchDir(t, "mor")
    SnapshotTable.commit(spark, b, sliceB.repartition(1), overwrite = false)
    // branch MOR-deletes rows of the FORK file and of its own B file;
    // main appends C and MOR-deletes its own A rows, OVERLAPPING the
    // branch's range on k<3 — nobody rewrote a file, so the publish
    // splices the vector union (a position deleted twice anti-joins
    // identically, the concurrent-deleteWhere law)
    assert(SnapshotTable.deleteWhere(spark, b,
      col("k") < 5L || (col("k") >= 100L && col("k") < 105L)).nonEmpty)
    SnapshotTable.commit(spark, t, sliceC.repartition(1), overwrite = false)
    assert(SnapshotTable.deleteWhere(spark, t,
      col("k") < 3L || (col("k") >= 50L && col("k") < 60L)).nonEmpty)
    SnapshotTable.publishBranch(spark, t, "mor")
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // A(100) minus {0..4}∪{50..59} (15), B(60) minus {100..104}, C(50)
    assert(main.count() == 190, "vector union lost or doubled a delete")
    assert(main.filter(col("k") < 5L).count() == 0)
    assert(main.filter(col("k") >= 50L && col("k") < 60L).count() == 0)
    assert(main.filter(col("k") >= 100L && col("k") < 105L).count() == 0)
    assert(main.filter(col("k") === 99L).count() == 1)
    // metadata row arithmetic survives the splice
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(190L))
  }

  test("rebase refuses branch vectors into a file main rewrote") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "dv")
    val b = SnapshotTable.branchDir(t, "dv")
    assert(SnapshotTable.deleteWhere(spark, b, col("k") === 7L).nonEmpty)
    // main rewrites the fork file the branch's vector points into —
    // its row numbering is gone, so splicing the vector would lose
    // (or misdirect) the delete
    assert(SnapshotTable.updateWhere(spark, t, col("k") === 2L,
      Map("v" -> lit(-2L))).nonEmpty)
    val e = intercept[IllegalStateException] {
      SnapshotTable.publishBranch(spark, t, "dv") }
    assert(e.getMessage.contains("the branch deleted rows in"))
    // main is untouched by the refused publish
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 100)
    assert(SnapshotTable.branches(spark, t) == Seq("dv"))
  }

  test("rebase refuses main vectors into a file the branch rewrote") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br8-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.branchCreate(spark, t, "dw")
    val b = SnapshotTable.branchDir(t, "dw")
    assert(SnapshotTable.updateWhere(spark, b, col("k") === 2L,
      Map("v" -> lit(-2L))).nonEmpty)
    assert(SnapshotTable.deleteWhere(spark, t, col("k") === 7L).nonEmpty)
    val e = intercept[IllegalStateException] {
      SnapshotTable.publishBranch(spark, t, "dw") }
    assert(e.getMessage.contains("main deleted rows in"))
  }

  test("branch-retired vectors drop from the rebased manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br9-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    // the FORK state carries an outstanding vector
    assert(SnapshotTable.deleteWhere(spark, t, col("k") === 7L).nonEmpty)
    SnapshotTable.branchCreate(spark, t, "abs")
    val b = SnapshotTable.branchDir(t, "abs")
    // the branch ABSORBS it (rewrites the carrier, retires the line);
    // main keeps ingesting untouched files
    assert(SnapshotTable.absorbDeletes(spark, b).nonEmpty)
    SnapshotTable.commit(spark, t, sliceC.repartition(1), overwrite = false)
    SnapshotTable.publishBranch(spark, t, "abs")
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 149) // A minus k=7, plus C
    assert(main.filter(col("k") === 7L).count() == 0)
    // the retired vector did NOT survive the splice: the published
    // state absorbs cleanly as a no-op (nothing left to absorb)
    assert(SnapshotTable.absorbDeletes(spark, t).isEmpty)
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(149L))
  }

  test("branch AS OF forks a retained past version and fixes forward") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br11-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    SnapshotTable.commit(spark, t, sliceC.repartition(1), overwrite = false)
    // fork from v1 — reproduce the PAST state, not the latest
    SnapshotTable.branchCreate(spark, t, "past", asOf = 1)
    val b = SnapshotTable.branchDir(t, "past")
    assert(SnapshotTable.readAsOf(spark, b, Int.MaxValue).count() == 100)
    // the fix, applied to the past state; publish rebases it onto the
    // moved main (everything since the fork counts as "main moved")
    assert(SnapshotTable.updateWhere(spark, b, col("k") === 1L,
      Map("v" -> lit(-1L))).nonEmpty)
    SnapshotTable.publishBranch(spark, t, "past")
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 150) // the fix landed, C survived
    assert(main.filter(col("k") === 1L).head().getLong(1) == -1L)
    assert(main.filter(col("k") >= 200L).count() == 50)
    // an explicit version must be RETAINED
    intercept[IllegalArgumentException] {
      SnapshotTable.branchCreate(spark, t, "nope", asOf = 99) }
  }

  test("branches stack: a branch of a branch publishes inward, then out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-br10-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, sliceA.repartition(1), overwrite = false)
    // a staging branch takes slice B, then a SUB-branch stages a risky
    // fix on top of the staging state — a branch is a full snapshot
    // table, so the WAP machinery nests by construction
    SnapshotTable.branchCreate(spark, t, "stage")
    val stage = SnapshotTable.branchDir(t, "stage")
    SnapshotTable.commit(spark, stage, sliceB.repartition(1),
      overwrite = false)
    SnapshotTable.branchCreate(spark, stage, "sub")
    val sub = SnapshotTable.branchDir(stage, "sub")
    SnapshotTable.commit(spark, sub, sliceC.repartition(1),
      overwrite = false)
    assert(SnapshotTable.updateWhere(spark, sub, col("k") === 200L,
      Map("v" -> lit(-200L))).nonEmpty)
    // neither parent saw a byte of the sub-branch work
    assert(SnapshotTable.readAsOf(spark, stage, Int.MaxValue).count() == 160)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 100)
    // publish inward: sub → stage (stage unmoved: fast-forward)
    SnapshotTable.publishBranch(spark, stage, "sub")
    assert(SnapshotTable.readAsOf(spark, stage, Int.MaxValue).count() == 210)
    // then outward: stage → main, a REBASE over main's fresh ingest
    assert(SnapshotTable.deleteWhere(spark, t, col("k") === 9L).nonEmpty)
    SnapshotTable.publishBranch(spark, t, "stage")
    val main = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(main.count() == 209) // A-1 + B + C, the fix intact
    assert(main.filter(col("k") === 200L).head().getLong(1) == -200L)
    assert(main.filter(col("k") === 9L).count() == 0)
    // main now references files under BOTH nested branch dirs — the
    // drop guard sees through the nesting (path containment)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.dropBranch(spark, t, "stage") }
    assert(e.getMessage.contains("still references"))
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
