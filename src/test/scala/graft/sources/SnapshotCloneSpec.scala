package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Shallow clone ([[SnapshotTable.cloneTable]]): manifest-reference
  * branching with zero data copied, independent evolution on both
  * sides, and maintenance isolation (a clone's vacuum must never reach
  * into the source's data). */
class SnapshotCloneSpec extends GraftSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("clone mirrors the source version, then both sides diverge freely") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-clone1-").toString
    val src = s"$dir/src"
    val cln = s"$dir/cln"
    SnapshotTable.commit(spark, src, Seq(1L, 2L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, src, Seq(3L).toDF("id"), overwrite = false)
    assert(SnapshotTable.cloneTable(spark, src, cln) == 1)
    assert(ids(SnapshotTable.readAsOf(spark, cln, 1)) == Set(1L, 2L, 3L))
    // zero-copy: the clone owns no data files at all
    val clnData = new java.io.File(s"$cln/data")
    assert(!clnData.exists() || clnData.listFiles().isEmpty,
      "shallow clone must not copy data files")
    // divergence: appends on either side are invisible to the other
    SnapshotTable.commit(spark, cln, Seq(40L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, src, Seq(50L).toDF("id"), overwrite = false)
    assert(ids(SnapshotTable.readAsOf(spark, cln, 2)) == Set(1L, 2L, 3L, 40L))
    assert(ids(SnapshotTable.readAsOf(spark, src, 3)) == Set(1L, 2L, 3L, 50L))
    // the cloned-from version is immutable history on both sides
    assert(ids(SnapshotTable.readAsOf(spark, src, 2)) == Set(1L, 2L, 3L))
    assert(ids(SnapshotTable.readAsOf(spark, cln, 1)) == Set(1L, 2L, 3L))
  }

  test("clone at an explicit version; refusal onto a non-empty destination") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-clone2-").toString
    val src = s"$dir/src"
    val cln = s"$dir/cln"
    SnapshotTable.commit(spark, src, Seq(1L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, src, Seq(2L).toDF("id"), overwrite = false)
    assert(SnapshotTable.cloneTable(spark, src, cln, asOf = 1) == 1)
    assert(ids(SnapshotTable.readAsOf(spark, cln, 1)) == Set(1L))
    intercept[IllegalArgumentException] {
      SnapshotTable.cloneTable(spark, src, cln)
    }
    // an EXPLICIT version must be a retained published version — no
    // silent floor to an older snapshot (Delta VERSION AS OF errors too)
    val cln2 = s"$dir/cln2"
    intercept[IllegalArgumentException] {
      SnapshotTable.cloneTable(spark, src, cln2, asOf = 99)
    }
    // vacuumed-away explicit version: also an error, not a floor
    SnapshotTable.commit(spark, src, Seq(3L).toDF("id"), overwrite = false)
    SnapshotTable.vacuum(spark, src, keepVersions = 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.cloneTable(spark, src, cln2, asOf = 1)
    }
    // the "latest" sentinel keeps its floor semantics
    assert(SnapshotTable.cloneTable(spark, src, cln2) == 1)
    assert(ids(SnapshotTable.readAsOf(spark, cln2, 1)) == Set(1L, 2L, 3L))
  }

  test("deletion vectors and constraints travel with the clone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-clone3-").toString
    val src = s"$dir/src"
    val cln = s"$dir/cln"
    SnapshotTable.commit(spark, src,
      spark.range(0, 10).select(col("id")), overwrite = false)
    SnapshotTable.deleteWhere(spark, src, col("id") >= 8)
    SnapshotTable.addConstraint(spark, src, "small_ids", "id < 100")
    SnapshotTable.cloneTable(spark, src, cln)
    assert(ids(SnapshotTable.readAsOf(spark, cln, 1)) == (0L to 7L).toSet)
    assert(SnapshotTable.constraints(spark, cln).contains("small_ids"))
    intercept[Exception] {
      SnapshotTable.commit(spark, cln, Seq(500L).toDF("id"), overwrite = false)
    }
  }

  test("restore replays an old version forward; txn set and history survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-restore1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitIdempotent(spark, t, Seq(1L, 2L).toDF("id"),
      overwrite = false, txnId = "load-1")
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(99L).toDF("id"), overwrite = true)
    assert(SnapshotTable.restore(spark, t, 2) == 4)
    assert(ids(SnapshotTable.readAsOf(spark, t, 4)) == Set(1L, 2L, 3L))
    // the bad version is still time-travelable until vacuum
    assert(ids(SnapshotTable.readAsOf(spark, t, 3)) == Set(99L))
    // the CURRENT txn set carried through: the replayed producer txn is
    // still a no-op after the rollback
    SnapshotTable.commitIdempotent(spark, t, Seq(1L, 2L).toDF("id"),
      overwrite = false, txnId = "load-1")
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) ==
      Set(1L, 2L, 3L), "replayed txn after restore must deduplicate")
    // restoring a version with deletion vectors replays the subtraction
    val t2 = s"$dir/tbl2"
    SnapshotTable.commit(spark, t2,
      spark.range(0, 6).select(col("id")), overwrite = false)
    SnapshotTable.deleteWhere(spark, t2, col("id") >= 4)
    SnapshotTable.commit(spark, t2, Seq(100L).toDF("id"), overwrite = true)
    SnapshotTable.restore(spark, t2, 2)
    assert(ids(SnapshotTable.readAsOf(spark, t2, 4)) == (0L to 3L).toSet)
    intercept[IllegalArgumentException] {
      SnapshotTable.restore(spark, t2, 9)
    }
  }

  test("vacuum on the clone never deletes the source's borrowed files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-clone4-").toString
    val src = s"$dir/src"
    val cln = s"$dir/cln"
    SnapshotTable.commit(spark, src, Seq(1L, 2L).toDF("id"), overwrite = false)
    SnapshotTable.cloneTable(spark, src, cln)
    // make the borrowed version expirable on the clone, then vacuum hard
    SnapshotTable.commit(spark, cln, Seq(9L).toDF("id"), overwrite = true)
    SnapshotTable.vacuum(spark, cln, keepVersions = 1)
    // the source still reads perfectly: vacuum only swept cln/data
    assert(ids(SnapshotTable.readAsOf(spark, src, 1)) == Set(1L, 2L))
    assert(ids(SnapshotTable.readAsOf(spark, cln, 2)) == Set(9L))
  }
}
