package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[SnapshotTable]] commit atomicity and snapshot-isolation contract. */
class SnapshotTableSpec extends GraftSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("append and overwrite snapshots; old versions never move") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-").toString
    val t = s"$dir/tbl"
    assert(SnapshotTable.commit(spark, t,
      Seq(1L, 2L).toDF("id"), overwrite = false) == 1)
    assert(SnapshotTable.commit(spark, t,
      Seq(3L).toDF("id"), overwrite = false) == 2)
    assert(SnapshotTable.commit(spark, t,
      Seq(9L).toDF("id"), overwrite = true) == 3)
    assert(ids(SnapshotTable.readAsOf(spark, t, 1)) == Set(1L, 2L))
    assert(ids(SnapshotTable.readAsOf(spark, t, 2)) == Set(1L, 2L, 3L))
    assert(ids(SnapshotTable.readAsOf(spark, t, 3)) == Set(9L))
    // as-of a future version resolves to the latest published one
    assert(ids(SnapshotTable.readAsOf(spark, t, 99)) == Set(9L))
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2, 3))
  }

  test("unreferenced data files and unpublished manifests are invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
    // a crashed writer's stray data file: lives in the data area but no
    // manifest references it -> readers never see it
    Seq(777L).toDF("id").write.parquet(s"$t/data/v00099")
    assert(ids(SnapshotTable.readAsOf(spark, t, 99)) == Set(1L))
    // a staged-but-unpublished manifest (crash before the rename) is not
    // a version
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t, "_commits", ".tmp-v00002"), "bogus")
    assert(SnapshotTable.versions(spark, t) == Seq(1))
    // the table keeps working after the mess: next commit publishes v2
    assert(SnapshotTable.commit(spark, t,
      Seq(2L).toDF("id"), overwrite = false) == 2)
    assert(ids(SnapshotTable.readAsOf(spark, t, 2)) == Set(1L, 2L))
  }

  test("merge: upsert replaces, delete removes, upsert wins a delete tie") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), overwrite = false)
    // upsert id 2 -> "B", insert id 9; delete ids 3 and 2 (2 also
    // upserted -> the upsert wins)
    SnapshotTable.merge(spark, t,
      Seq((2L, "B"), (9L, "i")).toDF("id", "v"),
      Seq(3L, 2L).toDF("id"), "id")
    val got = SnapshotTable.readAsOf(spark, t, 99)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B"), (9L, "i")))
    // v1 untouched by the merge
    assert(ids(SnapshotTable.readAsOf(spark, t, 1)) == Set(1L, 2L, 3L))
  }

  test("idempotent commits: a replayed txn id is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap5-").toString
    val t = s"$dir/tbl"
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(1L).toDF("id"),
      overwrite = false, txnId = "b0").contains(1))
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(2L).toDF("id"),
      overwrite = false, txnId = "b1").contains(2))
    // crash-restart replay of batch b1 with different (stale) content:
    // recognized and skipped — no third version, table unchanged
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(99L).toDF("id"),
      overwrite = false, txnId = "b1").isEmpty)
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2))
    assert(ids(SnapshotTable.readAsOf(spark, t, 99)) == Set(1L, 2L))
    assert(SnapshotTable.committedTxns(spark, t) == Set("b0", "b1"))
  }

  test("a running reader's plan is pinned to its snapshot's files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("id"), overwrite = false)
    val reader = SnapshotTable.readAsOf(spark, t, 1) // resolved NOW
    SnapshotTable.commit(spark, t, Seq(50L).toDF("id"), overwrite = true)
    // the overwrite landed, but the v1 reader still sees v1's files
    assert(ids(reader) == Set(1L, 2L))
    assert(ids(SnapshotTable.readAsOf(spark, t, 2)) == Set(50L))
  }
}
