package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Selective copy-on-write MERGE: only files that actually CONTAIN
  * touched keys are rewritten; untouched files are carried through the
  * manifest BY REFERENCE, and a concurrent commit invalidates the plan
  * (re-planned merge, not a lost update). */
class SnapshotMergeSpec extends GraftSpec {

  private def state(t: String): Map[Long, String] =
    SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("merge rewrites only the files containing touched keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrg1-").toString
    val t = s"$dir/tbl"
    // 8 range-clustered files over ids 0..799
    SnapshotTable.commit(spark, t,
      spark.range(0, 800).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
        .repartitionByRange(8, col("id")),
      overwrite = false)
    val before = SnapshotTable.readAsOf(spark, t, 1).inputFiles.toSet
    assert(before.size == 8)
    // touch keys 10 and 11 — both live in the FIRST range file
    SnapshotTable.merge(spark, t,
      Seq((10L, "X")).toDF("id", "v"), Seq(11L).toDF("id"), "id")
    val after = SnapshotTable.readAsOf(spark, t, 2).inputFiles.toSet
    // 7 of 8 original files carried BY REFERENCE, 1 rewritten
    assert((before & after).size == 7,
      s"expected 7 carried files, got ${(before & after).size}")
    val m = state(t)
    assert(m.size == 799 && m(10L) == "X" && !m.contains(11L) && m(12L) == "v12")
    // history intact
    assert(SnapshotTable.readAsOf(spark, t, 1).count() == 800)
  }

  test("merge semantics unchanged: upsert replaces, delete removes, upsert wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrg2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), overwrite = false)
    SnapshotTable.merge(spark, t,
      Seq((2L, "B"), (9L, "i")).toDF("id", "v"), Seq(3L, 2L).toDF("id"), "id")
    assert(state(t) == Map(1L -> "a", 2L -> "B", 9L -> "i"))
    // merge into a FRESH table still works (full path)
    val t2 = s"$dir/tbl2"
    SnapshotTable.merge(spark, t2,
      Seq((5L, "e")).toDF("id", "v"), Seq.empty[Long].toDF("id"), "id")
    assert(state(t2) == Map(5L -> "e"))
  }

  test("a concurrent append mid-merge forces a re-plan that keeps BOTH effects") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrg3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = false)
    // fire ONCE between the merge's data write and its publish: the live
    // file set changes, the first plan must abort and re-plan over the
    // appended state (a blind overwrite would silently drop id 7)
    var fired = false
    SnapshotTable.beforePublishHook = () =>
      if (!fired) {
        fired = true
        SnapshotTable.commit(spark, t, Seq((7L, "g")).toDF("id", "v"),
          overwrite = false)
      }
    try SnapshotTable.merge(spark, t,
      Seq((2L, "B")).toDF("id", "v"), Seq.empty[Long].toDF("id"), "id")
    finally SnapshotTable.beforePublishHook = () => ()
    assert(fired)
    assert(state(t) == Map(1L -> "a", 2L -> "B", 7L -> "g"),
      "concurrent append was lost or merge effect missing")
  }

  test("null-key rows are never touched by a merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mrg4-").toString
    val t = s"$dir/tbl"
    val rows: Seq[(java.lang.Long, String)] =
      Seq((java.lang.Long.valueOf(1L), "a"), (null, "anon"))
    SnapshotTable.commit(spark, t, rows.toDF("id", "v"), overwrite = false)
    SnapshotTable.merge(spark, t,
      Seq((1L, "A")).toDF("id", "v"), Seq.empty[Long].toDF("id"), "id")
    val got = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set((Some(1L), "A"), (None, "anon")))
  }
}
