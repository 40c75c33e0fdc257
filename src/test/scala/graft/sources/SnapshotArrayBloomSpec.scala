package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Declared ARRAY-ELEMENT Blooms (`setBloomColumns` on an array
  * column / `GRAFT BLOOM '<dir>' (tags)`): a pushed
  * `array_contains(col, v)` must skip files from the manifest alone —
  * element bounds (array_min/array_max) range-refute, the 1 KiB
  * element Bloom point-refutes — the third member of the
  * membership-probe family after struct leaves and map keys, and the
  * shape tag/label array columns of crawl metadata take. */
class SnapshotArrayBloomSpec extends GraftSpec {

  private def scannedFiles(df: org.apache.spark.sql.DataFrame,
      rows: Long): Long = {
    assert(df.collect().length == rows)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  private def graftSql(sql: String) =
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
        .parsePlan(sql))

  // slice i holds string tags "t<i*100>".."t<i*100+99>" and long ids
  // i*100..i*100+99 — element universes disjoint per file
  private def slice(i: Int) =
    spark.range(i * 100, (i + 1) * 100).select(
      col("id").as("doc"),
      array(concat(lit("t"), col("id")),
        concat(lit("t"), col("id") + 1)).as("tags"),
      array(col("id"), col("id") + lit(1L)).as("refs"))

  test("array_contains prunes on element bounds + element Bloom") {
    val dir = java.nio.file.Files.createTempDirectory("graft-abl1-").toString
    val t = s"$dir/tbl"
    // slice 0 lands BEFORE the declaration (no element stats — kept by
    // the pruner, sound); slices 1-3 after
    SnapshotTable.commit(spark, t, slice(0).repartition(1), overwrite = false)
    graftSql(s"GRAFT BLOOM '$t' (tags, refs)").collect()
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // string-element point probe (rows 249 and 250 both carry t250):
    // the statless file + the home file
    assert(scannedFiles(
      snap.filter(array_contains(col("tags"), "t250")), 2) == 2)
    // long-element point probe rides the same machinery
    assert(scannedFiles(
      snap.filter(array_contains(col("refs"), 250L)), 2) == 2)
    // absent element inside the global range: bounds cannot refute in
    // the home band, the BLOOM does ("t250x" hashes nowhere) — only
    // the statless file survives
    assert(scannedFiles(
      snap.filter(array_contains(col("tags"), "t250x")), 0) <= 2)
    // out-of-range element: bounds refute every declared file
    assert(scannedFiles(
      snap.filter(array_contains(col("refs"), 9999L)), 0) == 1)
    // ANALYZE backfills the pre-declaration file: probes now strict
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(scannedFiles(
      packed.filter(array_contains(col("tags"), "t250")), 2) == 1)
    assert(scannedFiles(
      packed.filter(array_contains(col("refs"), 9999L)), 0) == 0)
    // and the answers themselves stay exact under all that skipping
    assert(packed.filter(array_contains(col("tags"), "t250"))
      .select(col("doc")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(249L, 250L))
  }

  test("null/empty arrays, undeclared columns, and carry-through") {
    val dir = java.nio.file.Files.createTempDirectory("graft-abl2-").toString
    val t = s"$dir/tbl"
    // file 0: real tags; file 1: all arrays NULL; file 2: all EMPTY
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id").as("doc"),
        array(concat(lit("t"), col("id"))).as("tags")).repartition(1),
      overwrite = false)
    graftSql(s"GRAFT BLOOM '$t' (tags)").collect()
    SnapshotTable.commit(spark, t,
      spark.range(10, 20).select(col("id").as("doc"),
        lit(null).cast("array<string>").as("tags")).repartition(1),
      overwrite = false)
    SnapshotTable.commit(spark, t,
      spark.range(20, 30).select(col("id").as("doc"),
        array().cast("array<string>").as("tags")).repartition(1),
      overwrite = false)
    SnapshotTable.analyze(spark, t)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // the all-null file refutes by its null count; the all-empty file
    // refutes by its saturated-empty Bloom (no element ever inserted)
    assert(scannedFiles(
      snap.filter(array_contains(col("tags"), "t5")), 1) == 1)
    assert(snap.filter(array_contains(col("tags"), "t5"))
      .head().getLong(0) == 5L)
    // declaring an INELIGIBLE array element type refuses loudly
    val t2 = s"$dir/tbl2"
    SnapshotTable.commit(spark, t2,
      spark.range(0, 5).select(col("id").as("doc"),
        array(col("id") / 2.0).as("ws")), overwrite = false)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t2, Seq("ws")) }
    assert(e.getMessage.contains("not a hashable stat kind"))
    // the declaration survives a row-level rewrite (carryBloomDecls):
    // update one row, then re-probe — still a strict subset
    assert(SnapshotTable.updateWhere(spark, t, col("doc") === 5L,
      Map("doc" -> lit(5L))).nonEmpty)
    val after = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(scannedFiles(
      after.filter(array_contains(col("tags"), "t7")), 1) <= 2)
  }
}
