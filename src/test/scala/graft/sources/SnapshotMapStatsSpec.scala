package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Declared map-key zone maps (`setMapStatKeys` / `GRAFT STATS KEYS`):
  * `WHERE attrs['k'] = v` must skip files from the manifest alone,
  * exactly as top-level and struct-leaf predicates do — the opt-in
  * stats for the unbounded-key `map<string,V>` metadata columns crawl
  * corpora carry. */
class SnapshotMapStatsSpec extends GraftSpec {

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

  // one commit per disjoint range of attrs['k'] (long values), with a
  // second declared-able string key and an UNDECLARED key riding along
  private def slice(i: Int) =
    spark.range(i * 100, (i + 1) * 100).select(
      col("id").as("doc"),
      map(lit("k"), col("id").cast("string"),
        lit("tag"), concat(lit("t"), col("id"))).as("labels"),
      map(lit("k"), col("id")).as("nums"))

  private def graftSql(sql: String) =
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
        .parsePlan(sql))

  test("declared map keys prune files; undeclared keys keep everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mps1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1), overwrite = false)
    graftSql(s"GRAFT STATS KEYS '$t' (nums['k'], labels['tag'])").collect()
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // point probe on the long-valued key: slice 0 predates the
    // declaration (no stat — KEPT, sound) + the home file
    assert(scannedFiles(snap.filter(col("nums")("k") === 250L), 1) == 2)
    // range probe
    assert(scannedFiles(
      snap.filter(col("nums")("k") >= 150L && col("nums")("k") < 300L),
      150) <= 3)
    // string-valued key point probe rides the same machinery
    assert(scannedFiles(snap.filter(col("labels")("tag") === "t342"), 1) <= 2)
    // UNDECLARED key: no stat anywhere — every file kept (sound)
    assert(scannedFiles(snap.filter(col("labels")("k") === "250"), 1) == 4)
    // out-of-range probe: only the statless pre-declaration file
    assert(scannedFiles(snap.filter(col("nums")("k") === 999L), 0) == 1)
    // ANALYZE backfills the pre-declaration file; the probe is now strict
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(scannedFiles(packed.filter(col("nums")("k") === 250L), 1) == 1)
    assert(scannedFiles(packed.filter(col("nums")("k") === 999L), 0) == 0)
  }

  test("missing-key nulls refute point probes; IS NULL uses the counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mps2-").toString
    val t = s"$dir/tbl"
    // file 0: every row HAS the key; file 1: NO row has it (the stat's
    // null count is the `attrs['k'] IS NULL` row count — missing keys
    // and null maps included, exactly the predicate's semantics)
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id").as("doc"),
        map(lit("k"), col("id")).as("attrs")).repartition(1),
      overwrite = false)
    graftSql(s"GRAFT STATS KEYS '$t' (attrs['k'])").collect()
    SnapshotTable.commit(spark, t,
      spark.range(10, 20).select(col("id").as("doc"),
        map(lit("other"), col("id")).as("attrs")).repartition(1),
      overwrite = false)
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // the all-missing file is refuted for any value probe
    assert(scannedFiles(snap.filter(col("attrs")("k") === 5L), 1) == 1)
    // IS NOT NULL refutes it too; IS NULL refutes the all-present file
    assert(scannedFiles(snap.filter(col("attrs")("k").isNotNull), 10) == 1)
    assert(scannedFiles(snap.filter(col("attrs")("k").isNull), 10) == 1)
  }

  test("map-key Blooms refute unclustered point probes zone maps keep") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mps4-").toString
    val t = s"$dir/tbl"
    // round-robin layout: every file's attrs['k'] RANGE straddles every
    // value, so zone maps keep all files — only a membership Bloom can
    // refute the point probe (the unclustered-lookup case)
    def rr(i: Int) = spark.range(0, 100)
      .filter(pmod(col("id"), lit(4)) === i)
      .select(col("id").as("doc"),
        map(lit("k"), col("id")).as("attrs"),
        map(lit("tag"), concat(lit("t"), col("id"))).as("labels"))
    SnapshotTable.commit(spark, t, rr(0).repartition(1), overwrite = false)
    // GRAFT BLOOM on a map key: implies stats enumeration too
    graftSql(s"GRAFT BLOOM '$t' (attrs['k'], labels['tag'])").collect()
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, rr(i).repartition(1),
        overwrite = false))
    // ANALYZE backfills the pre-declaration file's stat + Bloom
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // the long-valued key: 37 ≡ 1 (mod 4) lives in exactly one file;
    // ranges straddle, the Bloom refutes the other three
    assert(scannedFiles(snap.filter(col("attrs")("k") === 37L), 1) == 1)
    // the string-valued key rides the same machinery
    assert(scannedFiles(snap.filter(col("labels")("tag") === "t38"), 1) == 1)
    // absent value: every file refuted
    assert(scannedFiles(snap.filter(col("attrs")("k") === 999L), 0) == 0)
    // refusals: non-map column, unhashable shape
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("doc['k']")) }
  }

  test("declarations survive compaction and refuse bad shapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mps3-").toString
    val t = s"$dir/tbl"
    (0 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    assert(SnapshotTable.setMapStatKeys(spark, t, Seq("nums['k']")) > 0)
    // refusals: non-map column, malformed item, quoted key
    intercept[IllegalArgumentException] {
      SnapshotTable.setMapStatKeys(spark, t, Seq("doc['k']")) }
    intercept[IllegalArgumentException] {
      SnapshotTable.setMapStatKeys(spark, t, Seq("nums.k")) }
    intercept[IllegalArgumentException] {
      SnapshotTable.setMapStatKeys(spark, t, Seq("nums['a''b']")) }
    // compaction repacks with fresh per-key stats (declaration carried)
    assert(SnapshotTable.compact(spark, t, 64L * 1024 * 1024,
      128L * 1024 * 1024).nonEmpty)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(packed.inputFiles.length == 1)
    assert(scannedFiles(packed.filter(col("nums")("k") === 999L), 0) == 0)
    // clearing the declaration stops collection for NEW commits
    assert(SnapshotTable.setMapStatKeys(spark, t, Nil) > 0)
    SnapshotTable.commit(spark, t, slice(9).repartition(1),
      overwrite = false)
    val after = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // old file still refutes; the new statless file is kept
    assert(scannedFiles(after.filter(col("nums")("k") === 5000L), 0) == 1)
  }
}
