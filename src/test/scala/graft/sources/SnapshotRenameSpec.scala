package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** RENAME COLUMN — metadata-only (physical-name indirection through
  * field metadata, the Iceberg/Delta-column-mapping discipline): one
  * manifest publish, zero data files touched; scans/stats/pruning key
  * on the stored physical name and alias to the logical one. */
class SnapshotRenameSpec extends GraftSpec {

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

  test("rename is metadata-only: same files, values served, pruning intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitClustered(spark, t,
      spark.range(0, 4000).select(col("id").as("k"),
        (col("id") * 3).as("v"), concat(lit("s"), col("id")).as("s")),
      overwrite = false, nFiles = 4, clusterCols = Seq("k"))
    val filesBefore = SnapshotTable.readAsOf(spark, t, 1).inputFiles.toSet
    assert(SnapshotTable.renameColumn(spark, t, "v", "val2") == 2)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // zero data movement: the rename republished the SAME file set
    assert(snap.inputFiles.toSet == filesBefore)
    assert(snap.columns.toSeq == Seq("k", "val2", "s"))
    assert(snap.agg(sum(col("val2"))).head().getLong(0) ==
      (0L until 4000L).map(_ * 3).sum)
    // zone maps still prune a selective predicate (stats key on the
    // physical name; the filter pushes through the alias projection)
    assert(scannedFiles(snap.filter(col("k") >= 500 && col("k") < 600),
      100) <= 2)
    // ... including on the RENAMED column itself (clustered with k)
    assert(scannedFiles(
      snap.filter(col("val2") >= 1500 && col("val2") < 1800), 100) <= 2)
    // time travel shows each version its own name
    assert(SnapshotTable.readAsOf(spark, t, 1).columns.toSeq ==
      Seq("k", "v", "s"))
    // stats report the LOGICAL name, same values as before the rename
    val ma = SnapshotTable.metaAgg(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ma.contains("val2") && !ma.contains("v"))
    assert(ma("val2").getLong(4) == 0L &&
      ma("val2").getLong(5) == 3L * 3999)
    assert(ma("val2").getBoolean(10), "bounds stay exact across a rename")
    assert(!ma("val2").isNullAt(11), "NDV sketch survives a rename")
    val ps = SnapshotTable.plannerStats(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ps.contains("val2") && ps("val2").getLong(2) == 4000L)
    assert(ps("val2").getLong(3) > 0L, "catalog NDV visible under new name")
  }

  test("appends after a rename write the physical name; epochs stay one-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitClustered(spark, t,
      spark.range(0, 2000).select(col("id").as("k"), (col("id") * 3).as("v")),
      overwrite = false, nFiles = 2, clusterCols = Seq("k"))
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    // the append arrives under the LOGICAL name
    SnapshotTable.commitClustered(spark, t,
      spark.range(2000, 4000).select(col("id").as("k"),
        (col("id") * 3).as("val2")),
      overwrite = false, nFiles = 2, clusterCols = Seq("k"))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.count() == 4000)
    // BOTH epochs' values serve under val2 — pre-rename files store
    // column `v`, post-rename files store `v` too (the physical name)
    assert(snap.agg(sum(col("val2"))).head().getLong(0) ==
      (0L until 4000L).map(_ * 3).sum)
    assert(snap.filter(col("val2") === 300L).count() == 1)
    // zone maps prune across BOTH epochs (all stats on one key)
    assert(scannedFiles(snap.filter(col("k") >= 2200 && col("k") < 2300),
      100) <= 2)
    // NDV merged across the rename: exact growth, not a reset
    val ps = SnapshotTable.plannerStats(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ps("k").getLong(3) > 2000L,
      s"NDV must cover both epochs: ${ps("k")}")
    // the new files physically store `v`, not `val2`
    val newFile = snap.inputFiles.toSet
      .diff(SnapshotTable.readAsOf(spark, t, 2).inputFiles.toSet).head
    val raw = spark.read.parquet(newFile.stripPrefix("file:"))
    assert(raw.columns.contains("v") && !raw.columns.contains("val2"))
  }

  test("haunted-name hazards are refused; rename-back clears the indirection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id").as("k"), (col("id") * 3).as("v"),
        col("id").cast("double").as("w")), overwrite = false)
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    // a NEW column may not take the reserved physical name: pre-rename
    // files store `v` and would resurface those values under it
    val bad1 = intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, t,
        spark.range(100, 110).select(col("id").as("k"),
          (col("id") * 3).as("val2"), col("id").cast("double").as("w"),
          col("id").as("v")), overwrite = false)
    }
    assert(bad1.getMessage.contains("physical storage"))
    // another column may not RENAME onto the reserved physical name
    val bad2 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, t, "w", "v")
    }
    assert(bad2.getMessage.contains("physical storage"))
    // occupied / missing / layout-key refusals
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, t, "w", "val2") }
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, t, "nope", "x") }
    // dropping the renamed column reserves BOTH names
    SnapshotTable.dropColumn(spark, t, "val2")
    val bad3 = intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, t,
        spark.range(0, 1).select(col("id").as("k"),
          col("id").cast("double").as("w"), col("id").as("v")),
        overwrite = false)
    }
    assert(bad3.getMessage.contains("dropped"))
    val bad4 = intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, t,
        spark.range(0, 1).select(col("id").as("k"),
          col("id").cast("double").as("w"), col("id").as("val2")),
        overwrite = false)
    }
    assert(bad4.getMessage.contains("dropped"))
    // rename-back on a fresh table ends the indirection: the field
    // metadata is clean, so appends need no physical mapping at all
    val t2 = s"$dir/tbl2"
    SnapshotTable.commit(spark, t2,
      spark.range(0, 10).select(col("id").as("a"), col("id").as("b")),
      overwrite = false)
    SnapshotTable.renameColumn(spark, t2, "a", "c")
    SnapshotTable.renameColumn(spark, t2, "c", "a")
    val sc = SnapshotTable.readAsOf(spark, t2, Int.MaxValue).schema
    assert(sc.fieldNames.toSeq == Seq("a", "b"))
    assert(!sc("a").metadata.contains(SnapshotTable.PhysKey))
  }

  test("layout keys and constraint-referenced columns refuse to rename") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren4-").toString
    val tb = s"$dir/bucketed"
    SnapshotTable.commitBucketed(spark, tb,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v")),
      overwrite = false, nBuckets = 4, bucketCol = "k")
    val b1 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, tb, "k", "kk") }
    assert(b1.getMessage.contains("layout key"))
    val tp = s"$dir/parted"
    SnapshotTable.commitPartitioned(spark, tp,
      spark.range(0, 100).select((col("id") % 3).as("p"), col("id").as("v")),
      "p", overwrite = false)
    val b2 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, tp, "p", "pp") }
    assert(b2.getMessage.contains("layout key"))
    // but a DATA column of a partitioned table renames fine, and
    // directory pruning composes with the alias
    SnapshotTable.renameColumn(spark, tp, "v", "vv")
    val snap = SnapshotTable.readAsOf(spark, tp, Int.MaxValue)
    assert(snap.filter(col("p") === 1L).agg(sum(col("vv"))).head().getLong(0)
      == (0L until 100L).filter(_ % 3 == 1).sum)
    val tc = s"$dir/constrained"
    SnapshotTable.commit(spark, tc,
      spark.range(1, 10).select(col("id").as("k"), col("id").as("v")),
      overwrite = false)
    SnapshotTable.addConstraint(spark, tc, "v_pos", "v > 0")
    val b3 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, tc, "v", "vv") }
    assert(b3.getMessage.contains("constraint"))
  }

  test("DML and maintenance compose with a renamed column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("v")),
      overwrite = false)
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    // selective merge: upserts arrive under the LOGICAL schema
    SnapshotTable.merge(spark, t,
      spark.range(0, 10).select(col("id").as("k"), lit(-1L).as("val2")),
      spark.range(990, 1000).select(col("id").as("k")), "k")
    val afterMerge = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(afterMerge.count() == 990)
    assert(afterMerge.filter(col("val2") === -1L).count() == 10)
    // merge-on-read delete by a predicate on the logical name
    SnapshotTable.deleteWhere(spark, t, col("val2") > 2900L)
    val afterDel = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(afterDel.filter(col("val2") > 2900L).count() == 0)
    val liveSum = afterDel.agg(sum(col("val2"))).head().getLong(0)
    // absorb rewrites only the vector-carrying files — physically named
    assert(SnapshotTable.absorbDeletes(spark, t).nonEmpty)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .agg(sum(col("val2"))).head().getLong(0) == liveSum)
    // compact packs the small files — still physically named
    SnapshotTable.compact(spark, t, smallFileBytes = 64L * 1024 * 1024,
      targetFileBytes = 128L * 1024 * 1024)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(packed.agg(sum(col("val2"))).head().getLong(0) == liveSum)
    // ANALYZE recollects stats from the physically-named files and the
    // planner sees them under the logical name
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val ps = SnapshotTable.plannerStats(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ps("val2").getLong(3) > 0L, s"post-ANALYZE NDV: ${ps("val2")}")
    // the change feed across the whole history serves toV's names
    val cdf = SnapshotTable.readChanges(spark, t, 0, 2)
    assert(cdf.columns.contains("val2"))
    assert(cdf.filter(col("change_type") === "insert").count() == 1000)
    // a rename-only step is an EMPTY feed (no rows changed)
    assert(SnapshotTable.readChanges(spark, t, 1, 2).count() == 0)
  }

  test("the bare-relation doorway refuses renamed tables honestly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")),
      overwrite = false)
    // pre-rename: the CREATE TABLE USING doorway works
    spark.sql(s"""CREATE TABLE ren_doorway
      USING `graft.sources.SnapshotSourceProvider` OPTIONS (path '$t')""")
    try {
      assert(spark.table("ren_doorway").count() == 10)
      SnapshotTable.renameColumn(spark, t, "v", "vv")
      // a BaseRelation has no projection to alias physical names — it
      // must refuse rather than serve an all-NULL renamed column
      spark.sql("REFRESH TABLE ren_doorway")
      val err = intercept[Exception] {
        spark.table("ren_doorway").collect()
      }
      assert(err.getMessage.contains("renamed columns"),
        s"expected the honest refusal, got: ${err.getMessage}")
      // the library read path keeps serving
      assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
        .agg(sum(col("vv"))).head().getLong(0) == 45L)
    } finally spark.sql("DROP TABLE IF EXISTS ren_doorway")
  }

  test("GRAFT RENAME COLUMN: the SQL doorway") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ren6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 50).select(col("id").as("k"), (col("id") * 2).as("v")),
      overwrite = false)
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    assert(graftSql(s"GRAFT RENAME COLUMN '$t' v TO score").head()
      .getInt(0) == 2)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.columns.toSeq == Seq("k", "score"))
    assert(snap.agg(sum(col("score"))).head().getLong(0) ==
      (0L until 50L).map(_ * 2).sum)
  }
}
