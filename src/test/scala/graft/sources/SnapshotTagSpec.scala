package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Immutable snapshot tags ([[SnapshotTable.createTag]] / `GRAFT
  * TAG`): named reproducibility pins that survive vacuum retention —
  * the "eval set frozen as of v2" primitive. A tag is a tiny version
  * file, zero data copied; vacuum treats tagged versions (and every
  * file they reference) as retained until the tag drops. */
class SnapshotTagSpec extends GraftSpec {

  private def graftSql(sql: String) =
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
        .parsePlan(sql))

  private def slice(i: Int) = spark.range(i * 10, (i + 1) * 10)
    .select(col("id").as("k"), (col("id") * 2).as("v"))

  test("create/list/read/drop; duplicates and unknown versions refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tag1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1), overwrite = false)
    SnapshotTable.commit(spark, t, slice(1).repartition(1), overwrite = false)
    assert(SnapshotTable.createTag(spark, t, "v1pin", Some(1)) == 1)
    assert(SnapshotTable.createTag(spark, t, "latest") == 2) // default
    assert(SnapshotTable.tags(spark, t) == Map("v1pin" -> 1, "latest" -> 2))
    assert(SnapshotTable.readTag(spark, t, "v1pin").count() == 10)
    assert(SnapshotTable.readTag(spark, t, "latest").count() == 20)
    // a tag name exists once; unknown pin targets refuse
    intercept[Exception] { SnapshotTable.createTag(spark, t, "v1pin") }
    intercept[IllegalArgumentException] {
      SnapshotTable.createTag(spark, t, "nope", Some(9)) }
    intercept[IllegalArgumentException] {
      SnapshotTable.tagVersion(spark, t, "ghost") }
    SnapshotTable.dropTag(spark, t, "latest")
    assert(SnapshotTable.tags(spark, t) == Map("v1pin" -> 1))
    intercept[IllegalArgumentException] {
      SnapshotTable.dropTag(spark, t, "latest") } // already gone
  }

  test("vacuum keeps tagged versions and their files; drop releases") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tag2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1), overwrite = false)
    SnapshotTable.commit(spark, t, slice(1).repartition(1), overwrite = false)
    SnapshotTable.createTag(spark, t, "gold", Some(2))
    // an overwrite supersedes both files; KEEP 1 would normally expire
    // v1 and v2 — the tag must hold v2 (manifest AND files)
    SnapshotTable.commit(spark, t, slice(2).repartition(1), overwrite = true)
    val stats = SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(stats.expiredManifests == 1) // v1 only; v2 is pinned
    assert(SnapshotTable.versions(spark, t) == Seq(2, 3))
    // the pinned read is fully intact — files survived the sweep
    val pinned = SnapshotTable.readTag(spark, t, "gold")
    assert(pinned.count() == 20)
    assert(pinned.agg(sum(col("k"))).head().getLong(0)
      == (0 until 20).sum.toLong)
    // time travel to the tagged version works too (same retention)
    assert(SnapshotTable.readAsOf(spark, t, 2).count() == 20)
    // drop the tag: the next vacuum reclaims version and files
    SnapshotTable.dropTag(spark, t, "gold")
    val stats2 = SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(stats2.expiredManifests == 1)
    assert(stats2.deletedDataFiles >= 2)
    assert(SnapshotTable.versions(spark, t) == Seq(3))
  }

  test("SQL doorway + tag read option") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tag3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1), overwrite = false)
    SnapshotTable.commit(spark, t, slice(1).repartition(1), overwrite = false)
    assert(graftSql(s"GRAFT TAG '$t' CREATE gold AS OF 1")
      .head().getInt(0) == 1)
    assert(graftSql(s"GRAFT TAG '$t' CREATE tip").head().getInt(0) == 2)
    val listed = graftSql(s"GRAFT TAG '$t' LIST").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(listed == Seq(("gold", 1), ("tip", 2)))
    // the read doorway: tag option resolves the pin
    val viaTag = spark.read.format("graft.sources.SnapshotSourceProvider")
      .option("path", t).option("tag", "gold").load()
    assert(viaTag.count() == 10)
    assert(viaTag.agg(max(col("k"))).head().getLong(0) == 9L)
    // one time-travel selector at a time
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.SnapshotSourceProvider")
        .option("path", t).option("tag", "gold")
        .option("versionAsOf", "2").load() }
    assert(graftSql(s"GRAFT TAG '$t' DROP tip").head().getString(0) == "tip")
    assert(graftSql(s"GRAFT TAG '$t' LIST").count() == 1)
  }
}
