package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Manifest statistics surfaced to Catalyst: a snapshot read reports
  * `Statistics(rowCount, attributeStats)` from the manifest's exact
  * per-file row counts, null/byte accounting, and cumulative NDV
  * sketches — so join planning over snapshot tables sees real
  * cardinalities instead of compressed file bytes (the stats-blind
  * default that, at scale, turns a broadcastable dimension join into a
  * full shuffle or vice versa). */
class SnapshotStatsSpec extends GraftSpec {

  test("optimizedPlan serves exact rowCount, NDV, nulls and avg width") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stats1-").toString
    val t = s"$dir/tbl"
    val df = (1L to 100L).map(i =>
        (i, if (i % 10 == 0) null else s"name_${i % 7}%04d"))
      .toDF("id", "name").repartition(3)
    SnapshotTable.commit(spark, t, df, overwrite = false)
    val stats = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(100)),
      s"rowCount ${stats.rowCount} != 100")
    val byName = stats.attributeStats.toSeq
      .map { case (a, st) => a.name -> st }.toMap
    // id: 100 distinct — above the sketch's K=64, so an ESTIMATE within
    // the KMV error bound; no nulls
    val idNdv = byName("id").distinctCount.get
    assert(idNdv >= BigInt(75) && idNdv <= BigInt(130), s"id NDV $idNdv")
    assert(byName("id").nullCount.contains(BigInt(0)))
    // name: 7 distinct non-null renderings, 10 nulls
    assert(byName("name").distinctCount.contains(BigInt(7)))
    assert(byName("name").nullCount.contains(BigInt(10)))
    // avg width from the manifest's payload-byte totals: every non-null
    // value is the 10-byte literal "name_X%04d"
    assert(byName("name").avgLen.contains(10L),
      s"avgLen ${byName("name").avgLen} != 10")
    // an append folds in: counts re-derive from the union manifest
    SnapshotTable.commit(spark, t,
      (101L to 150L).map(i => (i, "zz")).toDF("id", "name"),
      overwrite = false)
    val st2 = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .queryExecution.optimizedPlan.stats
    assert(st2.rowCount.contains(BigInt(150)))
    val name2 = st2.attributeStats.toSeq
      .collectFirst { case (a, st) if a.name == "name" => st }.get
    assert(name2.distinctCount.contains(BigInt(8)))
  }

  test("join planning picks broadcast from manifest row counts, not file bytes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stats2-").toString
    val dim = s"$dir/dim"
    val fact = s"$dir/fact"
    // a TINY dimension spread over several files: parquet per-file
    // overhead makes its on-disk size far exceed its true in-memory
    // width (the inverse happens at scale with compression — either
    // way, file bytes misrepresent the relation)
    SnapshotTable.commit(spark, dim,
      (1L to 10L).map(i => (i, i * 2L)).toDF("k", "w").repartition(4),
      overwrite = false)
    SnapshotTable.commit(spark, fact,
      (1L to 5000L).map(i => (i % 10 + 1, i)).toDF("k", "v").repartition(4),
      overwrite = false)
    val dimBytes = SnapshotTable.readAsOf(spark, dim, Int.MaxValue)
      .queryExecution.logical.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode]
      .computeStats() // leaf stats under the session conf (planStats on)
    // with stats: rowCount-derived size (10 rows × 24B ≈ 240B)
    assert(dimBytes.sizeInBytes < 2048,
      s"stats-derived dim size ${dimBytes.sizeInBytes} not row-based")
    def joinPlan(planStats: Boolean): String = {
      val fork = org.apache.spark.sql.GraftSqlShim.forkSession(spark)
      fork.conf.set("spark.sql.cbo.planStats.enabled", planStats.toString)
      fork.conf.set("spark.sql.adaptive.enabled", "false")
      // threshold sits BETWEEN the true width (~240B) and the on-disk
      // bytes (4 parquet files, several KB): only a planner that reads
      // the manifest row count may broadcast
      fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
      val d = SnapshotTable.readAsOf(fork, dim, Int.MaxValue)
      val f = SnapshotTable.readAsOf(fork, fact, Int.MaxValue)
      f.join(d, "k").groupBy(d("w")).agg(sum(f("v")).as("s"))
        .queryExecution.sparkPlan.toString
    }
    val rawDiskBytes = SnapshotTable.readAsOf(spark, dim, Int.MaxValue)
      .inputFiles.map(p => new java.io.File(
        new java.net.URI(p).getPath).length).sum
    assert(rawDiskBytes > 2048,
      s"fixture too small: dim on-disk $rawDiskBytes <= threshold")
    assert(joinPlan(planStats = true).contains("BroadcastHashJoin"),
      "manifest row counts must qualify the dim for broadcast")
    assert(!joinPlan(planStats = false).contains("BroadcastHashJoin"),
      "size-only estimation (file bytes) must NOT broadcast here — " +
        "proves the broadcast above came from manifest stats")
  }

  test("SQL doorway (CREATE TABLE) relations carry manifest stats too") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stats4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      (1L to 80L).map(i => (i, s"u${i % 5}")).toDF("id", "tag"),
      overwrite = false)
    spark.sql("CREATE TABLE snap_stats_sql USING " +
      s"`graft.sources.SnapshotSourceProvider` OPTIONS (path '$t')")
    try {
      val stats = spark.sql("SELECT * FROM snap_stats_sql")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(80)),
        s"SQL-doorway rowCount ${stats.rowCount} != 80 — the optimizer " +
          "rule did not attach manifest stats")
      val tag = stats.attributeStats.toSeq
        .collectFirst { case (a, st) if a.name == "tag" => st }.get
      assert(tag.distinctCount.contains(BigInt(5)))
    } finally spark.sql("DROP TABLE snap_stats_sql")
  }

  test("subset reads (compact/dels) stay size-only: no oversold NDV") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stats3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      (1L to 50L).map(i => (i, i * 2L)).toDF("k", "v"), overwrite = false)
    SnapshotTable.deleteWhere(spark, t, col("k") <= 10L)
    // the MOR read is scan MINUS anti-join; its leaf keeps exact
    // rowCount (base files), and the visible row count is still right
    val live = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(live.count() == 40L)
  }
}
