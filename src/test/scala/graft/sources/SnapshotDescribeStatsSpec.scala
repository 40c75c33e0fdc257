package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** `GRAFT DESCRIBE STATS` / [[SnapshotTable.plannerStats]]: the SQL
  * doorway for inspecting exactly the catalog statistics the planner
  * consumes — NDV, nulls, avg width, min/max — without reading
  * manifests by hand. */
class SnapshotDescribeStatsSpec extends GraftSpec {

  test("plannerStats mirrors the catalog view, including date/timestamp bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dstats-").toString
    val t = s"$dir/tbl"
    val src = spark.range(0, 120)
      .select(col("id"),
        when(col("id") % 12 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("tag"), (col("id") % 5).cast("string")))
          .as("tag"),
        date_add(lit(java.sql.Date.valueOf("2024-03-01")),
          (col("id") % 30).cast("int")).as("d"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val ps = SnapshotTable.plannerStats(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ps.keySet == Set("id", "tag", "d"))
    assert(ps("id").getLong(2) == 120L, "row_count")
    assert(ps("id").getString(6) == "0" && ps("id").getString(7) == "119",
      s"id bounds ${ps("id")}")
    assert(ps("tag").getLong(4) == 10L, "tag null_count")
    assert(ps("tag").getLong(3) == 5L, "tag NDV (exact below K)")
    assert(ps("tag").getLong(5) == 4L, "tag avg_len (tagN = 4 bytes)")
    // string min/max are not plan stats — null by design
    assert(ps("tag").isNullAt(6) && ps("tag").isNullAt(7))
    // date bounds render in the catalog's external (ISO) form
    assert(ps("d").getString(6) == "2024-03-01" &&
      ps("d").getString(7) == "2024-03-30", s"date bounds ${ps("d")}")
  }

  test("the GRAFT DESCRIBE STATS verb serves it through SQL, per version") {
    val base = spark // materialize the shared session first
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-describe-stats")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base)
      val dir = java.nio.file.Files.createTempDirectory("graft-dstats2-")
        .toString
      val t = s"$dir/tbl"
      SnapshotTable.commit(s2, t,
        s2.range(0, 50).select(col("id"), (col("id") % 3).as("k")),
        overwrite = false)
      Thread.sleep(5) // distinct commit stamps for the wall-clock probe
      SnapshotTable.commit(s2, t,
        s2.range(50, 200).select(col("id"), (col("id") % 3).as("k")),
        overwrite = false)
      val latest = s2.sql(s"GRAFT DESCRIBE STATS '$t'").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(latest("id").getLong(2) == 200L)
      assert(latest("id").getString(6) == "0" &&
        latest("id").getString(7) == "199")
      val v1 = s2.sql(s"GRAFT DESCRIBE STATS '$t' VERSION AS OF 1")
        .collect().map(r => r.getString(0) -> r).toMap
      assert(v1("id").getLong(2) == 50L && v1("id").getString(7) == "49",
        "VERSION AS OF must serve that version's stats")
      // wall-clock addressing: v1's own commit stamp resolves to v1
      val ts1 = s2.sql(s"GRAFT HISTORY '$t'").collect()
        .find(_.getInt(0) == 1).get.getLong(8)
      val byTs = s2.sql(s"GRAFT DESCRIBE STATS '$t' TIMESTAMP AS OF '$ts1'")
        .collect().map(r => r.getString(0) -> r).toMap
      assert(byTs("id").getLong(2) == 50L,
        "TIMESTAMP AS OF must resolve to the version at that stamp")
      // partition evolution in pure SQL: one verb, layout changed,
      // rows preserved, old version still flat under time travel
      val v3 = s2.sql(s"GRAFT RELAYOUT '$t' PARTITION BY (k) " +
        "BUCKET BY (4, id)").head().getInt(0)
      assert(v3 == 3)
      val after = SnapshotTable.readAsOf(s2, t, v3)
      assert(after.count() == 200L)
      assert(after.inputFiles.exists(_.contains("/k=")),
        "relayout verb must have produced hive directories")
      assert(!SnapshotTable.readAsOf(s2, t, 2).inputFiles
        .exists(_.contains("/k=")), "old version must stay flat")
      // pure-SQL per-bucket OPTIMIZE: the fresh relayout is already one
      // file per bucket -> documented NULL no-op; fragment a bucket
      // with an append and the verb packs it
      assert(s2.sql(s"GRAFT OPTIMIZE '$t' BUCKETS").head().isNullAt(0))
      SnapshotTable.commitPartitionedBucketed(s2, t,
        s2.range(200, 260).select(col("id"), (col("id") % 3).as("k")),
        partitionBy = Seq("k"), nBuckets = 4, bucketCol = "id")
      val vPacked = s2.sql(s"GRAFT OPTIMIZE '$t' BUCKETS").head()
      assert(!vPacked.isNullAt(0), "fragmented buckets must pack")
      assert(SnapshotTable.readAsOf(s2, t, vPacked.getInt(0)).count() == 260L)
      // back to flat, no clauses
      val v4 = s2.sql(s"GRAFT RELAYOUT '$t'").head().getInt(0)
      assert(SnapshotTable.readAsOf(s2, t, v4).count() == 260L)
    } finally {
      // the fresh session shares the JVM-wide SparkContext — restore
      // the shared session, never stop()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
