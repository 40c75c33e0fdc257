package graft.operators

import graft.GraftSpec
import graft.mapreduce.SubmitMain

/** Behavioral checks for the advanced operators on constructed data where
  * the expected as-of matches are known by hand.
  */
class AdvancedOpsSpec extends GraftSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ev-").toString
    rows.toDF("event_id", "ts_min", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(CAST(ts_min * 60000000 AS BIGINT))"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("as-of join picks the latest click at or before each purchase") {
    val d = writeEvents(Seq(
      (1L, 10L, 7L, "click", 0.0),
      (2L, 20L, 7L, "click", 0.0),
      (3L, 25L, 7L, "purchase", 5.0),   // matches click 2 (t=20)
      (4L, 20L, 8L, "purchase", 5.0),   // user 8: no click before -> dropped
      (5L, 30L, 8L, "click", 0.0),
      (6L, 30L, 8L, "purchase", 9.0),   // same-ts click matches (>= semantics)
      (7L, 40L, 9L, "purchase", 1.0)))  // user 9: no clicks at all -> dropped
    val rows = AdvancedOps.q26AsofJoin(spark, d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("click_id"), r.getAs[Long]("gap_us")))
    assert(rows.toSet == Set(
      (3L, 2L, 5L * 60000000L),
      (6L, 5L, 0L)))
  }

  test("percentiles/grouping-sets/pivot/approx run and keep invariants") {
    val p = AdvancedOps.q27Percentiles(spark, sfDir).collect()
    p.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("iqr") >= 0.0)
    }
    val g = AdvancedOps.q28GroupingSets(spark, sfDir).collect()
    val grand = g.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val pv = AdvancedOps.q29Pivot(spark, sfDir).collect()
    assert(pv.nonEmpty)
    val ad = AdvancedOps.q30ApproxDistinct(spark, sfDir).collect()
    ad.foreach(r => assert(r.getAs[Boolean]("within_bound")))
  }

  test("SubmitMain parses reference-default job specs FIFO") {
    val jobs = SubmitMain.parseArgs(Array(
      "--nmappers", "2", "--nreducers", "2",
      "--input", "/a", "--output", "/b",
      "--mapper", "cat", "--input", "/c", "--output", "/d"))
    assert(jobs.length == 2)
    assert(jobs(0).numMappers == 2 && jobs(0).inputDir == "/a" && jobs(0).outputDir == "/b")
    assert(jobs(1).mapperCmd == Seq("sh", "-c", "cat") && jobs(1).inputDir == "/c")
  }
}
