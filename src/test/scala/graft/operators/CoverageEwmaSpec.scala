package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AnalyticsOps.eventsIntervalCoverage]] island-merge semantics and
  * [[AnalyticsOps.eventsEwma]] integer-exact geometric decay on planted
  * events. */
class CoverageEwmaSpec extends GraftSpec {

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("interval coverage: overlaps merge, gaps split, exact seconds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ic-").toString
    // u1: events at 10:00, 10:02, 10:20 -> island [10:00,10:07) (merged,
    //   7 min covered) + island [10:20,10:25) (5 min) = 720 s in 2 islands,
    //   span 10:00..10:25 = 1500 s
    // u2: back-to-back boundary touch 10:00 and 10:05 -> st == prev_max
    //   merges (half-open adjacency): ONE island, 600 s covered
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:02:00", 1L, "a", 1.0),
      (3L, "2024-01-01 10:20:00", 1L, "a", 1.0),
      (4L, "2024-01-01 10:00:00", 2L, "a", 1.0),
      (5L, "2024-01-01 10:05:00", 2L, "a", 1.0)))
    val got = AnalyticsOps.eventsIntervalCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 720L, 1500L), (2L, 1L, 600L, 600L)))
  }

  test("ewma: newest value dominates, exact rational, top-8 truncation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ew-").toString
    // u1: values 1.00 then 3.00 -> num = 100*1 + 300*2 = 700, den = 3
    //   -> ewma_micro = 700*1e6 // 3 = 233333333  (closer to newest 300)
    // u2: ten events value 1.00 -> only last 8 kept: num = 100*(2^8-1),
    //   den = 2^8-1 -> exactly 100 cents -> 100000000 micro
    writeEvents(dir,
      Seq(
        (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
        (2L, "2024-01-01 10:01:00", 1L, "a", 3.0)) ++
      (1 to 10).map(i =>
        (10L + i, f"2024-01-01 11:${i}%02d:00", 2L, "a", 1.0)))
    val got = AnalyticsOps.eventsEwma(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 233333333L), (2L, 8L, 100000000L)))
  }
}
