package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AnalyticsOps.eventsWinsorized]] clipping semantics and
  * [[AnalyticsOps.eventsDowProfile]] grid accounting on planted events. */
class WinsorDowSpec extends GraftSpec {

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("winsorized: outliers clamp to the exact percentile band") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wz-").toString
    // 21 values 0..20: p05 = 1.0, p95 = 19.0 (exact interpolation on
    // 0..20 at rank 0.05*20 / 0.95*20); value 0 clips up, 20 clips down
    writeEvents(dir, (0 to 20).map(i =>
      (i.toLong + 1, f"2024-01-01 10:${i}%02d:00", 1L, "x", i.toDouble)))
    val r = AnalyticsOps.eventsWinsorized(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Long]("n_clipped_lo") == 1L)
    assert(r.getAs[Long]("n_clipped_hi") == 1L)
    assert(r.getAs[Long]("p05_micro") == 1000000L)
    assert(r.getAs[Long]("p95_micro") == 19000000L)
    // winsorized mean: (1 + 1..19 sum + 19)/21 = (1+190+19)/21 = 10.0
    assert(r.getAs[Long]("winsorized_mean_micro") == 10000000L)
  }

  test("dow profile: correct grid cells and exact shares") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dw-").toString
    // 2024-01-01 is a Monday (Spark dayofweek = 2); 2024-01-07 a Sunday (1)
    writeEvents(dir, Seq(
      (1L, "2024-01-01 05:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 05:30:00", 1L, "a", 1.0),
      (3L, "2024-01-07 23:00:00", 1L, "a", 1.0),
      (4L, "2024-01-08 05:00:00", 1L, "a", 1.0))) // next Monday, same hour
    val got = AnalyticsOps.eventsDowProfile(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 23L, 1L, 250000L),
      (2L, 5L, 3L, 750000L)))
  }
}
