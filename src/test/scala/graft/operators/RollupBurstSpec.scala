package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AdvancedOps.q48TimeRollup]] subtotal levels and
  * [[AnalyticsOps.eventsBurstiness]] peak accounting on fixtures. */
class RollupBurstSpec extends GraftSpec {

  test("time rollup: detail, day, month, grand subtotals with gid") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tr8-").toString
    Seq(
      (1L, 1L, "O", 10.0, "2024-01-05", "a"),
      (2L, 1L, "O", 20.0, "2024-01-05", "a"),
      (3L, 1L, "O", 30.0, "2024-02-01", "a"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ds", "o_orderpriority")
      .withColumn("o_orderdate", to_date(col("ds"))).drop("ds")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = AdvancedOps.q48TimeRollup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (-1L, -1L, -1L, 7L, 3L, 6000L),          // grand total
      (2024L, -1L, -1L, 3L, 3L, 6000L),        // year subtotal
      (2024L, 1L, -1L, 1L, 2L, 3000L),         // Jan subtotal
      (2024L, 1L, 5L, 0L, 2L, 3000L),          // Jan 5 detail
      (2024L, 2L, -1L, 1L, 1L, 3000L),         // Feb subtotal
      (2024L, 2L, 1L, 0L, 1L, 3000L)))         // Feb 1 detail
  }

  test("burstiness: peak minute, earliest tie, exact ratio") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bu-").toString
    // type x: minute 10:00 has 3 events, 10:01 has 1, 10:05 has 3 (tie
    // -> earliest peak 10:00). active=3, events=7, peak=3
    // ratio = 3*3*1e6 // 7 = 1285714
    val rows = Seq(
      (1L, "2024-01-01 10:00:01"), (2L, "2024-01-01 10:00:30"),
      (3L, "2024-01-01 10:00:59"), (4L, "2024-01-01 10:01:10"),
      (5L, "2024-01-01 10:05:00"), (6L, "2024-01-01 10:05:30"),
      (7L, "2024-01-01 10:05:59"))
      .map { case (id, t) => (id, t, 1L, "x", 1.0) }
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = AnalyticsOps.eventsBurstiness(spark, dir).collect().head
    assert(r.getAs[Long]("n_active_minutes") == 3L)
    assert(r.getAs[Long]("n_events") == 7L)
    assert(r.getAs[Long]("peak_n") == 3L)
    assert(r.getAs[java.sql.Timestamp]("peak_minute").toString
      .startsWith("2024-01-01 10:00:00"))
    assert(r.getAs[Long]("burst_ratio_micro") == 1285714L)
  }
}
