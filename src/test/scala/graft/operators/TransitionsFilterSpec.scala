package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AnalyticsOps.eventsTransitions]] adjacency semantics and
  * [[AdvancedOps.q46FilterAggs]] filtered/distinct/median aggregates on
  * planted events. */
class TransitionsFilterSpec extends GraftSpec {

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("transitions: per-user adjacency only, exact integer probabilities") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tr-").toString
    // u1: a->b->a ; u2: a->c ; u3: single event (no transition)
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 1.0),
      (3L, "2024-01-01 10:02:00", 1L, "a", 1.0),
      (4L, "2024-01-01 10:00:00", 2L, "a", 1.0),
      (5L, "2024-01-01 10:05:00", 2L, "c", 1.0),
      (6L, "2024-01-01 10:00:00", 3L, "b", 1.0)))
    val got = AnalyticsOps.eventsTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // from a: a->b (1), a->c (1) each 50%; from b: b->a (1) 100%
    assert(got == Seq(
      ("a", "b", 1L, 500000L), ("a", "c", 1L, 500000L),
      ("b", "a", 1L, 1000000L)))
  }

  test("filter aggs: conditional counts, distinct-filter, median interpolation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fa-").toString
    // type x: values 10, 60, 70 by users 1,1,2 -> n_high=2 (users {1,2}),
    //   median 60.00
    // type y: values 20, 40 -> n_high=0, median interpolates to 30.00
    writeEvents(dir, Seq(
      (1L, "2024-01-01 10:00:00", 1L, "x", 10.0),
      (2L, "2024-01-01 10:01:00", 1L, "x", 60.0),
      (3L, "2024-01-01 10:02:00", 2L, "x", 70.0),
      (4L, "2024-01-01 10:03:00", 3L, "y", 20.0),
      (5L, "2024-01-01 10:04:00", 4L, "y", 40.0)))
    val got = AdvancedOps.q46FilterAggs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("x", 3L, 2L, 2L, 2L, 6000L),
      ("y", 2L, 0L, 2L, 0L, 3000L)))
  }
}
