package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AnalyticsOps.graphKhop]] minimum-hop semantics,
  * [[AnalyticsOps.eventsTimeweighted]] duration weighting, and
  * [[AnalyticsOps.qualityBenford]] digit accounting on planted data. */
class KhopBenfordSpec extends GraftSpec {

  test("khop: min-distance levels, no revisits, unreachable excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kh-").toString
    // seed supplier 7 (s_suppkey % 7 == 0). Supply pairs:
    //   s7-p1, s7-p2, s1-p1, s3-p9 ; s3/p9 unreachable from s7 within 3?
    //   hop1: parts of s7 -> p1, p2 ; hop2: suppliers of p1/p2 -> s1 ;
    //   hop3: parts of s1 -> (p1 only, already seen) -> empty
    //   s3, p9 never reached.
    Seq((7, 1), (7, 2), (1, 1), (3, 9))
      .toDF("l_suppkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1, 3, 7).toDF("s_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = AnalyticsOps.graphKhop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // node ids: supplier k -> 2k, part k -> 2k+1
    assert(got == Seq(
      (0L, 1L, 14L, 14L),          // seed s7
      (1L, 2L, 3L, 5L),            // p1(3), p2(5)
      (2L, 1L, 2L, 2L)))           // s1(2); hop 3 empty -> no row
  }

  test("timeweighted: holding-time weights, last event dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tw-").toString
    // u1: value 1.00 held 10s, then 3.00 held 30s, then 9.99 (no lead)
    //   twa = (100*10 + 300*30) / 40 = 250 cents -> 25000 centicents
    Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:00:10", 1L, "a", 3.0),
      (3L, "2024-01-01 10:00:40", 1L, "a", 9.99))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsTimeweighted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 2L, 40L, 25000L)))
  }

  test("benford: leading digit of cents, exact shares, deviation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bf-").toString
    // cents: 100->1, 25->2, 2999->2, 999->9 ; zero/negative excluded
    Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 10:01:00", 1L, "a", 0.25),
      (3L, "2024-01-01 10:02:00", 2L, "a", 29.99),
      (4L, "2024-01-01 10:03:00", 2L, "a", 9.99),
      (5L, "2024-01-01 10:04:00", 3L, "a", -5.0),
      (6L, "2024-01-01 10:05:00", 3L, "a", 0.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.qualityBenford(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    // digit 1: 1/4 = 250000 micro (dev |250000-301030| = 51030)
    // digit 2: 2/4 = 500000 (dev 323909) ; digit 9: 1/4 (dev 204243)
    assert(got == Seq(
      (1L, 1L, 250000L, 51030L),
      (2L, 2L, 500000L, 323909L),
      (9L, 1L, 250000L, 204243L)))
  }
}
