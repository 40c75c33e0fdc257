package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property test for the flush-sentinel backfill device
  * ([[StreamingQueries]]): on RANDOM event sets — bursty ts clustering,
  * empty partitions, exact window/gap-boundary ties, duplicate
  * timestamps — the full streaming path (staged files + sentinel →
  * watermark → stateful agg → exactly-once parquet sink → filtered
  * read-back) must equal the plain batch aggregate of the same input:
  * no trailing window withheld, none duplicated, no sentinel
  * contamination. The declared queries prove this only on the fixed
  * fixture; this pins the device itself.
  *
  * Values are quarter-integers so double sums are exact in binary and
  * the comparison is order-independent.
  */
class SentinelBackfillPropertySpec extends GraftSpec {
  import spark.implicits._

  // epoch-hour-aligned base so generated boundary ties are exact
  private val baseMs = 1735689600000L // 2025-01-01 00:00:00 UTC

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  /** Random event set: a few bursts at random hours (clustered), a thin
    * scatter across the span, rows EXACTLY on hour boundaries and
    * 30-minute-gap boundaries, plus duplicated timestamps. */
  private def genEvents(rnd: scala.util.Random, n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double)] = {
    val types = Seq("click", "view", "buy")
    val spanH = 1 + rnd.nextInt(48)
    val bursts = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(spanH))
    (0 until n).map { i =>
      val ms = rnd.nextInt(4) match {
        case 0 => // burst: tight cluster inside one hour
          val h = bursts(rnd.nextInt(bursts.length))
          baseMs + h * 3600000L + rnd.nextInt(600000)
        case 1 => // scatter
          baseMs + rnd.nextLong(spanH * 3600000L)
        case 2 => // exact hour boundary (window-assignment tie)
          baseMs + rnd.nextInt(spanH) * 3600000L
        case _ => // exact 30-min lattice (session-gap tie)
          baseMs + rnd.nextInt(spanH * 2) * 1800000L
      }
      // duplicate ts pairs: every third row reuses its neighbor's slot
      val ms2 = if (i % 3 == 0 && i > 0) ms - (ms % 60000L) else ms
      (i.toLong, ts(ms2), rnd.nextInt(5).toLong,
        types(rnd.nextInt(types.length)), rnd.nextInt(40) * 0.25)
    }
  }

  /** events.parquet layout matching the sf fixtures; over-partitioned so
    * some part files are empty. */
  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-evprop-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(5)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("tumbling backfill == batch window aggregate on random event sets") {
    for (seed <- Seq(11, 23, 58)) {
      val rnd = new scala.util.Random(seed)
      val d = writeEvents(genEvents(rnd, 40 + rnd.nextInt(160)))
      val got = StreamingQueries.streamTumbling(spark, d)
      val want = spark.read.parquet(s"$d/events.parquet")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("sum_value"))
      assert(sorted(got) === sorted(want), s"seed $seed")
      graft.CacheRegistry.clear(spark)
    }
  }

  test("session backfill == batch session_window aggregate (gap ties)") {
    for (seed <- Seq(5, 91)) {
      val rnd = new scala.util.Random(seed)
      val d = writeEvents(genEvents(rnd, 40 + rnd.nextInt(120)))
      val got = StreamingQueries.streamSession(spark, d)
      val want = spark.read.parquet(s"$d/events.parquet")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"), col("user_id"),
          col("n_events"))
      assert(sorted(got) === sorted(want), s"seed $seed")
      graft.CacheRegistry.clear(spark)
    }
  }

  test("a TIMESTAMP_NTZ events corpus (DuckDB/pandas-written) backfills correctly") {
    val rnd = new scala.util.Random(77)
    val rows = genEvents(rnd, 80)
    val dir = java.nio.file.Files.createTempDirectory("graft-evntz-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamingQueries.streamTumbling(spark, dir)
    val want = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
    assert(sorted(got) === sorted(want))
    graft.CacheRegistry.clear(spark)
  }

  test("degenerate inputs: single row, and all rows on one instant") {
    for (rows <- Seq(
      Seq((0L, ts(baseMs), 1L, "click", 1.0)),
      (0 until 7).map(i => (i.toLong, ts(baseMs + 3600000L), 2L, "view", 0.5)))) {
      val d = writeEvents(rows)
      val got = StreamingQueries.streamTumbling(spark, d)
      val want = spark.read.parquet(s"$d/events.parquet")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("sum_value"))
      assert(sorted(got) === sorted(want))
      graft.CacheRegistry.clear(spark)
    }
  }
}
