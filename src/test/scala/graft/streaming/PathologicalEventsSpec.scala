package graft.streaming

import graft.{GraftSpec, SparkEntry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The streaming twin of `PathologicalContentSpec`: every declared
  * stream_* query must survive the event rows a production feed is
  * guaranteed to deliver — null event time, null user/type keys, NaN and
  * null measure values, and a decades-old timestamp — under the declared
  * ingress contract:
  *
  *   - an UNTIMED row (null ts) is dropped by every watermark-driven
  *     operator: it has no place on the watermark timeline, would pool
  *     under a state key no watermark ever closes, and NPEs the typed
  *     sessionization's per-group sort;
  *   - a null GROUP key (event_type) is a legitimate SQL group and
  *     survives the windowed aggregations (the sentinel scrub is
  *     null-safe);
  *   - sessionization requires an identity: null-user rows produce no
  *     session (and must not kill the typed encoder);
  *   - NaN/Inf measure values enter windowed sums as NULL — one corrupt
  *     reading must not poison its window's aggregate — while pass-through
  *     operators (dedup) echo the user's raw rows faithfully;
  *   - an ancient-but-valid timestamp is real data: it lands in its own
  *     window/session and is emitted, not silently lost.
  */
class PathologicalEventsSpec extends GraftSpec {

  private lazy val (pathoDir, baseCount, maxNs) = {
    // `events.ts` is parquet TIMESTAMP(NANOS) in some fixture generations
    // (read as epoch-nanos long under the legacy conf) and a plain
    // microsecond timestamp in others — mirror Tables.events' dual
    // contract: normalize max-ts to epoch-nanos, plant rows as nanos
    // longs, and convert them to whatever type the source declares.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsType = raw.schema("ts").dataType
    val tsIsLong = tsType == org.apache.spark.sql.types.LongType
    val mx =
      if (tsIsLong) raw.agg(max(col("ts"))).head().getLong(0)
      else raw.agg(max(unix_micros(col("ts").cast("timestamp"))))
        .head().getLong(0) * 1000L
    val n = raw.count()
    // (event_id, ts_ns, user_id, event_type, value, props). The ancient
    // event sits at 1970-01-02, NOT the epoch itself: a fresh streaming
    // query's initial watermark is epoch-0 ms and stateful dedup treats
    // rows at/before the watermark as late — an event time at/before
    // 1970-01-01T00:00:00 is degenerate under Spark's event-time model.
    val day2Ns = 86400L * 1000000000L
    val planted = Seq(
      Row(9000001L, null, 7L, "click", 1.0, null),              // untimed
      Row(9000002L, day2Ns, 9001L, "click", 2.0, null),         // 1970 event
      Row(9000003L, mx, null, "click", 3.0, null),              // no identity
      Row(9000004L, mx, 9002L, null, 4.0, null),                // null group key
      Row(9000005L, mx, 9003L, "purchase", Double.NaN, null),   // corrupt measure
      Row(9000006L, mx, 9004L, "purchase", null, null),         // missing measure
      Row(9000007L, mx - 1800L * 1000000000L, null, "purchase", 5.0, null))
    val dir = java.nio.file.Files.createTempDirectory("graft-patho-ev-").toString
    val longTsSchema = org.apache.spark.sql.types.StructType(raw.schema.map(f =>
      if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType)
      else f))
    val plantedRaw = spark.createDataFrame(
      spark.sparkContext.parallelize(planted), longTsSchema)
    val plantedDf =
      if (tsIsLong) plantedRaw
      // session tz is UTC, so the timestamp → NTZ cast preserves the instant
      else plantedRaw.withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast(tsType))
    raw.unionByName(plantedDf)
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    (dir, n, mx)
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, pathoDir).collect().toSeq

  test("windowed aggs: untimed rows dropped, null group kept, NaN can't poison a sum") {
    graft.CacheRegistry.clear(spark)
    val tumbling = run("stream_tumbling")
    // computed float stats carry no NaN/Inf anywhere
    tumbling.foreach { r =>
      if (!r.isNullAt(3)) {
        val v = r.getDouble(3)
        assert(!v.isNaN && !v.isInfinite, s"poisoned sum_value: $r")
      }
    }
    // exactly the timed rows are aggregated: base + 6 planted valid-ts
    assert(tumbling.map(_.getLong(2)).sum == baseCount + 6)
    // the 1970 event has its own window, emitted not lost
    val ancient = tumbling.filter(_.getAs[java.sql.Timestamp]("hour").getTime == 86400000L)
    assert(ancient.map(_.getLong(2)).sum == 1L, s"1970 window: $ancient")
    // the null event_type group survives the (null-safe) sentinel scrub
    assert(tumbling.count(_.isNullAt(1)) == 1)
    val sliding = run("stream_sliding")
    // 1-hour windows every 15 min: the ancient event lands in exactly 4
    assert(sliding.count(r => !r.isNullAt(1) && r.getString(1) == "click" &&
      r.getAs[java.sql.Timestamp]("w_start").getTime <= 86400000L) == 4)
  }

  test("stream-static enrichment: typed+timed rows join, NaN never counts above-mean") {
    val enriched = run("stream_enrich_abovemean")
    // inner enrichment join drops null-type rows; untimed rows drop at
    // ingress — everything else (NaN/null measures included) is counted
    assert(enriched.map(_.getLong(2)).sum == baseCount + 5)
    // a corrupt measure can never satisfy the exact rational mean test
    enriched.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
    // the batch twin of the same exact-rational test agrees cell-by-cell
    val stream = enriched.map(r =>
      (r.get(0), r.get(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val finite = col("value").isNotNull && !isnan(col("value")) &&
      abs(col("value")) < lit(Double.PositiveInfinity)
    val ev = graft.Tables.events(spark, pathoDir)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
    val stats = ev.groupBy(col("event_type"))
      .agg(sum(when(finite, 1L).otherwise(0L)).as("m_cnt"),
        coalesce(sum(when(finite,
          expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L)).as("m_sum"))
    val batch = ev
      .withColumn("x_c", when(finite, expr("CAST(round(value * 100) AS BIGINT)")))
      .join(stats, Seq("event_type"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x_c") * col("m_cnt") > col("m_sum"), 1L).otherwise(0L))
          .as("n_above"))
      .collect()
      .map(r => (r.get(0), r.get(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(stream === batch)
  }

  test("chained dedup+windows equals the single-operator windowed agg") {
    // the chain's dedup leg must make the union-doubling invisible: on
    // ANY corpus (pathological rows included) its output is exactly the
    // plain tumbling aggregation's
    val chained = run("stream_dedup_windows")
      .map(r => (r.get(0), r.get(1)) -> ((r.get(2), r.get(3)))).toMap
    val plain = run("stream_tumbling")
      .map(r => (r.get(0), r.get(1)) -> ((r.get(2), r.get(3)))).toMap
    assert(chained === plain)
  }

  test("sessionization: no session without identity or time; ancient session emitted") {
    val sess = run("stream_session")
    assert(sess.forall(!_.isNullAt(2)), "null-user session leaked")
    assert(sess.count(_.getLong(2) == 9001L) == 1, "1970 session missing")
    val fmgws = run("stream_fmgws_session")
    assert(fmgws.forall(!_.isNullAt(0)), "typed path emitted a null user")
    val ancient = fmgws.filter(_.getLong(0) == 9001L)
    assert(ancient.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      == Seq((86400000L, 86400000L, 1L)), s"1970 stateful session: $ancient")
  }

  test("a corpus with rows but no timed rows backfills to the empty relation") {
    // non-empty events whose ts values are ALL null: the sentinel stage
    // has no max ts to offset — it must stage without a sentinel (not
    // NPE on the null max) and the ingress filter yields zero windows
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val allNull = Seq(Row(1L, null, 7L, "click", 1.0, null),
      Row(2L, null, 8L, "view", 2.0, null))
    val dir = java.nio.file.Files.createTempDirectory("graft-nullts-ev-").toString
    spark.createDataFrame(spark.sparkContext.parallelize(allNull), raw.schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(SparkEntry.queries("stream_tumbling")(spark, dir).count() == 0L)
    assert(SparkEntry.queries("stream_dedup")(spark, dir).count() == 0L)
    graft.CacheRegistry.clear(spark)
  }

  test("dedup echoes identified rows faithfully; join never matches a null key") {
    val dedup = run("stream_dedup")
    val ids = dedup.map(_.getLong(0)).toSet
    assert(!ids.contains(9000001L), "untimed row survived dedup")
    assert(Set(9000002L, 9000003L, 9000004L, 9000005L, 9000006L, 9000007L)
      .subsetOf(ids), "a timed planted row was lost by dedup")
    // raw passthrough: the corrupt measure is the user's data, echoed as-is
    assert(dedup.find(_.getLong(0) == 9000005L).get.getDouble(4).isNaN)
    val joined = run("stream_join")
    assert(joined.forall(!_.isNullAt(1)), "null-user join row")
    assert(!joined.exists(_.getLong(0) == 9000007L),
      "null-user purchase matched a click")
    graft.CacheRegistry.clear(spark)
  }
}
