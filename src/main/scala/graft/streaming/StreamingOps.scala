package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is batch-only (SURVEY.md §2.3 "Streaming: absent") — this
  * is new capability: the streaming twins of the batch q23 (tumbling
  * window) and q24 (sessionization) queries, built so the same transform
  * runs on `readStream` sources with watermark-driven state eviction.
  * State is keyed by (window × type) / user — partitioned across
  * executors, no driver state, which is what lets it run against an
  * unbounded 100 TB/day feed.
  */
object StreamingOps {

  /** Event-time ingress gate shared by every watermark-driven operator: a
    * row with NULL event time has no place on the watermark timeline — it
    * would pool under a NULL window/state key that no watermark ever
    * closes (in Append mode it is withheld forever: a state LEAK on an
    * unbounded feed) and it NPEs the typed sessionization's per-group
    * sort. Such rows are dropped at ingress — the contract every
    * event-time engine applies to null-timestamp records. */
  private def eventTimed(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.filter(col(tsCol).isNotNull)

  /** NaN/Inf measure values enter windowed sums as NULL (ignored): one
    * corrupt reading would otherwise poison its whole window's aggregate
    * — the same silent-NaN hazard the similarity kernels guard against
    * (NaN also ORDERS above every real value in Spark SQL, so a poisoned
    * sum would top every ranking built on it). */
  private def finiteOrNull(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c) || c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), lit(null)).otherwise(c)

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark:
    * late rows beyond the watermark are dropped, state is bounded. */
  def tumblingAgg(events: DataFrame): DataFrame =
    eventTimed(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(finiteOrNull(col("value"))), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming KMV distinct-user estimate per 1-hour window: the
    * md5-derived 60-bit user hash feeds the bounded
    * [[graft.functions.KmvDistinctAgg]] bottom-K sketch — AT MOST 64
    * longs of state per open window, where a watermarked
    * `approx_count_distinct`-free exact count would hold every distinct
    * user. This is how an unbounded feed serves "distinct users per
    * hour" at 100 TB: per-partition sketches partial-aggregate
    * map-side, the state store merges K-long buffers, and the emitted
    * estimate is DETERMINISTIC (order-insensitive min-K), so the oracle
    * recomputes it exactly from the batch table.
    *
    * Non-domain rows (NULL users, the backfill's flush sentinel matched
    * by `domain=false`) are NOT filtered out — a filter here gets
    * pushed BELOW the EventTimeWatermark node, so the sentinel would
    * never be seen by the watermark and the final windows would never
    * drain (observed: the last 3 hours missing). Instead they map to
    * the sketch's reserved [[graft.functions.KmvDistinctAgg.Skip]]
    * marker and to a zero `n_events` contribution; windows with no
    * domain rows are dropped after the aggregate. */
  def kmvDistinctAgg(events: DataFrame, domain: org.apache.spark.sql.Column)
      : DataFrame = {
    val kmv = udaf(graft.functions.KmvDistinctAgg)
    val keep = domain && col("user_id").isNotNull
    eventTimed(events)
      .withWatermark("ts", "2 hours")
      .select(col("ts"),
        when(keep, expr(
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), " +
            "16, 10) AS BIGINT)"))
          .otherwise(lit(graft.functions.KmvDistinctAgg.Skip)).as("h"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(when(col("h") =!= graft.functions.KmvDistinctAgg.Skip, 1))
          .as("n_events"),
        round(kmv(col("h")), 4).as("est_distinct"))
      .select(col("window.start").as("hour"), col("n_events"),
        col("est_distinct"))
      .filter(col("n_events") > 0)
  }

  /** TWO chained stateful operators in ONE streaming query — bounded
    * dedup feeding a watermarked windowed aggregation
    * (`dropDuplicatesWithinWatermark` → window/groupBy). This is the
    * production ingest topology in one pass: an at-least-once feed is
    * deduplicated on the unique event id and the SAME query maintains
    * the hourly rollup, with no intermediate landing table, no second
    * checkpoint, no re-read. Spark 4 propagates the single upstream
    * watermark through both stateful operators (multi-stateful
    * pipelines are supported in Append mode); each holds its own
    * bounded state — one row per id inside the horizon, one row per
    * open (window, type) group. */
  def dedupThenTumbling(events: DataFrame): DataFrame =
    eventTimed(events)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(finiteOrNull(col("value"))), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** STREAM-STATIC join feeding a windowed aggregation: each streamed
    * event is enriched against a broadcast batch dimension (per-type
    * long-run moments) — a stateless join, re-planned per micro-batch —
    * and the same query then maintains the hourly above-long-run-mean
    * counts. The mean test is exact rational arithmetic
    * (`x·cnt > sum`, never a float mean), so batch and streaming agree
    * bit-for-bit. Rows whose type is absent from the dimension (null
    * types, the backfill sentinel) drop at the join — enrichment
    * requires a dimension match — but the watermark still advances:
    * event-time tracking happens at the watermark node upstream of the
    * join, so the sentinel flushes the trailing windows even though its
    * own row never reaches the aggregate. */
  def enrichAboveMean(events: DataFrame, typeStats: DataFrame): DataFrame =
    eventTimed(events)
      .withWatermark("ts", "2 hours")
      .withColumn("x_c",
        when(col("value").isNotNull && !isnan(col("value")) &&
            abs(col("value")) < lit(Double.PositiveInfinity),
          expr("CAST(round(value * 100) AS BIGINT)")))
      .join(broadcast(typeStats), Seq("event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x_c") * col("m_cnt") > col("m_sum"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("n_above"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingAgg(events: DataFrame): DataFrame =
    eventTimed(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Per-hour per-user activity counts — the streaming half of the
    * heavy-hitters serving path. State is one count per (open window,
    * active user), watermark-bounded: at 10× users the state grows 10×
    * but stays strictly inside the 2-hour horizon. The top-k RANK runs
    * batch-side over the sink table (streaming aggregations admit no
    * window functions — ranking the served table is the standard
    * lambda-architecture read path). Identity rule as sessionization:
    * a null-user row belongs to no per-user count. */
  def hourlyUserCounts(events: DataFrame): DataFrame =
    eventTimed(events)
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("user_id"), col("n"))

  /** Built-in session windows: 30-minute inactivity gap. Sessionization
    * requires an identity (same contract as [[statefulSessions]]): a
    * null-user row belongs to no session and is dropped at ingress. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    eventTimed(events)
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup — the unbounded-feed twin of
    * [[graft.operators.DedupOps.exactGroups]]: keep the first document per
    * content digest, where `dropDuplicatesWithinWatermark` holds one state
    * row per distinct digest INSIDE the watermark horizon and evicts it
    * after — bounded state on an unbounded stream, which a plain
    * `dropDuplicates` (state grows forever) cannot give at 100 TB/day.
    * Input needs an event-time `ts` column plus the payload `text`. */
  def streamingDedup(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    eventTimed(docs)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Watermarked STREAM-STREAM interval join: each purchase joined to the
    * same user's clicks from the preceding hour. Both sides carry
    * watermarks and the join condition bounds the event-time skew, so
    * Spark can evict buffered rows once the watermark passes — bounded
    * state on two unbounded feeds (an unbounded-state stream-stream join
    * is refused in Append mode). The streaming sibling of the batch
    * range join q9 / as-of family. */
  def streamStreamJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = eventTimed(purchases).filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = eventTimed(clicks).filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("p_user"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** LEFT OUTER watermarked stream-stream interval join — the outer
    * half of [[streamStreamJoin]]: every purchase emits; clicks match
    * from the preceding hour; a purchase with NO click in its window
    * emits ONCE with NULL click columns, but only after the watermark
    * PROVES no future click can match (Append-mode outer-join
    * semantics) — which is why the declared backfill feeds the staged
    * sentinel stream, unlike the inner join which emits in flight.
    * The type filters ADMIT the sentinel (event id −1) on BOTH sides:
    * Catalyst pushes filters below the watermark operator, so a filter
    * that excluded the sentinel would stop it from ever advancing the
    * watermark — and the trailing unmatched purchases would be
    * withheld forever (measured: the last watermark-delay's worth of
    * rows went missing). The sentinel's own rows are scrubbed by the
    * caller on its reserved id, the standard convention. */
  def streamStreamLeftOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = eventTimed(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("event_type").as("p_type"))
      .filter(col("p_type") === "purchase" || col("p_id") === -1L)
      .withWatermark("p_ts", "1 hour")
      .drop("p_type")
    val c = eventTimed(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("event_type").as("c_type"))
      .filter(col("c_type") === "click" || col("c_id") === -1L)
      .withWatermark("c_ts", "1 hour")
      .drop("c_type")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("p_id"), col("p_user"), col("c_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** FULL-outer stream-stream interval join — completes the outer
    * family next to [[streamStreamLeftOuter]]: matched pairs emit
    * in-flight; an unmatched PURCHASE emits with a null click side once
    * the click watermark passes its interval, an unmatched CLICK emits
    * with a null purchase side once the purchase watermark passes —
    * Spark buffers BOTH sides' state until the opposite watermark
    * clears it, so state stays bounded by the 1-hour interval plus the
    * 1-hour watermark delay per side at ANY feed volume.
    *
    * Sentinel admission, BOTH directions now (the LEFT OUTER analysis
    * doubled): each side admits its own staged sentinel (reserved id
    * −1) so both watermarks advance to the far-future flush point and
    * both unmatched buffers drain. The two sentinels carry the same
    * reserved user (−1) and instant, so they pair with EACH OTHER and
    * never with a real row; the caller's single null-safe scrub
    * `!(p_id <=> −1) && !(c_id <=> −1)` removes that pair (and any
    * stray sentinel half) while real unmatched emissions — whose ids
    * are NULL on one side — pass the null-safe inequality untouched. */
  def streamStreamFullOuter(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = eventTimed(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("event_type").as("p_type"))
      .filter(col("p_type") === "purchase" || col("p_id") === -1L)
      .withWatermark("p_ts", "1 hour")
      .drop("p_type")
    val c = eventTimed(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("event_type").as("c_type"))
      .filter(col("c_type") === "click" || col("c_id") === -1L)
      .withWatermark("c_ts", "1 hour")
      .drop("c_type")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "full_outer")
      .select(col("p_id"), col("p_user"), col("c_id"), col("c_user"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** RIGHT-outer stream-stream interval join — the last outer variant
    * Spark supports, completing inner/left/full: matched pairs emit
    * in-flight; every CLICK emits exactly once, a click no purchase
    * followed within the hour emitting with a NULL purchase side only
    * after the PURCHASE watermark proves no future purchase's
    * preceding-hour window can still reach it (Append-mode outer
    * semantics, mirrored from the left/full analysis). State stays
    * bounded by interval + watermark delay per side at any volume.
    *
    * Sentinel admission, both directions (the full-outer analysis
    * verbatim): the PURCHASE side must admit its staged sentinel
    * (reserved id −1) or the trailing unmatched clicks would be
    * withheld forever; the CLICK side admits its own so its buffered
    * state evicts too. The sentinels pair with each other (same
    * reserved user and instant) and the caller scrubs that pair
    * null-safely on both reserved ids — real unmatched clicks carry a
    * NULL p_id and pass untouched. */
  def streamStreamRightOuter(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = eventTimed(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("event_type").as("p_type"))
      .filter(col("p_type") === "purchase" || col("p_id") === -1L)
      .withWatermark("p_ts", "1 hour")
      .drop("p_type")
    val c = eventTimed(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("event_type").as("c_type"))
      .filter(col("c_type") === "click" || col("c_id") === -1L)
      .withWatermark("c_ts", "1 hour")
      .drop("c_type")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "right_outer")
      .select(col("p_id"), col("c_id"), col("c_user"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Idempotent (exactly-once) parquet sink via `foreachBatch` + dynamic
    * partition overwrite: every micro-batch writes into its own
    * `batch_id=N` partition with overwrite semantics, so a batch REPLAYED
    * after a failure (Structured Streaming's at-least-once contract for
    * foreachBatch) overwrites its own partition instead of appending
    * duplicates — the standard plain-parquet exactly-once recipe when a
    * transactional table format isn't available. The checkpoint dir makes
    * batch ids stable across restarts, which is what the idempotency
    * keys on. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, outDir: String): Unit =
    // per-writer overwrite mode (not session conf): a concurrent write on
    // the same SparkSession must never observe this writer's dynamic mode
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outDir)

  /** Start a streaming query that lands `df` into `outDir` through
    * [[writeBatchIdempotent]]. */
  def idempotentParquetSink(df: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatchIdempotent(batch.toDF(), id, outDir))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // value is a BOXED Double: sessionization never reads the measure, and
  // a feed's missing (null) value must not kill the typed encoder (a
  // primitive field throws NOT_NULL_ASSERT_VIOLATION on null)
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: java.lang.Double)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * arbitrary-state API for semantics session_window can't express
    * (e.g. emitting only on session close, custom timeout policy).
    * Event-time timeout keyed per user; state is one small struct/user.
    *
    * Input contract: `ts` and `user_id` must be non-null BEFORE the
    * `.as[Ev]` conversion — `Ev.user_id` is a primitive Long (the
    * encoder throws on null) and the per-group sort dereferences `ts`.
    * A sessionization has no meaning for an unidentified user or an
    * untimed event; the declared entry filters both at ingress. */
  def statefulSessions(spark: SparkSession, events: Dataset[Ev],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min/max keep the bounds monotone when a late row
                  // (inside the watermark, older than carried state)
                  // arrives in a later micro-batch — a bare `last = t`
                  // would move the session end BACKWARDS and reset the
                  // timeout earlier
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Input row for [[RecordHighProcessor]]: event time pre-converted to
    * epoch micros (full timestamp precision — `Timestamp.getTime` is
    * millis and would mis-order sub-ms neighbors) and the measure
    * pre-converted to micro-units by the SAME `round(value * 1e6)`
    * expression the batch queries use, so the processor never does float
    * arithmetic. */
  case class REv(ts_micro: Long, event_id: Long, user_id: Long, v_micro: Long)
  case class RecordOut(user_id: Long, n_records: Long, max_micro: Long)

  /** Per-user running record-high detection on the `transformWithState`
    * arbitrary-state API (Spark 4): ValueState holds `(count, max)` per
    * user across micro-batches; each batch folds its rows in
    * `(ts, event_id)` order and emits the user's updated totals — the
    * serving-table shape where the latest row per key is current.
    *
    * `transformWithState` is the successor to [[statefulSessions]]'s
    * flatMapGroupsWithState: typed composite state (value/list/map),
    * explicit TTL, timers — and it REQUIRES the RocksDB state store
    * provider, which is the 100 TB-scale choice anyway (state spills to
    * disk with changelog checkpointing instead of living on the JVM
    * heap). The declared entry sets the provider for the query's run.
    *
    * Determinism: rows within a group arrive unordered, so the fold
    * sorts by full-precision event time with event_id tie-break — the
    * exact ORDER BY of the oracle's window replay. */
  class RecordHighProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, REv, RecordOut] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("recordhigh",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[REv],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[RecordOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_micro, e.event_id))
      var (cnt, mx) = if (st.exists()) st.get() else (0L, Long.MinValue)
      sorted.foreach { e =>
        if (e.v_micro > mx) { mx = e.v_micro; cnt += 1 }
      }
      st.update((cnt, mx))
      Iterator.single(RecordOut(user, cnt, mx))
    }
  }

  /** The record-high pipeline over a raw events stream: ingress-filter
    * untimed/unidentified/non-finite rows (the processor's primitive
    * fields and integer fold require all four fields), convert to
    * [[REv]], run [[RecordHighProcessor]] keyed by user. */
  def recordHighs(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("value").isNotNull &&
        abs(col("value")) < lit(Double.PositiveInfinity))
      .select(expr("unix_micros(ts)").as("ts_micro"), col("event_id"),
        col("user_id"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v_micro"))
      .as[REv]
      .groupByKey(_.user_id)
      .transformWithState(new RecordHighProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
