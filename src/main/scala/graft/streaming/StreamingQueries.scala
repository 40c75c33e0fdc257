package graft.streaming

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-declared CORRECTNESS entries for the streaming surface: each
  * query runs a [[StreamingOps]] transform over the parquet `events` table
  * read AS A STREAM (file source + `availableNow` trigger — the "process
  * everything already there, then stop" mode a backfill uses), so the
  * whole streaming pipeline — source, watermark, stateful agg, sink
  * commit — is exercised and then hash-checked against a plain SQL
  * oracle, not just spec-tested.
  *
  * The memory sink + Complete mode is the verification-harness choice
  * ONLY: the result of a finite backfill must be a queryable DataFrame,
  * and Append mode would withhold the windows the final watermark never
  * closes. A production deployment writes Append to a real sink
  * (parquet/Kafka) with the watermark evicting state incrementally —
  * same transforms, unchanged.
  */
object StreamingQueries extends QueryPack {

  /** The `events` table as a stream — same TIMESTAMP(NANOS) handling as
    * [[graft.Tables.events]] (nanos read as long, converted in integer
    * arithmetic to a microsecond timestamp). */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    val batch = s.read.parquet(path) // schema probe only
    // the file stream source requires a DIRECTORY base path. When the
    // table is a directory of part files (the standard Spark write
    // layout) stream from it directly; when it is a single file (this
    // fixture's layout), stream from the parent with a leaf-name glob —
    // pathGlobFilter matches LEAF file names, so the glob form would
    // silently match nothing against a directory of part-*.parquet
    val raw =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
        s.readStream.schema(batch.schema).parquet(path)
      else
        s.readStream.schema(batch.schema)
          .option("pathGlobFilter", "events.parquet*")
          .parquet(d)
    if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Run a streaming aggregation to completion over the finite input and
    * return its final result. The memory-sink table is drained into a
    * local DataFrame and DROPPED immediately — the sink's Complete-mode
    * buffer and its catalog registration would otherwise be retained for
    * the session's lifetime, leaking one full result set per invocation
    * (the repeated-bench shape). The collect is bounded: these are
    * windowed aggregates, not the raw stream. */
  private def runAvailableNow(s: SparkSession, agg: DataFrame): DataFrame = {
    val name = "g_stream_" + java.util.UUID.randomUUID().toString.take(8)
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sink = s.table(name)
    val result = s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(sink.collect(): _*)),
      sink.schema)
    s.catalog.dropTempView(name)
    result
  }

  /** Streaming twin of q23: watermarked 1-hour tumbling windows. Produces
    * exactly q23's relation (minus the derived avg), so the oracle is the
    * same GROUP BY date_trunc. */
  def streamTumbling(s: SparkSession, d: String): DataFrame =
    runAvailableNow(s, StreamingOps.tumblingAgg(eventsStream(s, d)))
      .orderBy(col("hour"), col("event_type"))

  /** Streaming sliding windows: 1-hour windows every 15 minutes, so each
    * event lands in exactly 4 windows. Spark aligns window starts to the
    * epoch, as does the oracle's `time_bucket` — each event's 4 windows
    * are its 15-minute bucket minus k·15min for k = 0..3. */
  def streamSliding(s: SparkSession, d: String): DataFrame =
    runAvailableNow(s, StreamingOps.slidingAgg(eventsStream(s, d)))
      .orderBy(col("w_start"), col("event_type"))

  /** Streaming session windows (30-min gap). Session-window semantics:
    * an event EXTENDS a session iff its ts falls strictly inside the
    * previous window [start, last + gap) — a gap of exactly 30 minutes
    * starts a NEW session, hence the >= in the oracle's split flag
    * (unlike batch q24, whose lag-based rule used strict >). */
  def streamSession(s: SparkSession, d: String): DataFrame =
    runAvailableNow(s, StreamingOps.sessionWindowAgg(eventsStream(s, d)))
      .orderBy(col("user_id"), col("sess_start"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> streamTumbling,
    "stream_sliding" -> streamSliding,
    "stream_session" -> streamSession,
  )

  override val oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        | count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "stream_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type FROM events),
        |w AS (SELECT time_bucket(INTERVAL 15 MINUTE, t)
        |        - k * (INTERVAL 15 MINUTE) AS w_start, event_type
        |      FROM e, unnest([0, 1, 2, 3]) AS u(k))
        |SELECT w_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "stream_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |g AS (SELECT user_id, t,
        |  epoch_us(t) - epoch_us(lag(t,1) OVER (PARTITION BY user_id ORDER BY t)) AS gap
        |  FROM e),
        |f AS (SELECT user_id, t,
        |  sum(CASE WHEN gap IS NULL OR gap >= 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT min(t) AS sess_start, max(t) + INTERVAL 30 MINUTE AS sess_end,
        | user_id, count(*) AS n_events
        |FROM f GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,
  )
}
