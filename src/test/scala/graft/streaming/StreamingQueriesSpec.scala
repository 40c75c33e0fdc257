package graft.streaming

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

/** The declared streaming CORRECTNESS queries: a finite `availableNow`
  * backfill through the full streaming pipeline (file source → watermark
  * → stateful agg → sink) must reproduce the batch relation exactly.
  */
class StreamingQueriesSpec extends GraftSpec {

  test("stream_tumbling equals the batch q23 relation") {
    val streamed = StreamingQueries.streamTumbling(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    val batch = graft.operators.Relational.q23EventsTumbling(spark, sfDir)
      .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
      .collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("stream_sliding lands every event in exactly 4 windows") {
    val got = StreamingQueries.streamSliding(spark, sfDir).collect()
    assert(got.nonEmpty)
    val totalN = got.map(_.getLong(2)).sum
    assert(totalN === 4L * Tables.events(spark, sfDir).count())
  }

  test("stream_fmgws_session matches an independent batch lag/gap sessionization") {
    import org.apache.spark.sql.expressions.Window
    val got = StreamingQueries.streamFmgwsSession(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(got.nonEmpty)
    // batch twin of the stateful sessionizer's rule: ms-truncated times,
    // a gap STRICTLY greater than 30 min starts a new session
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 1000").as("t"))
      .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
      .withColumn("sid", sum(when(col("gap").isNull || col("gap") > 1800000L, 1)
        .otherwise(0)).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("start_ms"), max(col("t")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))
      .collect().toSeq.map(_.toSeq)
    assert(got === batch)
  }

  test("stream_session partitions every event into exactly one session") {
    val got = StreamingQueries.streamSession(spark, sfDir).collect()
    assert(got.nonEmpty)
    val nEvents = got.map(_.getLong(3)).sum
    assert(nEvents === Tables.events(spark, sfDir).count())
    // session windows are disjoint per user and gap-closed: start <= end
    got.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(!r.getTimestamp(0).after(r.getTimestamp(1)))
    }
  }
}
