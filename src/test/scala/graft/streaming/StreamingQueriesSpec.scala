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
