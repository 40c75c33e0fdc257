package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming specs driven by MemoryStream with explicit watermark
  * advancement — verifies window aggregation and stateful session close.
  */
class StreamingOpsSpec extends GraftSpec {
  import StreamingOps._

  // offset from a nonzero base: rows exactly at the initial watermark
  // (epoch 0) would be dropped as late before reaching the state function
  private val base = 1008000L // hour-aligned (700 days in minutes)
  private def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)

  test("tumbling window agg over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts(1), 7, "click", 1.0), Ev(2, ts(5), 7, "click", 2.0),
      Ev(3, ts(65), 7, "view", 3.0), Ev(4, ts(62), 8, "click", 4.0))
    val q = tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime / 60000 - base, r.getAs[String]("event_type"), r.getAs[Long]("n")))
        .toSet
      assert(rows == Set((0L, "click", 2L), (60L, "view", 1L), (60L, "click", 1L)))
    } finally q.stop()
  }

  test("stateful sessions close after the inactivity gap passes the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = statefulSessions(spark, mem.toDS(), gapMs = 10 * 60000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // session A: 2 events within gap; then a far-future event moves the
      // watermark (2h delay) past A's timeout -> A closes
      mem.addData(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(5), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(3, ts(300), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts(600), 99, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms") / 60000 - base,
          r.getAs[Long]("end_ms") / 60000 - base, r.getAs[Int]("n_events"))).toSet
      assert(rows.contains((7L, 0L, 5L, 2)))
    } finally q.stop()
  }
}
