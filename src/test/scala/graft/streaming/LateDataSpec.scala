package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics: rows arriving later than the watermark delay are
  * dropped from windowed state (the contract that bounds state at scale).
  */
class LateDataSpec extends GraftSpec {
  import StreamingOps._

  private val base = 1008000L
  private def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)

  test("rows older than the watermark are dropped from append-mode windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("late_windows")
      .outputMode(OutputMode.Append()).start()
    try {
      // watermark delay is 2h; push event time far ahead so the first
      // hour's window closes, then send a straggler into that old window
      mem.addData(Ev(1, ts(10), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, ts(300), 7, "click", 1.0)) // advances watermark past hour 0
      q.processAllAvailable()
      mem.addData(Ev(3, ts(20), 7, "click", 99.0)) // late: hour-0 window, dropped
      q.processAllAvailable()
      mem.addData(Ev(4, ts(600), 7, "click", 1.0)) // closes hour-5 window too
      q.processAllAvailable()
      val rows = spark.table("late_windows").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime / 60000 - base,
          r.getAs[Long]("n"))).toMap
      // hour 0 emitted with ONE event: the late row never joined it
      assert(rows.get(0L).contains(1L), rows.toString)
    } finally q.stop()
  }
}
