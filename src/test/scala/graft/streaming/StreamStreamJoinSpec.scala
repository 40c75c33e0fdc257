package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked stream-stream interval join: purchases match same-user
  * clicks within the preceding hour; out-of-range and cross-user clicks
  * don't match; the physical plan is the symmetric-hash
  * StreamingSymmetricHashJoin with watermark-bounded state.
  */
class StreamStreamJoinSpec extends GraftSpec {

  private val base = 2016000L
  private def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
  private def ev(id: Long, min: Long, user: Long, typ: String) =
    (id, ts(min), user, typ, 1.0)

  test("purchases join same-user clicks from the preceding hour only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamingOps.streamStreamJoin(df, df)
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        ev(1, 0, 7, "click"),     // 100 min before purchase → out of range
        ev(2, 70, 7, "click"),    // 30 min before → matches
        ev(3, 90, 7, "click"),    // 10 min before → matches
        ev(4, 95, 8, "click"),    // other user → no match
        ev(5, 100, 7, "purchase"),
        ev(6, 130, 7, "click"))   // after the purchase → no match
      q.processAllAvailable()
      // advance the watermark far enough to emit/evict
      in.addData(ev(99, 600, 1, "click"))
      q.processAllAvailable()
      val got = spark.table("ssjoin")
        .select("p_id", "c_id", "gap_us")
        .as[(Long, Long, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq(
        (5L, 2L, 30L * 60 * 1000000),
        (5L, 3L, 10L * 60 * 1000000)))
    } finally q.stop()
  }

  test("plan is a symmetric hash join with watermark state eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamingOps.streamStreamJoin(df, df)
    val q = joined.writeStream.format("memory").queryName("ssjoin_plan")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 0, 1, "click"))
      q.processAllAvailable()
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain() }
      assert(buf.toString.contains("StreamingSymmetricHashJoin"))
    } finally q.stop()
  }
}
