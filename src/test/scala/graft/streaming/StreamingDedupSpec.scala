package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact-dedup semantics: within the watermark horizon, only the
  * first row per content digest survives; rows with distinct content all
  * pass. (State eviction beyond the horizon is the engine's contract —
  * what we pin here is the dedup semantics and that the query runs with
  * a bounded-state operator, not plain dropDuplicates.)
  */
class StreamingDedupSpec extends GraftSpec {

  private val base = 2016000L
  private def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)

  test("duplicates inside the watermark horizon are dropped, firsts kept") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = StreamingOps.streamingDedup(
      in.toDF().toDF("ts", "text"))
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
      q.processAllAvailable()
      in.addData((ts(3), "alpha"), (ts(4), "gamma"))
      q.processAllAvailable()
      val rows = spark.table("sdedup").select("text").as[String].collect().sorted
      assert(rows.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("the plan uses the within-watermark dedup operator (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = StreamingOps.streamingDedup(in.toDF().toDF("ts", "text"))
    // the analyzed plan must carry the watermark-evicting dedup node, not
    // the unbounded-state plain Deduplicate
    val plan = dedup.queryExecution.analyzed.toString
    assert(plan.contains("DeduplicateWithinWatermark"))
  }
}
