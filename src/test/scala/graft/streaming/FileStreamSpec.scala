package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming against a real file source: the events table is replayed as
  * a rate-limited parquet stream (maxFilesPerTrigger) through the same
  * windowed aggregation used in batch (q23's streaming twin) — the
  * batch/stream parity Structured Streaming promises.
  */
class FileStreamSpec extends GraftSpec {

  test("parquet file stream through tumbling agg matches the batch result") {
    import org.apache.spark.sql.types._
    // re-write events (nanos ts) as micros so the stream source schema is plain
    val batchDf = graft.Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-").toString
    batchDf.write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
    val agg = StreamingOps.tumblingAgg(stream)
    val q = agg.writeStream.format("memory").queryName("file_tumbling")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("file_tumbling")
        .select("hour", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = batchDf
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
