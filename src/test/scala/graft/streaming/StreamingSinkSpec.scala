package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Exactly-once parquet sink: a replayed micro-batch must overwrite its
  * own partition, not append duplicates.
  */
class StreamingSinkSpec extends GraftSpec {

  test("idempotent foreachBatch sink: replay does not duplicate") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"
    (0L until 100L).toDF("id").coalesce(2)
      .write.parquet(srcDir)
    val src = spark.readStream
      .schema("id LONG")
      .parquet(srcDir)
    val q = StreamingOps.idempotentParquetSink(src, outDir, ckDir)
    q.awaitTermination()
    val once = spark.read.parquet(outDir)
    assert(once.count() === 100L)
    assert(once.agg(sum("id")).head.getLong(0) === 4950L)
    // availableNow with no file cap lands everything in batch 0, so the
    // replay below writes exactly batch 0's data
    assert(once.select("batch_id").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    // simulate Structured Streaming replaying batch 0 after a failure:
    // the same data written under the same batch id must overwrite, not
    // append
    StreamingOps.writeBatchIdempotent(
      spark.read.parquet(srcDir), 0L, outDir)
    val replayed = spark.read.parquet(outDir)
    assert(replayed.count() === 100L, "replay duplicated rows")
    assert(replayed.agg(sum("id")).head.getLong(0) === 4950L)
  }
}
