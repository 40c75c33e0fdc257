package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Restart recovery across the exactly-once sink's crash boundary: a
  * backfill is killed AFTER a micro-batch's sink write lands but BEFORE
  * the checkpoint commits it — the failure window
  * [[StreamingOps.writeBatchIdempotent]]'s dynamic-partition overwrite
  * exists for. Restarting from the same checkpoint must re-deliver the
  * uncommitted batch under the SAME batch id (offset log, not commit
  * log, fixes the replay), overwrite its partition instead of appending,
  * finish the remaining files, and land output identical to an
  * uninterrupted run — no duplicates, no loss.
  */
class StreamRestartSpec extends GraftSpec {

  private val schemaDdl =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

  /** Three hour-bucketed data files plus a far-future flush sentinel,
    * mtimes ascending so `maxFilesPerTrigger=1` yields four ordered
    * micro-batches. */
  private def stageInput(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-in-").toString
    def write(name: String, rows: Seq[(Long, Long, Long, String, Double)],
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-restart-f-")
      rows.toDF("event_id", "mins", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_micros(CAST(mins * 60000000 AS BIGINT))"))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // files hours apart so the 2h watermark CLOSES the first file's
    // windows while the backfill is still mid-flight: batch 2's
    // watermark (max ts of batch 1 − 2h ≈ hour 4.7) flushes hours 0–1,
    // so the crash after batch 2 leaves REAL rows landed-but-uncommitted
    // — the recovery scenario under test. Values chosen so any dup/loss
    // shifts both n and sum_value.
    write("a.parquet", Seq(
      (1L, 5L, 1L, "view", 1.0), (2L, 15L, 2L, "click", 2.0),
      (3L, 45L, 1L, "view", 3.0), (4L, 75L, 1L, "purchase", 5.0)), 1000000L)
    write("b.parquet", Seq(
      (5L, 310L, 3L, "view", 4.0), (6L, 355L, 2L, "view", 6.0),
      (7L, 400L, 2L, "click", 7.0)), 2000000L)
    write("c.parquet", Seq(
      (8L, 610L, 3L, "view", 8.0), (9L, 665L, 1L, "click", 9.0)), 3000000L)
    // sentinel: far enough out that the watermark closes every window
    write("zz_sentinel.parquet", Seq(
      (-1L, 60L * 24 * 40, -1L, "__flush__", 0.0)), 4000000L)
    dir
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Run the watermarked tumbling backfill over `inDir` one file per
    * micro-batch; if `crashAfterBatch` is set, throw INSIDE foreachBatch
    * right after that batch id's sink write — the landed-but-uncommitted
    * state a real executor/driver loss leaves behind. */
  private def runOnce(inDir: String, outDir: String, ckptDir: String,
      crashAfterBatch: Option[Long]): Unit = {
    val src = spark.readStream.schema(schemaDdl)
      .option("latestFirst", "false")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = StreamingOps.tumblingAgg(src).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        StreamingOps.writeBatchIdempotent(b.toDF(), id, outDir)
        if (crashAfterBatch.contains(id))
          throw new RuntimeException(s"injected crash after sink write of batch $id")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => }
  }

  private def result(outDir: String): Seq[(java.sql.Timestamp, String, Long, Double)] =
    spark.read.parquet(outDir).drop("batch_id")
      .filter(col("event_type") =!= "__flush__")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSeq.sortBy(t => (t._1.getTime, t._2))

  test("restart from checkpoint after mid-backfill crash: no dupes, no loss") {
    val in = stageInput()
    val base = java.nio.file.Files.createTempDirectory("graft-restart-").toString

    // reference: one uninterrupted run
    runOnce(in, s"$base/refOut", s"$base/refCk", crashAfterBatch = None)
    val ref = result(s"$base/refOut")
    assert(ref.nonEmpty, "reference backfill produced no windows")

    // crashed run: batch 2's sink write (the first with closed windows)
    // lands, its checkpoint commit does not — the stream dies mid-backfill
    runOnce(in, s"$base/out", s"$base/ck", crashAfterBatch = Some(2L))
    val crashed = spark.read.parquet(s"$base/out")
      .filter(col("event_type") =!= "__flush__")
    assert(crashed.count() > 0,
      "crash injection missed: nothing real landed before the crash")
    val landed = crashed
      .select(col("batch_id")).distinct().collect().map(_.getInt(0)).toSet
    assert(landed.contains(2),
      s"crash injection failed: batch 2 never reached the sink (landed=$landed)")
    assert(!landed.exists(_ > 2), s"batches past the crash point ran: $landed")

    // restart from the SAME checkpoint and sink: the uncommitted batch
    // replays under its original id (partition overwritten, not
    // appended), the remaining files process, trailing state drains
    runOnce(in, s"$base/out", s"$base/ck", crashAfterBatch = None)
    assert(result(s"$base/out") == ref,
      "restarted backfill output differs from the uninterrupted run")

    // and the exactly-once guarantee stated directly: every window key
    // appears exactly once across the whole restarted sink
    val dups = spark.read.parquet(s"$base/out")
      .filter(col("event_type") =!= "__flush__")
      .groupBy(col("hour"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0, s"$dups window keys duplicated across the restart")
  }
}
