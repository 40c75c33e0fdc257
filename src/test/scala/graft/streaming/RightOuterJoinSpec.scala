package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** RIGHT-outer stream-stream interval join: every click exactly once —
  * matched pairs in-flight, unmatched clicks with a NULL purchase side
  * once the purchase watermark proves none can come — plus crash/replay
  * recovery through the exactly-once sink. */
class RightOuterJoinSpec extends GraftSpec {

  private val base = 2016000L
  private def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
  private def ev(id: Long, min: Long, user: Long, typ: String) =
    (id, ts(min), user, typ, 1.0)

  test("every click once: matched in-flight, unmatched after watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamingOps.streamStreamRightOuter(df, df)
    val q = joined.writeStream.format("memory").queryName("rojoin")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        ev(1, 0, 7, "click"),   // 100 min before purchase → NO match
        ev(2, 70, 7, "click"),  // 30 min before → matches
        ev(3, 95, 8, "click"),  // other user → NO match
        ev(5, 100, 7, "purchase"),
        ev(6, 130, 7, "click")) // after the purchase → NO match
      q.processAllAvailable()
      // watermark far enough that every unmatched click is final
      in.addData(ev(99, 3000, 1, "purchase"), ev(98, 3000, 1, "click"))
      q.processAllAvailable()
      val got = spark.table("rojoin")
        .filter(col("c_id") < 90) // drop the flush rows themselves
        .select("p_id", "c_id", "c_user")
        .collect()
        .map(r => (if (r.isNullAt(0)) -999L else r.getLong(0),
          r.getLong(1), r.getLong(2))).sortBy(_._2)
      assert(got.toSeq === Seq(
        (-999L, 1L, 7L),  // out of range: null purchase side
        (5L, 2L, 7L),     // the one in-window match
        (-999L, 3L, 8L),  // other user: unmatched
        (-999L, 6L, 7L))) // click after the purchase: unmatched
      // exactly-once per click
      assert(spark.table("rojoin").filter(col("c_id") < 90)
        .groupBy("c_id").count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }

  private val schemaDdl =
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Hour-spread purchase/click files plus the far-future sentinel pair
    * (admitted on BOTH sides — it advances the watermarks that release
    * unmatched clicks), mtimes ascending for ordered micro-batches. */
  private def stageInput(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-roj-in-").toString
    def write(name: String, rows: Seq[(Long, Long, Long, String, Double)],
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-roj-f-")
      rows.toDF("event_id", "mins", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_micros(CAST(mins * 60000000 AS BIGINT))"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    write("a.parquet", Seq(
      (1L, 5L, 1L, "click", 1.0), (2L, 30L, 1L, "purchase", 2.0),
      (3L, 45L, 2L, "click", 3.0)), 1000000L)
    write("b.parquet", Seq(
      (4L, 310L, 2L, "click", 4.0), (5L, 350L, 2L, "purchase", 5.0),
      (6L, 400L, 3L, "click", 6.0)), 2000000L)
    write("c.parquet", Seq(
      (7L, 610L, 1L, "click", 7.0), (8L, 640L, 1L, "purchase", 8.0)),
      3000000L)
    write("zz_sentinel.parquet", Seq(
      (-1L, 60L * 24 * 40, -1L, "purchase", 0.0),
      (-1L, 60L * 24 * 40, -1L, "click", 0.0)), 4000000L)
    dir
  }

  private def runOnce(inDir: String, outDir: String, ckptDir: String,
      crashAfterBatch: Option[Long]): Unit = {
    val src = spark.readStream.schema(schemaDdl)
      .option("latestFirst", "false")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = StreamingOps.streamStreamRightOuter(src, src).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        StreamingOps.writeBatchIdempotent(b.toDF(), id, outDir)
        if (crashAfterBatch.contains(id))
          throw new RuntimeException(s"injected crash after batch $id")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => }
  }

  private def result(outDir: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(outDir).drop("batch_id")
      .filter(!(col("c_id") <=> lit(-1L)) && !(col("p_id") <=> lit(-1L)))
      .collect()
      .map(r => (if (r.isNullAt(0)) -999L else r.getLong(0),
        r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("restart from checkpoint mid-backfill: no dupes, no lost clicks") {
    val in = stageInput()
    val base = java.nio.file.Files.createTempDirectory("graft-roj-").toString
    runOnce(in, s"$base/refOut", s"$base/refCk", crashAfterBatch = None)
    val ref = result(s"$base/refOut")
    assert(ref.nonEmpty, "reference backfill produced no rows")
    // every staged click (1,3,4,6,7) appears exactly once; 4 matches 5
    assert(ref.map(_._2).sorted == Seq(1L, 3L, 4L, 6L, 7L))
    assert(ref.contains((2L, 1L, 1L)) && ref.contains((5L, 4L, 2L)) &&
      ref.contains((8L, 7L, 1L)))
    assert(ref.count(_._1 == -999L) == 2) // clicks 3 and 6: unmatched

    runOnce(in, s"$base/out", s"$base/ck", crashAfterBatch = Some(2L))
    val landed = spark.read.parquet(s"$base/out")
      .select(col("batch_id")).distinct().collect().map(_.getInt(0)).toSet
    assert(landed.contains(2) && !landed.exists(_ > 2),
      s"crash injection failed (landed=$landed)")

    runOnce(in, s"$base/out", s"$base/ck", crashAfterBatch = None)
    assert(result(s"$base/out") == ref,
      "restarted right-outer output differs from the uninterrupted run")
  }
}
