package graft.streaming

import graft.GraftSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** [[StreamingOps.RecordHighProcessor]] (transformWithState): the
  * ValueState must CARRY ACROSS micro-batches — batch 2's emission
  * reflects batch 1's running (count, max), which is indistinguishable
  * from a fresh fold only if state were lost (the count would reset). */
class TransformStateSpec extends GraftSpec {

  private def writeFile(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double)], mtime: Long): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tws-f-")
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

  test("value state carries across micro-batches; per-batch emissions are the running totals") {
    val in = java.nio.file.Files.createTempDirectory("graft-tws-in-").toString
    // batch 0: u1 sees 5 then 3 (one record); u2 sees 9 (one record)
    writeFile(in, "a.parquet", Seq(
      (1L, 10L, 1L, "view", 5.0), (2L, 20L, 1L, "view", 3.0),
      (3L, 15L, 2L, "view", 9.0)), 1000000L)
    // batch 1: u1 sees 7 then 4 -> record count must become 2 (5 then 7);
    // a state-lossy fold would restart at 1
    writeFile(in, "b.parquet", Seq(
      (4L, 30L, 1L, "view", 7.0), (5L, 40L, 1L, "view", 4.0)), 2000000L)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = java.nio.file.Files.createTempDirectory("graft-tws-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ck-").toString
    try {
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
      val q = StreamingOps.idempotentParquetSink(
        StreamingOps.recordHighs(spark, src), out, ckpt)
      q.awaitTermination()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }

    val rows = spark.read.parquet(out)
      .select(col("batch_id").cast("long"), col("user_id"),
        col("n_records"), col("max_micro"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows == Set(
      (0L, 1L, 1L, 5000000L), // u1 after batch 0: one record (5)
      (0L, 2L, 1L, 9000000L), // u2 after batch 0
      (1L, 1L, 2L, 7000000L)  // u1 after batch 1: count CARRIED to 2
    ))
  }

  test("a null event_id row is filtered at ingress, not an encoder crash") {
    import org.apache.spark.sql.Row
    val in = java.nio.file.Files.createTempDirectory("graft-tws2-in-").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
    def ts(mins: Long) = new java.sql.Timestamp(mins * 60000L)
    // the REv encoder's event_id is a primitive Long: without the
    // ingress filter a NULL here NPEs the whole query instead of
    // dropping the row (the stated ingress contract)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(null, ts(10), 1L, "view", 5.0),
        Row(2L, ts(20), 1L, "view", 3.0))), schema)
      .coalesce(1).write.mode("overwrite").parquet(in)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = java.nio.file.Files.createTempDirectory("graft-tws2-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws2-ck-").toString
    try {
      val q = StreamingOps.idempotentParquetSink(
        StreamingOps.recordHighs(spark,
          spark.readStream.schema(schema).parquet(in)), out, ckpt)
      q.awaitTermination()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    val rows = spark.read.parquet(out)
      .select(col("user_id"), col("n_records"), col("max_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only the identified row folds: one record at 3.0
    assert(rows == Set((1L, 1L, 3000000L)))
  }
}
