package graft.streaming

import graft.GraftSpec
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Crash recovery for the streaming near-dup gate composition
  * (`stream_dedup_gate`'s wiring): a batch's snapshot-table commit
  * lands, then the stream dies BEFORE the checkpoint records the batch.
  * The restart replays the same batch id; the idempotent txn set must
  * swallow the duplicate commit, and the final accepted set must equal
  * an uninterrupted run — no duplicates, no loss, one version per
  * distinct batch. */
class GateRestartSpec extends GraftSpec {

  test("gate crash between commit and checkpoint: replay dedupes, set exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-gate-restart-")
    val stage = root.resolve("in").toString
    val table = root.resolve("tbl").toString
    val ckpt = root.resolve("ck").toString

    val corpusDocs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (4L, "red green blue yellow purple")).toDF("doc_id", "text")
    // three arriving files, mtimes ascending -> three ordered batches
    def writeFile(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-gate-f-")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) part = p
      }
      val dst = java.nio.file.Paths.get(stage, name)
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    writeFile("a.parquet", Seq(
      (1L, "alpha beta gamma delta epsilon"), // exact dup of doc 0 -> drop
      (3L, "totally fresh words here now")), 1000000L)
    writeFile("b.parquet", Seq(
      (5L, "red green blue yellow purple")), 2000000L) // dup of 4 -> drop
    writeFile("c.parquet", Seq(
      (7L, "unique closing arrival doc keep")), 3000000L)

    val index = graft.operators.DedupOps.buildPrefixIndex(corpusDocs)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(crashAfter: Option[Long]): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            val b = batch.toDF().localCheckpoint(true)
            val matched = graft.operators.DedupOps.nearDupMatches(index, b)
            val survivors = b.join(matched,
              b("doc_id") === matched("batch_id"), "left_anti")
              .select(col("doc_id"))
            SnapshotTable.commitIdempotent(batch.sparkSession, table,
              survivors, overwrite = false, txnId = "gate",
              txnVersion = id)
            // crash AFTER the sink commit, BEFORE the checkpoint commit
            if (crashAfter.contains(id) && !crashed.getAndSet(true))
              throw new RuntimeException("injected crash after sink write")
            ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    intercept[Exception] { run(Some(1L)) } // dies mid-stream after batch 1
    assert(crashed.get, "the injected crash must have fired")
    run(None) // restart from the same checkpoint

    val accepted = SnapshotTable.readAsOf(spark, table, Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(accepted == Seq(3L, 7L),
      s"replay duplicated or lost rows: $accepted")
    // the replayed batch's txn landed exactly once, and the manifest
    // carries ONE watermark line for the sink (writer "gate" at its
    // highest batch), not one line per micro-batch
    assert(SnapshotTable.committedTxnVersions(spark, table) ==
      Map("gate" -> 2L))
  }
}
