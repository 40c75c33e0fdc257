package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming FROM the snapshot table ([[SnapshotSourceProvider]]):
  * version-numbered offsets, delta-only micro-batches, checkpointed
  * restart resuming at the committed version, rewrite detection, and
  * end-to-end exactly-once when paired with the idempotent sink. */
class SnapshotStreamSpec extends GraftSpec {

  private def runOnce(table: String, ckpt: String, out: String,
      ignoreChanges: Boolean = false): Unit = {
    val reader = spark.readStream
      .format("graft.sources.SnapshotSourceProvider")
      .option("path", table)
    val src = (if (ignoreChanges) reader.option("ignoreChanges", "true")
      else reader).load()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          SnapshotTable.commitIdempotent(batch.sparkSession, out,
            batch.toDF(), overwrite = false, txnId = s"src-$ckpt-$id")
          ()
      }
      .start()
    q.awaitTermination()
  }

  private def ids(t: String): Set[Long] =
    if (SnapshotTable.versions(spark, t).isEmpty) Set.empty
    else SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSet

  test("delta-only batches with checkpointed restart; exactly-once downstream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssrc1-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    runOnce(t, ck, out)
    assert(ids(out) == Set(1L, 2L, 3L))
    // caught up: a re-run with the same checkpoint emits nothing new
    runOnce(t, ck, out)
    assert(ids(out) == Set(1L, 2L, 3L))
    // two more versions land; the restarted stream processes ONLY them
    SnapshotTable.commit(spark, t, Seq(4L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(5L).toDF("id"), overwrite = false)
    runOnce(t, ck, out)
    assert(ids(out) == Set(1L, 2L, 3L, 4L, 5L))
    // the downstream table received each version-range exactly once
    assert(SnapshotTable.readAsOf(spark, out, Int.MaxValue).count() == 5)
  }

  test("maxVersionsPerTrigger paces the backfill into bounded batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssrc4-").toString
    val t = s"$dir/src"
    val ck = s"$dir/ck"
    (1 to 5).foreach(k =>
      SnapshotTable.commit(spark, t, Seq(k.toLong).toDF("id"), overwrite = false))
    val batches = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Seq[Long])]())
    val q = spark.readStream
      .format("graft.sources.SnapshotSourceProvider")
      .option("path", t)
      .option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          batches.add((id, batch.collect().map(_.getLong(0)).toSeq.sorted))
          ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toList.sortBy(_._1)
    // 5 versions at <=2 per trigger: exactly 3 bounded batches, drained
    assert(got.map(_._2) == List(Seq(1L, 2L), Seq(3L, 4L), Seq(5L)),
      s"unexpected batch pacing: $got")
  }

  test("a rewrite under the stream fails it; ignoreChanges streams on") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssrc2-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
    runOnce(t, ck, out)
    assert(ids(out) == Set(1L))
    // an overwrite breaks append semantics for the checkpointed reader
    SnapshotTable.commit(spark, t, Seq(9L).toDF("id"), overwrite = true)
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(t, ck, out)
    }
    assert(failed.getMessage.contains("REWRITTEN") ||
      Option(failed.getCause).exists(_.getMessage.contains("REWRITTEN")))
    // opting in: the rewritten file streams as new data
    runOnce(t, ck, out, ignoreChanges = true)
    assert(ids(out) == Set(1L, 9L))
  }

  test("the batch reader/writer API round-trips through the format") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssrc5-").toString
    val t = s"$dir/tbl"
    val fmt = "graft.sources.SnapshotSourceProvider"
    // writer modes are atomic snapshot commits
    Seq(1L, 2L).toDF("id").write.format(fmt).mode("append")
      .option("path", t).save()
    Seq(3L).toDF("id").write.format(fmt).mode("append")
      .option("path", t).save()
    intercept[IllegalStateException] {
      Seq(9L).toDF("id").write.format(fmt).mode("errorifexists")
        .option("path", t).save()
    }
    Seq(9L).toDF("id").write.format(fmt).mode("ignore")
      .option("path", t).save() // no-op by contract
    def read(opts: (String, String)*): Set[Long] = {
      val r = spark.read.format(fmt).option("path", t)
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
        .load().select("id").collect().map(_.getLong(0)).toSet
    }
    assert(read() == Set(1L, 2L, 3L))
    assert(read("versionAsOf" -> "1") == Set(1L, 2L)) // time travel
    Seq(50L).toDF("id").write.format(fmt).mode("overwrite")
      .option("path", t).save()
    assert(read() == Set(50L))
    assert(read("versionAsOf" -> "2") == Set(1L, 2L, 3L))
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2, 3))
    // zone maps still skip through the format doorway: refuted filter
    // scans nothing
    val df = spark.read.format(fmt).option("path", t).load()
      .filter(col("id") === 777)
    assert(df.count() == 0)
  }

  test("the stream's schema is fixed at start across table evolution") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssrc3-").toString
    val t = s"$dir/src"
    val outDir = java.nio.file.Files.createTempDirectory("graft-ssrc3o-").toString
    val ck = s"$dir/ck"
    SnapshotTable.commit(spark, t, Seq((1L, "a")).toDF("id", "v"), overwrite = false)
    // the table evolves AFTER the schema was fixed: new column arrives
    SnapshotTable.commit(spark, t,
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), overwrite = false)
    val src = spark.readStream
      .format("graft.sources.SnapshotSourceProvider")
      .option("path", t).load()
    assert(src.columns.toSeq == Seq("id", "v", "score")) // latest at start
    val q = src.writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", outDir).start()
    q.awaitTermination()
    val got = spark.read.parquet(outDir)
    assert(got.columns.toSeq == Seq("id", "v", "score"))
    // the pre-evolution row reads NULL for the later column
    assert(got.filter(col("id") === 1).head().isNullAt(2))
    assert(got.count() == 2)
  }

  // ---- change-feed streaming (option changeFeed=true) ----

  private def runCdf(table: String, ckpt: String, out: String,
      maxPerTrigger: Option[Int] = None,
      failOnBatch: Option[Long] = None): Unit = {
    val reader = spark.readStream
      .format("graft.sources.SnapshotSourceProvider")
      .option("path", table).option("changeFeed", "true")
    val src = maxPerTrigger.fold(reader)(n =>
      reader.option("maxVersionsPerTrigger", n.toString)).load()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          if (failOnBatch.contains(id))
            throw new RuntimeException(s"injected crash on batch $id")
          SnapshotTable.commitIdempotent(batch.sparkSession, out,
            batch.toDF(), overwrite = false,
            txnId = SnapshotTable.writerIdFor(ckpt), txnVersion = id)
          ()
      }
      .start()
    q.awaitTermination()
  }

  private def changes(out: String): Set[(String, Long, Long, Long)] =
    if (SnapshotTable.versions(spark, out).isEmpty) Set.empty
    else SnapshotTable.readAsOf(spark, out, Int.MaxValue)
      .collect().map(r => (r.getString(r.fieldIndex("change_type")),
        r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("v")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet

  test("change feed: per-commit tagging across append/UPDATE/DELETE, restart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scdf1-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq((3L, 30L)).toDF("id", "v"),
      overwrite = false)
    runCdf(t, ck, out)
    assert(changes(out) == Set(
      ("insert", 1L, 10L, 1L), ("insert", 2L, 20L, 1L),
      ("insert", 3L, 30L, 2L)))
    // caught up: a re-run with the same checkpoint emits nothing new
    runCdf(t, ck, out)
    assert(SnapshotTable.readAsOf(spark, out, Int.MaxValue).count() == 3)
    // an UPDATE (file rewrite) and a MOR DELETE land while down; the
    // restarted stream serves exactly their row-level diffs, tagged
    assert(SnapshotTable.updateWhere(spark, t, col("id") === 2L,
      Map("v" -> (col("v") * 10))).nonEmpty)
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).nonEmpty)
    runCdf(t, ck, out)
    assert(changes(out) == Set(
      ("insert", 1L, 10L, 1L), ("insert", 2L, 20L, 1L),
      ("insert", 3L, 30L, 2L),
      // the UPDATE commit streams as paired images (per-commit tiling
      // means the feed always sees single-commit ranges)
      ("update_preimage", 2L, 20L, 3L), ("update_postimage", 2L, 200L, 3L),
      ("delete", 1L, 10L, 4L)))
  }

  test("startingVersion: a fresh stream skips the backfill; offsets win") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scdf4-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    (1 to 4).foreach { k =>
      Thread.sleep(15) // stamps are millis; the timestamp case needs
      SnapshotTable.commit(spark, t, // distinct ones per commit
        Seq((k.toLong, k * 10L)).toDF("id", "v"), overwrite = false)
    }
    def run(opt: (String, String), ckpt: String, dest: String = out): Unit = {
      val q = spark.readStream
        .format("graft.sources.SnapshotSourceProvider")
        .option("path", t).option("changeFeed", "true")
        .option(opt._1, opt._2)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            SnapshotTable.commitIdempotent(batch.sparkSession, dest,
              batch.toDF(), overwrite = false,
              txnId = SnapshotTable.writerIdFor(ckpt), txnVersion = id)
            ()
        }
        .start()
      q.awaitTermination()
    }
    // a fresh stream serves commits >= 3 only — the clone-then-stream
    // bootstrap never re-reads the backfill it already owns
    run("startingVersion" -> "3", ck)
    assert(changes(out) == Set(
      ("insert", 3L, 30L, 3L), ("insert", 4L, 40L, 4L)))
    // a checkpointed RESTART ignores the option: the offset wins, so a
    // (nonsense) floor change cannot skip or double anything
    Thread.sleep(15)
    SnapshotTable.commit(spark, t, Seq((5L, 50L)).toDF("id", "v"),
      overwrite = false)
    run("startingVersion" -> "999", ck)
    assert(changes(out) == Set(
      ("insert", 3L, 30L, 3L), ("insert", 4L, 40L, 4L),
      ("insert", 5L, 50L, 5L)))
    // "latest": a fresh stream that is already caught up serves nothing
    run("startingVersion" -> "latest", s"$dir/ck2")
    assert(SnapshotTable.readAsOf(spark, out, Int.MaxValue).count() == 3)
    // startingTimestamp: v4's commit stamp resolves to startingVersion
    // 4, so a fresh stream serves v4 and v5 only
    val stamp4 = SnapshotTable.history(spark, t).collect()
      .find(_.getInt(0) == 4).get.getLong(8)
    val out2 = s"$dir/out2"
    run("startingTimestamp" -> stamp4.toString, s"$dir/ck3", out2)
    assert(changes(out2) == Set(
      ("insert", 4L, 40L, 4L), ("insert", 5L, 50L, 5L)))
    // a stamp past every commit behaves like "latest": nothing serves
    run("startingTimestamp" -> (stamp4 + 1000000L).toString,
      s"$dir/ck4", out2)
    assert(SnapshotTable.readAsOf(spark, out2, Int.MaxValue).count() == 2)
  }

  test("change feed: crash mid-backfill replays exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scdf2-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    (1 to 4).foreach(i => SnapshotTable.commit(spark, t,
      Seq((i.toLong, i * 10L)).toDF("id", "v"), overwrite = false))
    // one version per micro-batch; the sink dies on the SECOND batch —
    // batch 0 committed, batch 1 is replayed on restart
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runCdf(t, ck, out, maxPerTrigger = Some(1), failOnBatch = Some(1L))
    }
    runCdf(t, ck, out, maxPerTrigger = Some(1))
    assert(changes(out) == (1 to 4).map(i =>
      ("insert", i.toLong, i * 10L, i.toLong)).toSet)
    // exactly-once: no duplicate rows despite the replay
    assert(SnapshotTable.readAsOf(spark, out, Int.MaxValue).count() == 4)
  }

  test("change feed crosses a metadata-only rename losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scdf3-").toString
    val t = s"$dir/src"
    val out = s"$dir/out"
    val ck = s"$dir/ck"
    // history: data under the OLD name, rename, data under the NEW
    // name, then a delete touching a pre-rename row — the stream
    // starts AFTER all of it, so every pre-rename slice must be
    // relabeled by physical storage name, not null-filled
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), overwrite = false)
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    SnapshotTable.commit(spark, t, Seq((3L, 30L)).toDF("id", "val2"),
      overwrite = false)
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).nonEmpty)
    val src = spark.readStream
      .format("graft.sources.SnapshotSourceProvider")
      .option("path", t).option("changeFeed", "true").load()
    assert(src.columns.toSeq ==
      Seq("id", "val2", "change_type", "_commit_version"))
    val q = src.writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          SnapshotTable.commitIdempotent(batch.sparkSession, out,
            batch.toDF(), overwrite = false,
            txnId = SnapshotTable.writerIdFor(ck), txnVersion = id)
          ()
      }.start()
    q.awaitTermination()
    val got = SnapshotTable.readAsOf(spark, out, Int.MaxValue)
      .collect().map(r => (r.getString(r.fieldIndex("change_type")),
        r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("val2")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet
    assert(got == Set(
      ("insert", 1L, 10L, 1L), ("insert", 2L, 20L, 1L), // pre-rename data
      ("insert", 3L, 30L, 3L),                          // post-rename append
      ("delete", 1L, 10L, 4L)))                         // delete of an OLD row
  }
}
