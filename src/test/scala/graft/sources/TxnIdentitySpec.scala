package graft.sources

import graft.GraftSpec

/** Writer identity of idempotent commits: checkpoint-derived writer
  * ids keep two streams feeding one table from mistaking each other's
  * batch versions for replays, and the legacy per-batch txn form
  * (`#txn:<writer>-<batch>`) is still recognized as "landed" by a sink
  * replaying the same batch under the new (writer, version) identity —
  * the exactly-once guarantee survives the manifest-format upgrade. */
class TxnIdentitySpec extends GraftSpec {

  private def rows(t: String): Seq[Long] =
    SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("writerIdFor: stable, slash-insensitive, distinct per checkpoint") {
    val a = SnapshotTable.writerIdFor("/tmp/ck/stream-a")
    assert(a == SnapshotTable.writerIdFor("/tmp/ck/stream-a/"))
    assert(a != SnapshotTable.writerIdFor("/tmp/ck/stream-b"))
    assert(a.startsWith("ckpt-") && a.length < 40)
  }

  test("two sinks with distinct checkpoints never skip each other's batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-txnid1-").toString
    val t = s"$dir/tbl"
    val wA = SnapshotTable.writerIdFor(s"$dir/ckA")
    val wB = SnapshotTable.writerIdFor(s"$dir/ckB")
    // both streams emit batch ids 0 and 1 — under a shared constant
    // writer id, B's batch 0 would be "already landed" after A's
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(10L).toDF("id"), overwrite = false, wA, 0L).isDefined)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(20L).toDF("id"), overwrite = false, wB, 0L).isDefined)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(11L).toDF("id"), overwrite = false, wA, 1L).isDefined)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(21L).toDF("id"), overwrite = false, wB, 1L).isDefined)
    assert(rows(t) == Seq(10L, 11L, 20L, 21L))
    // one watermark line per WRITER, each at its own highest batch
    assert(SnapshotTable.committedTxnVersions(spark, t) ==
      Map(wA -> 1L, wB -> 1L))
    // a genuine replay from either stream is still a no-op
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(11L).toDF("id"), overwrite = false, wA, 1L).isEmpty)
    assert(rows(t) == Seq(10L, 11L, 20L, 21L))
  }

  test("a legacy per-batch txn is recognized as landed across the upgrade") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-txnid2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
    // simulate a pre-watermark table: its last commit stamped batch 2 of
    // writer "gate" as the opaque composite id `gate-2` (a raw `#txn:`
    // manifest line, the legacy on-disk form)
    val mPath = java.nio.file.Paths.get(dir, "tbl", "_commits", "v00001.txt")
    val withLegacy = new String(
      java.nio.file.Files.readAllBytes(mPath), "UTF-8") + "\n#txn:gate-2"
    java.nio.file.Files.write(mPath, withLegacy.getBytes("UTF-8"))
    assert(SnapshotTable.committedTxns(spark, t).contains("gate-2"))
    // the stream restarts across the upgrade and replays batch 2 under
    // the NEW (writer, version) identity — must be a no-op
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(99L).toDF("id"), overwrite = false, "gate", 2L).isEmpty)
    assert(rows(t) == Seq(1L))
    // the next REAL batch lands, and the watermark takes over from there
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(3L).toDF("id"), overwrite = false, "gate", 3L).isDefined)
    assert(rows(t) == Seq(1L, 3L))
    assert(SnapshotTable.committedTxnVersions(spark, t)
      .get("gate").contains(3L))
    // version 0 only: a real WATERMARK (version > 0) under a writer
    // whose NAME merely looks like a composite is that writer's own
    // state, never a legacy batch marker for someone else — ("y", 3)
    // must still land even though writer "y-3" has committed
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(4L).toDF("id"), overwrite = false, "y-3", 5L).isDefined)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(5L).toDF("id"), overwrite = false, "y", 3L).isDefined)
    assert(rows(t) == Seq(1L, 3L, 4L, 5L))
    // namespace separation: a NEW one-shot id spelling "<writer>-<batch>"
    // lives in the #txnv: namespace — it can never mark writer "etl"'s
    // batch 7 as a replay (only ids that arrived as legacy #txn: lines
    // may satisfy the upgrade-seam composite)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(6L).toDF("id"), overwrite = false, "etl-7", 0L).isDefined)
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(7L).toDF("id"), overwrite = false, "etl", 7L).isDefined)
    assert(rows(t) == Seq(1L, 3L, 4L, 5L, 6L, 7L))
    // ...while the GENUINE legacy id still protects across all the
    // intervening commits: manifests carry #txn: lines forward in their
    // own form, so the composite for ("gate", 2) still reads as landed
    assert(SnapshotTable.commitIdempotent(spark, t,
      Seq(99L).toDF("id"), overwrite = false, "gate", 2L).isEmpty)
    assert(SnapshotTable.committedTxns(spark, t).contains("gate-2"))
  }
}
