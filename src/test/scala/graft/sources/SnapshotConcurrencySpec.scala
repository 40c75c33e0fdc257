package graft.sources

import graft.GraftSpec

/** Concurrent-writer safety of [[SnapshotTable]]: the commit point is an
  * atomic create-exclusive of the version name, so of N racing writers
  * exactly one wins each version and every loser retries at the next —
  * no commit is lost, version history stays dense, and a reader resolved
  * mid-race stays pinned to a consistent snapshot. */
class SnapshotConcurrencySpec extends GraftSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def inParallel[T](thunks: Seq[() => T]): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map(t => pool.submit(
        new java.util.concurrent.Callable[T] { def call(): T = t() }))
      futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("racing appenders: every commit lands, versions stay dense") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-race1-").toString
    val t = s"$dir/tbl"
    val nWriters = 4
    val perWriter = 3
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = inParallel((0 until nWriters).map { w => () =>
      gate.countDown(); gate.await()
      (0 until perWriter).map { i =>
        SnapshotTable.commit(spark, t,
          Seq(w * 100L + i).toDF("id"), overwrite = false)
      }
    })
    val versions = results.flatten.sorted
    // exactly one winner per version number, no gaps, nothing lost
    assert(versions == (1 to nWriters * perWriter).toList,
      s"commit versions not dense/unique: $versions")
    assert(SnapshotTable.versions(spark, t) == (1 to nWriters * perWriter))
    val expect = (for (w <- 0 until nWriters; i <- 0 until perWriter)
      yield w * 100L + i).toSet
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == expect)
    // per-writer commits are sequential, so each writer's own versions
    // ascend — the retry loop never reorders a single writer's history
    results.foreach(vs => assert(vs == vs.sorted))
  }

  test("a reader resolved mid-race stays on its snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-race2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("id"), overwrite = false)
    val reader = SnapshotTable.readAsOf(spark, t, 1) // resolved NOW
    inParallel(Seq(
      () => SnapshotTable.commit(spark, t, Seq(10L).toDF("id"), overwrite = false),
      () => SnapshotTable.commit(spark, t, Seq(99L).toDF("id"), overwrite = true),
      // the racing reads must see SOME published snapshot, never a torn one
      () => ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue))))
    assert(ids(reader) == Set(1L, 2L))
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2, 3))
    // whichever interleaving won, v1 is immutable and the final state is
    // one of the two serializable orders
    val fin = ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue))
    assert(fin == Set(99L) || fin == Set(99L, 10L), s"non-serializable state $fin")
  }

  test("zombie replay: two writers with the SAME txn id land it once") {
    import spark.implicits._
    for (round <- 1 to 3) { // the race window is narrow — try a few times
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-race3-$round-").toString
      val t = s"$dir/tbl"
      val gate = new java.util.concurrent.CountDownLatch(1)
      val res = inParallel(Seq.fill(2)(() => {
        gate.countDown(); gate.await()
        SnapshotTable.commitIdempotent(spark, t,
          Seq(7L).toDF("id"), overwrite = false, txnId = "batch-0")
      }))
      // exactly-once: at most one Some; the table holds ONE copy of the
      // batch regardless of which interleaving occurred
      assert(res.count(_.nonEmpty) >= 1) // somebody committed it
      val rows = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(7L),
        s"round $round: replayed txn landed ${rows.size} times")
      assert(SnapshotTable.committedTxns(spark, t) == Set("batch-0"))
      assert(SnapshotTable.versions(spark, t).size == 1)
    }
  }
}
