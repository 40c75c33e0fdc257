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

  test("restore racing an append: both land, versions dense, history total") {
    import spark.implicits._
    // RESTORE semantics under contention (Delta's): restore publishes a
    // whole-state version like any other writer, so a racing append is
    // never corrupted — it owns its own version — but whichever
    // publishes LAST defines the latest state. The spec pins the
    // invariants that must hold either way: dense versions, one winner
    // per number, both outcomes present in history, and the final state
    // equal to a replay of the version order that actually won.
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-rrace$round-").toString
      val t = s"$dir/tbl"
      SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
      SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = false)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val Seq(vRestore, vAppend) = inParallel(Seq(
        () => { gate.countDown(); gate.await()
          SnapshotTable.restore(spark, t, 1) },
        () => { gate.countDown(); gate.await()
          SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false) }))
      assert(Set(vRestore, vAppend) == Set(3, 4),
        s"expected dense versions 3,4; got restore=$vRestore append=$vAppend")
      assert(SnapshotTable.versions(spark, t) == Seq(1, 2, 3, 4))
      // whichever version is LATEST defines the state; both are readable
      val latest = ids(SnapshotTable.readAsOf(spark, t, 4))
      if (vRestore == 4) assert(latest == Set(1L))
      else {
        // the append published after the restore: its base was whatever
        // it re-read inside the retry loop, so id 3 must be present and
        // the state must equal one of the two legal linearizations
        assert(latest == Set(1L, 3L) || latest == Set(1L, 2L, 3L),
          s"append-after-restore state unexpected: $latest")
      }
      // the restored target itself is intact regardless of the race
      assert(ids(SnapshotTable.readAsOf(spark, t, 1)) == Set(1L))
      assert(ids(SnapshotTable.readAsOf(spark, t, 2)) == Set(1L, 2L))
    }
  }

  test("racing PARTITIONED appenders: all land, layout and values intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-race4-").toString
    val t = s"$dir/tbl"
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = inParallel((0 until 4).map { w => () =>
      gate.countDown(); gate.await()
      SnapshotTable.commitPartitioned(spark, t,
        Seq((w * 10L, s"p${w % 2}")).toDF("id", "k"), "k")
    })
    assert(results.sorted == List(1, 2, 3, 4))
    val back = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((0L, "p0"), (10L, "p1"), (20L, "p0"), (30L, "p1")))
    // every racing writer kept the hive scheme
    assert(back.inputFiles.forall(_.matches(".*/k=p[01]/.*")))
  }

  test("a partitioned append racing a flat overwrite never corrupts layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-race5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      Seq((1L, "a")).toDF("id", "k"), "k")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = inParallel(Seq[() => Either[Throwable, Int]](
      () => { gate.countDown(); gate.await()
        try Right(SnapshotTable.commitPartitioned(spark, t,
          Seq((2L, "b")).toDF("id", "k"), "k"))
        catch { case e: IllegalArgumentException => Left(e) } },
      () => { gate.countDown(); gate.await()
        Right(SnapshotTable.commit(spark, t,
          Seq((9L, "z")).toDF("id", "k"), overwrite = true)) }
    ))
    // the overwrite always lands; the partitioned append either ordered
    // BEFORE it (fine — the overwrite replaced it) or re-read the
    // flat layout in its retry and REFUSED (fine — loud, not silent
    // corruption). Either way the final manifest is self-consistent:
    // its recorded layout matches its files.
    val latest = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    val rows = latest.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    results.head match {
      case Left(e) =>
        assert(e.getMessage.contains("laid out"), e.getMessage)
        assert(rows == Set((9L, "z")))
      case Right(_) =>
        // the append can only succeed by ordering BEFORE the overwrite
        // (an attempt after it re-reads the flat layout and refuses), so
        // the overwrite's state is final
        assert(rows == Set((9L, "z")), s"unexpected state: $rows")
    }
    // whatever happened, a fresh read plans without error and COUNTS
    // agree with metadata
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue)
      .contains(latest.count()))
  }

  test("partition-disjoint UPDATEs race: both commit with NO rewrite retry") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-race7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      spark.range(0, 100).select((col("id") % 4).as("p"), col("id").as("v")),
      "p", overwrite = false)
    // interleave DETERMINISTICALLY: update A (p=1) pauses at its publish
    // point; update B (p=3) runs to completion in that window; A then
    // publishes — REBASED onto B's manifest, its rewrite reused.
    // beforePublishHook fires once per publish ATTEMPT, so the total
    // count is the retry meter: 2 = no re-plan anywhere.
    val hookCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        hookCalls.incrementAndGet()
        if (!interleaved) {
          interleaved = true // B's own hook call must not recurse
          assert(SnapshotTable.updateWhere(spark, t, col("p") === 3L,
            Map("v" -> lit(-300L))).nonEmpty, "update B failed to commit")
        }
      }
      assert(SnapshotTable.updateWhere(spark, t, col("p") === 1L,
        Map("v" -> lit(-100L))).nonEmpty, "update A failed to commit")
    } finally SnapshotTable.beforePublishHook = saved
    assert(hookCalls.get == 2,
      s"expected 2 publish attempts (no retry), saw ${hookCalls.get}")
    // serializable result: both updates applied, everything else intact
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("p") === 1L && col("v") =!= -100L).count() == 0)
    assert(snap.filter(col("p") === 3L && col("v") =!= -300L).count() == 0)
    assert(snap.filter(col("p") === 0L).agg(sum(col("v"))).head().getLong(0)
      == (0L until 100L by 4).sum)
    assert(snap.count() == 100)
    assert(SnapshotTable.versions(spark, t).size == 3)
  }

  test("same-file UPDATE conflict still re-plans to a serializable result") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-race8-").toString
    val t = s"$dir/tbl"
    // ONE file: any two updates collide — the rebase must refuse and
    // the loser re-plan against the winner's state
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
        .repartition(1), overwrite = false)
    val hookCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        hookCalls.incrementAndGet()
        if (!interleaved) {
          interleaved = true
          assert(SnapshotTable.updateWhere(spark, t, col("k") < 10L,
            Map("v" -> (col("v") + 1000L))).nonEmpty)
        }
      }
      assert(SnapshotTable.updateWhere(spark, t, col("k") >= 90L,
        Map("v" -> (col("v") + 5000L))).nonEmpty)
    } finally SnapshotTable.beforePublishHook = saved
    // A's first attempt conflicted (same file), so it re-planned: three
    // publish attempts total — and BOTH effects survive (the re-plan
    // read B's committed rows)
    assert(hookCalls.get == 3, s"attempts: ${hookCalls.get}")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("k") < 10L && col("v") =!= col("k") + 1000L)
      .count() == 0)
    assert(snap.filter(col("k") >= 90L && col("v") =!= col("k") + 5000L)
      .count() == 0)
    assert(snap.filter(col("k") >= 10L && col("k") < 90L &&
      col("v") =!= col("k")).count() == 0)
  }

  test("an append MATCHING the UPDATE predicate forces the strict re-plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-race10-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
        .repartition(2), overwrite = false)
    val hookCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        hookCalls.incrementAndGet()
        if (!interleaved) {
          interleaved = true
          SnapshotTable.commit(spark, t, Seq((5000L, 0L)).toDF("k", "v"),
            overwrite = false)
        }
      }
      assert(SnapshotTable.updateWhere(spark, t, col("k") >= 50L,
        Map("v" -> lit(-1L))).nonEmpty)
    } finally SnapshotTable.beforePublishHook = saved
    // the appended row matches k >= 50: serialized append-then-update,
    // so the update re-planned — two UPDATE publish attempts (commit's
    // append path does not fire the hook)
    assert(hookCalls.get == 2, s"attempts: ${hookCalls.get}")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("k") === 5000L).head().getLong(1) == -1L,
      "re-planned update must cover the concurrently appended row")
    assert(snap.filter(col("k") >= 50L && col("v") =!= -1L).count() == 0)
    assert(snap.filter(col("k") < 50L && col("v") =!= col("k")).count() == 0)
  }

  test("a NON-matching append composes with UPDATE retry-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-race11-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
        .repartition(2), overwrite = false)
    val hookCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        hookCalls.incrementAndGet()
        if (!interleaved) {
          interleaved = true
          SnapshotTable.commit(spark, t, Seq((-5L, 7L)).toDF("k", "v"),
            overwrite = false)
        }
      }
      assert(SnapshotTable.updateWhere(spark, t, col("k") >= 50L,
        Map("v" -> lit(-1L))).nonEmpty)
    } finally SnapshotTable.beforePublishHook = saved
    // the appended row does NOT match: both serial orders agree, so the
    // update rebases on its single publish attempt — no re-plan
    assert(hookCalls.get == 1, s"attempts: ${hookCalls.get}")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.count() == 101)
    assert(snap.filter(col("k") === -5L).head().getLong(1) == 7L)
    assert(snap.filter(col("k") >= 50L && col("v") =!= -1L).count() == 0)
  }

  test("concurrent vector DELETEs compose: both land without re-plan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-race9-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      spark.range(0, 100).select((col("id") % 4).as("p"), col("id").as("v")),
      "p", overwrite = false)
    val hookCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var interleaved = false
    val saved = SnapshotTable.beforePublishHook
    try {
      SnapshotTable.beforePublishHook = () => {
        hookCalls.incrementAndGet()
        if (!interleaved) {
          interleaved = true
          assert(SnapshotTable.deleteWhere(spark, t,
            col("p") === 3L && col("v") < 20L).nonEmpty)
        }
      }
      assert(SnapshotTable.deleteWhere(spark, t,
        col("p") === 1L && col("v") < 20L).nonEmpty)
    } finally SnapshotTable.beforePublishHook = saved
    assert(hookCalls.get == 2,
      s"expected 2 publish attempts (vector union, no retry), saw ${hookCalls.get}")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.count() == 100 - 5 - 5) // v in {1,5,9,13,17} x two partitions
    assert(snap.filter(col("p").isin(1L, 3L) && col("v") < 20L).count() == 0)
    assert(snap.filter(col("p") === 0L).count() == 25)
  }
}
