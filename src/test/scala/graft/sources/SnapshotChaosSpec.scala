package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Concurrency chaos: three threads interleave appends, idempotent
  * commits, serializable merges, merge-on-read deletes, vector
  * absorbs, ordered mergeLatest upserts, compactions, and vacuums
  * against ONE table (vacuum with the documented min-age guard for
  * in-flight commits). Each thread owns a disjoint id namespace, so
  * whatever the interleaving, the final table must equal the union of
  * the per-thread models — merges AND deletes on disjoint keys commute
  * ONLY because every mutating operation re-plans on conflict instead
  * of losing updates. Version history must stay a contiguous range and
  * every issued txn must land exactly once. */
class SnapshotChaosSpec extends GraftSpec {

  test("interleaved writers + maintenance converge to the union of models") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chaos-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((0L, 0L)).toDF("id", "v"), overwrite = false) // seed row, kept
    val nThreads = 3
    val opsPerThread = 6
    val models = Array.fill(nThreads)(scala.collection.mutable.Map.empty[Long, Long])
    val issuedTxns = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val errors = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { k =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          val rnd = new scala.util.Random(1000L + k)
          try (1 to opsPerThread).foreach { step =>
            val base = (k + 1) * 1000L
            rnd.nextInt(8) match {
              case 0 => // append fresh thread-owned ids
                val fresh = (1 to 2).map(_ => base + rnd.nextInt(50))
                  .distinct.filterNot(models(k).contains)
                  .map(i => i -> (step * 10L + k))
                SnapshotTable.commit(spark, t,
                  fresh.toDF("id", "v"), overwrite = false)
                models(k) ++= fresh
              case 1 => // idempotent commit + replay
                val txn = s"chaos-$k-$step"
                issuedTxns.add(txn)
                val fresh = Seq((base + 100 + step) -> (step * 10L + k))
                val first = SnapshotTable.commitIdempotent(spark, t,
                  fresh.toDF("id", "v"), overwrite = false, txnId = txn)
                assert(first.nonEmpty, s"txn $txn failed to land")
                assert(SnapshotTable.commitIdempotent(spark, t,
                  fresh.toDF("id", "v"), overwrite = false, txnId = txn).isEmpty)
                models(k) ++= fresh
              case 2 => // serializable merge on thread-owned keys
                val up = (1 to 2).map(_ => (base + rnd.nextInt(50)) ->
                  (step * 100L + k)).toMap
                val del = models(k).keys.take(1).toSeq.filterNot(up.contains)
                SnapshotTable.merge(spark, t, up.toSeq.toDF("id", "v"),
                  del.toDF("id"), "id")
                models(k) --= del
                models(k) ++= up
              case 3 => // compaction (may no-op or abort on conflict)
                SnapshotTable.compact(spark, t, 1L << 20, 1L << 30)
              case 4 => // vacuum with the documented in-flight guard
                SnapshotTable.vacuum(spark, t, keepVersions = 8,
                  minAgeMs = 120000L)
              case 5 => // merge-on-read delete, thread-owned band only
                val matched = models(k).filter { case (_, v) => v % 2 == 0 }
                val published = SnapshotTable.deleteWhere(spark, t,
                  col("id") >= base && col("id") < base + 1000L &&
                    col("v") % 2 === 0)
                assert(matched.isEmpty || published.nonEmpty,
                  s"deleteWhere skipped matching rows of thread $k")
                models(k) --= matched.keySet
              case 6 => // absorb whatever vectors are outstanding
                // (content-preserving; conflict-abort is acceptable)
                SnapshotTable.absorbDeletes(spark, t)
              case 7 => // ordered CDC apply on thread-owned keys
                val ups = (1 to 2).map(_ => (base + rnd.nextInt(50)) ->
                  (rnd.nextInt(2000).toLong * 2 + 1)).toMap // odd: delete-proof
                SnapshotTable.mergeLatest(spark, t, ups.toSeq.toDF("id", "v"),
                  "id", Seq("v"))
                models(k) ++= ups.filter { case (i, v) =>
                  models(k).get(i).forall(_ < v) }
            }
          } catch { case e: Throwable => errors.add(e) }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    assert(errors.isEmpty, s"chaos errors: ${errors.asScala.map(_.toString)}")
    // final state == seed + union of disjoint per-thread models
    val want = (models.flatMap(_.toSeq).toMap + (0L -> 0L))
    val got = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "final table diverged from the union of models")
    // version history is a contiguous range (vacuum trims a prefix only)
    val vs = SnapshotTable.versions(spark, t)
    assert(vs == (vs.head to vs.last), s"version history has holes: $vs")
    // every issued txn landed exactly once and is still recognized
    val committed = SnapshotTable.committedTxns(spark, t)
    issuedTxns.asScala.foreach(txn =>
      assert(committed.contains(txn), s"txn $txn lost"))
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue)
      .contains(want.size.toLong))
  }
}
