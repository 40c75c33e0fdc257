package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Model-based property test: random sequences of snapshot operations
  * (append, overwrite, merge, idempotent replay) against an in-memory
  * reference model — after EVERY operation the live table must equal the
  * model, and every historical version must still read back exactly as
  * it did when it was current (immutability of published snapshots). */
class SnapshotModelSpec extends GraftSpec {

  test("random op sequences match the in-memory model at every version") {
    import spark.implicits._
    val rnd = new scala.util.Random(20240814L)
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-snapmodel$round-").toString
      val t = s"$dir/tbl"
      var model = Map.empty[Long, Long] // id -> v
      val history = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
      var replayed = 0

      def df(m: Map[Long, Long]) =
        if (m.isEmpty) Seq.empty[(Long, Long)].toDF("id", "v")
        else m.toSeq.toDF("id", "v")
      def readBack(version: Int): Map[Long, Long] =
        SnapshotTable.readAsOf(spark, t, version) match {
          case s if s.columns.isEmpty => Map.empty
          case s => s.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }

      for (step <- 1 to 12) {
        val ids = (1 to rnd.nextInt(5) + 1)
          .map(_ => rnd.nextInt(10).toLong).distinct
        val rows = ids.map(i => i -> (step * 100L + i)).toMap
        rnd.nextInt(4) match {
          case 0 => // append commit (new files shadow nothing in the
            // model sense only if ids are fresh — appends with repeated
            // ids would duplicate rows, so append only fresh ids)
            val fresh = rows.filter { case (k, _) => !model.contains(k) }
            SnapshotTable.commit(spark, t, df(fresh), overwrite = false)
            model = model ++ fresh
          case 1 => // overwrite commit
            SnapshotTable.commit(spark, t, df(rows), overwrite = true)
            model = rows
          case 2 => // merge: upsert `rows`, delete one random id
            val del = Seq(rnd.nextInt(10).toLong)
            SnapshotTable.merge(spark, t, df(rows),
              del.toDF("id"), "id")
            model = (model -- del) ++ rows
          case 3 => // idempotent commit + an immediate replay (no-op)
            val txn = s"t$step"
            val fresh = rows.filter { case (k, _) => !model.contains(k) }
            assert(SnapshotTable.commitIdempotent(spark, t, df(fresh),
              overwrite = false, txnId = txn).nonEmpty)
            assert(SnapshotTable.commitIdempotent(spark, t, df(rows),
              overwrite = false, txnId = txn).isEmpty)
            replayed += 1
            model = model ++ fresh
        }
        history += model
        val latest = SnapshotTable.versions(spark, t).last
        assert(latest == history.size,
          s"round $round step $step: version count ${latest} != ops ${history.size}")
        assert(readBack(Int.MaxValue) == model,
          s"round $round step $step: live table diverged from model")
      }
      // immutability: every historical version still reads as recorded
      history.zipWithIndex.foreach { case (m, i) =>
        assert(readBack(i + 1) == m,
          s"round $round: version ${i + 1} changed after later commits")
      }
      assert(replayed >= 0)
    }
  }
}
