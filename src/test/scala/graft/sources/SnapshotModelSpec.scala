package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Model-based property test: random sequences of snapshot operations
  * (append, overwrite, merge, idempotent replay, compact, vacuum,
  * merge-on-read deleteWhere, absorbDeletes, ordered mergeLatest)
  * against an in-memory reference model — after EVERY operation the
  * live table must equal the model, every RETAINED historical version
  * must still read back exactly as it did when it was current
  * (immutability of published snapshots — including versions whose
  * reads subtract deletion vectors), the metadata row count must match
  * (vector arithmetic included), and the per-step CHANGE FEED must
  * equal the model diff (compaction and absorb producing empty
  * feeds, deletes producing exact delete rows). */
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
      var earliestRetained = 1
      var replayed = 0
      // NDV model for column "v": the manifest sketch is CUMULATIVE
      // (values ever committed since the last overwrite), exact below
      // K=64, and UNKNOWN after any row-removing op (merge, deleteWhere
      // — a bottom-k sketch cannot subtract) until an overwrite resets
      var ndvSeen = Set.empty[Long]
      var ndvKnown = true
      var delsOutstanding = false
      // did THIS step land as an updateWhere commit? (its single-commit
      // feed arrives as paired update images — the #kind convention)
      var updateStep = false
      // current LOGICAL name of the value column: renames (case 10) flip
      // it v <-> w METADATA-ONLY — stats/NDV stay keyed to the physical
      // name, so every model assertion below must hold unchanged across
      // a rename, and later appends/merges arrive under the new name
      var vName = "v"

      def df(m: Map[Long, Long]) =
        if (m.isEmpty) Seq.empty[(Long, Long)].toDF("id", vName)
        else m.toSeq.toDF("id", vName)
      def readBack(version: Int): Map[Long, Long] =
        SnapshotTable.readAsOf(spark, t, version) match {
          case s if s.columns.isEmpty => Map.empty
          case s => s.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }

      for (step <- 1 to 16) {
        updateStep = false
        val ids = (1 to rnd.nextInt(5) + 1)
          .map(_ => rnd.nextInt(10).toLong).distinct
        val rows = ids.map(i => i -> (step * 100L + i)).toMap
        val before = model
        rnd.nextInt(12) match {
          case 0 => // append commit (fresh ids only — see round-8 note)
            val fresh = rows.filter { case (k, _) => !model.contains(k) }
            SnapshotTable.commit(spark, t, df(fresh), overwrite = false)
            model = model ++ fresh
            ndvSeen = ndvSeen ++ fresh.values
          case 1 => // overwrite commit
            SnapshotTable.commit(spark, t, df(rows), overwrite = true)
            model = rows
            ndvSeen = rows.values.toSet; ndvKnown = true
            delsOutstanding = false
          case 2 => // merge: upsert `rows`, delete one random id
            val del = Seq(rnd.nextInt(10).toLong)
            SnapshotTable.merge(spark, t, df(rows),
              del.toDF("id"), "id")
            model = (model -- del) ++ rows
            ndvKnown = false; delsOutstanding = false
          case 3 => // idempotent commit + an immediate replay (no-op)
            val txn = s"t$step"
            val fresh = rows.filter { case (k, _) => !model.contains(k) }
            assert(SnapshotTable.commitIdempotent(spark, t, df(fresh),
              overwrite = false, txnId = txn).nonEmpty)
            assert(SnapshotTable.commitIdempotent(spark, t, df(rows),
              overwrite = false, txnId = txn).isEmpty)
            replayed += 1
            model = model ++ fresh
            ndvSeen = ndvSeen ++ fresh.values
          case 4 => // compact: row-preserving maintenance; on a BUCKETED
            // layout (a case-9 relayout) plain compact declines and the
            // per-bucket pack takes over — also row-preserving. A no-op
            // (nothing publishable) normalizes to a filler append so
            // every step publishes exactly one version (keeps history
            // bookkeeping simple)
            SnapshotTable.compact(spark, t, 1L << 20, 1L << 30)
              .orElse(SnapshotTable.compactBuckets(spark, t)) match {
              case Some(_) => // content unchanged
              case None =>
                val filler = Map((900L + step) -> step.toLong)
                SnapshotTable.commit(spark, t, df(filler), overwrite = false)
                model = model ++ filler
                ndvSeen = ndvSeen ++ filler.values
            }
          case 5 => // vacuum THEN a normal append (vacuum publishes no
            // version; history before the cutoff becomes unreadable)
            val keep = rnd.nextInt(3) + 1
            val latest = SnapshotTable.versions(spark, t).lastOption.getOrElse(0)
            if (latest > 0) {
              SnapshotTable.vacuum(spark, t, keepVersions = keep)
              earliestRetained = math.max(earliestRetained, latest - keep + 1)
            }
            val fresh = rows.filter { case (k, _) => !model.contains(k) }
            SnapshotTable.commit(spark, t, df(fresh), overwrite = false)
            model = model ++ fresh
            ndvSeen = ndvSeen ++ fresh.values
          case 6 => // merge-on-read delete; a no-match delete (or a
            // fresh table) publishes no version — filler-append like
            // the compact no-op
            val m = step % 3
            val matched = model.filter { case (_, v) => v % 3 == m }
            val published =
              if (SnapshotTable.versions(spark, t).nonEmpty)
                SnapshotTable.deleteWhere(spark, t, col(vName) % 3 === m)
              else None
            if (published.nonEmpty) {
              model = model -- matched.keySet
              ndvKnown = false; delsOutstanding = true
            } else {
              assert(matched.isEmpty || SnapshotTable.versions(spark, t).isEmpty,
                s"round $round step $step: deleteWhere skipped a matching row")
              val filler = Map((800L + step) -> step.toLong)
              SnapshotTable.commit(spark, t, df(filler), overwrite = false)
              model = model ++ filler
              ndvSeen = ndvSeen ++ filler.values
            }
          case 7 => // absorb outstanding vectors: content-preserving
            // maintenance; nothing to absorb -> filler append
            SnapshotTable.absorbDeletes(spark, t) match {
              case Some(_) => delsOutstanding = false // content unchanged
              case None =>
                val filler = Map((700L + step) -> step.toLong)
                SnapshotTable.commit(spark, t, df(filler), overwrite = false)
                model = model ++ filler
                ndvSeen = ndvSeen ++ filler.values
            }
          case 8 => // ordered CDC apply: per-key winner, strictly-newer
            // only (ord values straddle the existing range so both the
            // apply and the too-old reject paths fire)
            val ups = ids.map(i => i -> rnd.nextInt(step * 100 + 200).toLong).toMap
            SnapshotTable.mergeLatest(spark, t, df(ups), "id", Seq(vName))
            model = model ++ ups.filter { case (k, v) =>
              model.get(k).forall(_ < v) }
            ndvKnown = false; delsOutstanding = false
          case 9 => // partition evolution: row-preserving relayout to
            // flat or bucketed (a relayout to HIVE dirs would make the
            // model's plain appends refuse by design — that layout's op
            // matrix has its own specs); NDV recollects from the live
            // rows, outstanding vectors are absorbed by the rewrite
            if (SnapshotTable.versions(spark, t).isEmpty) {
              val filler = Map((600L + step) -> step.toLong)
              SnapshotTable.commit(spark, t, df(filler), overwrite = false)
              model = model ++ filler
              ndvSeen = ndvSeen ++ filler.values
            } else {
              if (rnd.nextBoolean())
                SnapshotTable.relayout(spark, t)
              else SnapshotTable.relayout(spark, t, Nil, Some((3, "id")))
              delsOutstanding = false
              // the rewrite recollects the sketch from live rows — on a
              // zero-row table there is no sketch line (unknown)
              ndvSeen = model.values.toSet
              ndvKnown = model.nonEmpty
            }
          case 10 => // metadata-only RENAME of the value column (v <-> w):
            // row-preserving, version-publishing, stats/NDV carried on
            // the physical name — every assertion below must hold as if
            // nothing happened except the projection's name. A fresh
            // table (nothing to rename) takes the filler append.
            if (SnapshotTable.versions(spark, t).isEmpty) {
              val filler = Map((500L + step) -> step.toLong)
              SnapshotTable.commit(spark, t, df(filler), overwrite = false)
              model = model ++ filler
              ndvSeen = ndvSeen ++ filler.values
            } else {
              val to = if (vName == "v") "w" else "v"
              SnapshotTable.renameColumn(spark, t, vName, to)
              vName = to
            }
          case 11 => // UPDATE ... SET ... WHERE: matched rows take the
            // assignment in ONE serializable rewrite; refusal states
            // (fresh table, outstanding vectors, bucketed layout) and
            // the no-match case normalize to the filler append
            val bucketNow = SnapshotTable.versions(spark, t).nonEmpty &&
              SnapshotTable.history(spark, t).collect().last.get(6) != null
            val sel = step % 5
            val matched = model.filter { case (_, v) =>
              ((v % 5) + 5) % 5 == sel }
            if (SnapshotTable.versions(spark, t).isEmpty ||
                delsOutstanding || bucketNow || matched.isEmpty) {
              val filler = Map((400L + step) -> step.toLong)
              SnapshotTable.commit(spark, t, df(filler), overwrite = false)
              model = model ++ filler
              ndvSeen = ndvSeen ++ filler.values
            } else {
              assert(SnapshotTable.updateWhere(spark, t,
                col(vName) % 5 === sel,
                Map(vName -> (col(vName) + 100000L))).nonEmpty)
              updateStep = true
              model = model.map { case (k, v) =>
                k -> (if (((v % 5) + 5) % 5 == sel) v + 100000L else v) }
              ndvKnown = false // SET-column sketch dropped (values changed)
            }
        }
        history += model
        val latest = SnapshotTable.versions(spark, t).last
        assert(latest == history.size,
          s"round $round step $step: version count ${latest} != ops ${history.size}")
        assert(readBack(Int.MaxValue) == model,
          s"round $round step $step: live table diverged from model")
        // metadata row count agrees with the model
        assert(SnapshotTable.rowCount(spark, t, Int.MaxValue)
          .contains(model.size.toLong),
          s"round $round step $step: rowCount != model size")
        // metadata-served NDV of column v: cumulative-exact on pure
        // append/overwrite chains (sub-K), UNKNOWN after a row remover
        if (!delsOutstanding) {
          val r = SnapshotTable.metaAgg(spark, t, Int.MaxValue)
            .filter(col("column") === vName).head()
          val est =
            if (r.isNullAt(r.fieldIndex("est_ndv"))) None
            else Some(r.getAs[Double]("est_ndv"))
          if (ndvKnown && ndvSeen.size < 64)
            assert(est.contains(ndvSeen.size.toDouble),
              s"round $round step $step: est_ndv $est != ${ndvSeen.size}")
          else if (!ndvKnown)
            assert(est.isEmpty,
              s"round $round step $step: est_ndv must be unknown, got $est")
        }
        // the per-step change feed equals the model diff (empty when the
        // step was a row-preserving compaction)
        if (latest >= 2 && latest - 1 >= earliestRetained) {
          val feed = SnapshotTable.readChanges(spark, t, latest - 1, latest)
            .collect()
            .map(r => (r.getString(0), r.getLong(1) -> r.getLong(2))).toSet
          val prev = history(history.size - 2)
          val (insTag, delTag) =
            if (updateStep) ("update_postimage", "update_preimage")
            else ("insert", "delete")
          val want =
            (model.toSet -- prev.toSet).map(p => (insTag, p)) ++
              (prev.toSet -- model.toSet).map(p => (delTag, p))
          assert(feed == want,
            s"round $round step $step: change feed diverged from model diff")
        }
      }
      // immutability: every RETAINED historical version still reads as
      // recorded; expired versions refuse
      history.zipWithIndex.foreach { case (m, i) =>
        val v = i + 1
        if (v >= earliestRetained)
          assert(readBack(v) == m,
            s"round $round: version $v changed after later commits")
      }
      if (earliestRetained > 1)
        intercept[IllegalArgumentException] { readBack(earliestRetained - 1) }
      assert(replayed >= 0)
    }
  }
}
