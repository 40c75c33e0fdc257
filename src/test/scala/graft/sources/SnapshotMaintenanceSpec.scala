package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Maintenance-path contracts of [[SnapshotTable]]: constant driver cost
  * per idempotent commit (the long-running streaming sink bound), VACUUM
  * retention, additive schema evolution, and manifest behavior at a
  * 10k-file snapshot. */
class SnapshotMaintenanceSpec extends GraftSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("idempotent commits read O(1) manifests each, not O(versions)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint1-").toString
    val t = s"$dir/tbl"
    val n = 50
    val before = SnapshotTable.manifestReads.get()
    (0 until n).foreach { b =>
      assert(SnapshotTable.commitIdempotent(spark, t, Seq(b.toLong).toDF("id"),
        overwrite = false, txnId = s"batch-$b").contains(b + 1))
    }
    val perCommit = (SnapshotTable.manifestReads.get() - before).toDouble / n
    // one replay-check read + one base-list read per commit (shared
    // manifest); the quadratic regime this pins against would average
    // ~n/2 = 25 reads per commit by batch 50
    assert(perCommit <= 3.0,
      f"manifest reads per commit $perCommit%.1f — replay check is O(versions) again")
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) ==
      (0 until n).map(_.toLong).toSet)
    // replaying an early batch after 50 commits is still a cheap no-op
    val r0 = SnapshotTable.manifestReads.get()
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(999L).toDF("id"),
      overwrite = false, txnId = "batch-0").isEmpty)
    assert(SnapshotTable.manifestReads.get() - r0 <= 2)
  }

  test("vacuum DRY RUN: the real sweep's counts, nothing touched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maintd-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    val dry = graftSql(s"GRAFT VACUUM '$t' KEEP 2 DRY RUN").head()
    // the report: v1 would expire, its superseded file would go
    assert(dry.getLong(0) == 1L && dry.getLong(1) >= 1L)
    // ... and NOTHING happened: every version still resolves, every
    // file still reads
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2, 3))
    assert(ids(SnapshotTable.readAsOf(spark, t, 1)) == Set(1L))
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) ==
      Set(2L, 3L))
    // the real sweep then reports EXACTLY what the dry run promised
    val real = graftSql(s"GRAFT VACUUM '$t' KEEP 2").head()
    assert(real.getLong(0) == dry.getLong(0))
    assert(real.getLong(1) == dry.getLong(1))
    assert(SnapshotTable.versions(spark, t) == Seq(2, 3))
  }

  test("vacuum: retained versions unchanged, expired files and manifests gone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint2-").toString
    val t = s"$dir/tbl"
    // v1..v3 overwrites (each superseding all prior files), v4 append
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(4L).toDF("id"), overwrite = false)
    // a crashed writer's staged litter is also swept
    Seq(777L).toDF("id").write.parquet(s"$t/.staging-deadbeef")
    Seq(778L).toDF("id").write.parquet(s"$t/data/c-orphan00")
    def parquetFiles(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(t))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      } finally s.close()
    }
    val beforeFiles = parquetFiles().size
    val stats = SnapshotTable.vacuum(spark, t, keepVersions = 2)
    assert(stats.expiredManifests == 2) // v1, v2 expired
    assert(stats.deletedDataFiles >= 2) // v1+v2 data, both orphans
    assert(parquetFiles().size < beforeFiles)
    // retained reads byte-for-byte unchanged
    assert(SnapshotTable.versions(spark, t) == Seq(3, 4))
    assert(ids(SnapshotTable.readAsOf(spark, t, 3)) == Set(3L))
    assert(ids(SnapshotTable.readAsOf(spark, t, 4)) == Set(3L, 4L))
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == Set(3L, 4L))
    // expired versions are unresolvable, and re-running vacuum is a no-op
    intercept[IllegalArgumentException] { SnapshotTable.readAsOf(spark, t, 2) }
    val again = SnapshotTable.vacuum(spark, t, keepVersions = 2)
    assert(again == SnapshotTable.VacuumStats(0, 0))
    // the table keeps committing after a vacuum: next version is 5
    assert(SnapshotTable.commit(spark, t, Seq(5L).toDF("id"),
      overwrite = false) == 5)
    // txn replay detection survives vacuum (cumulative set rides the
    // retained latest manifest)
    val t2 = s"$dir/tbl2"
    SnapshotTable.commitIdempotent(spark, t2, Seq(1L).toDF("id"), false, "b0")
    SnapshotTable.commitIdempotent(spark, t2, Seq(2L).toDF("id"), false, "b1")
    SnapshotTable.vacuum(spark, t2, keepVersions = 1)
    assert(SnapshotTable.committedTxns(spark, t2) == Set("b0", "b1"))
    assert(SnapshotTable.commitIdempotent(spark, t2, Seq(9L).toDF("id"),
      false, "b0").isEmpty)
  }

  test("a crashed vacuum (manifests dropped, files not yet) completes on re-run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = true)
    SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = true)
    // simulate the crash point between phase 1 and phase 2: expire v1's
    // manifest by hand, leave its data files on disk
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t, "_commits", "v00001.txt"))
    assert(SnapshotTable.versions(spark, t) == Seq(2))
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == Set(2L))
    val stats = SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(stats.deletedDataFiles >= 1) // v1's stranded files swept now
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) == Set(2L))
  }

  test("schema evolution: adding a column, omitting a column, type change rejected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = false)
    // v2 adds `score`; v1's files must read NULL for it under v2+
    SnapshotTable.commit(spark, t,
      Seq((3L, "c", 0.5)).toDF("id", "v", "score"), overwrite = false)
    // v3 omits `v` entirely; the snapshot schema keeps it (NULL for new rows)
    SnapshotTable.commit(spark, t, Seq(Tuple1(4L)).toDF("id"), overwrite = false)
    val v1 = SnapshotTable.readAsOf(spark, t, 1)
    assert(v1.columns.toSeq == Seq("id", "v")) // pre-evolution schema pinned
    assert(v1.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
    val v2 = SnapshotTable.readAsOf(spark, t, 2)
    assert(v2.columns.toSeq == Seq("id", "v", "score"))
    assert(v2.filter(col("id") < 3).select("score").collect()
      .forall(_.isNullAt(0)))
    assert(v2.filter(col("id") === 3).select("score").head().getDouble(0) == 0.5)
    val v3 = SnapshotTable.readAsOf(spark, t, 3)
    assert(v3.columns.toSeq == Seq("id", "v", "score"))
    assert(v3.filter(col("id") === 4).head().isNullAt(1))
    assert(v3.count() == 4)
    // changing an existing column's type is refused
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, t,
        Seq((5L, 42L)).toDF("id", "v"), overwrite = false)
    }
    // an overwrite RESETS the schema to the committed frame's
    SnapshotTable.commit(spark, t, Seq(Tuple1(9L)).toDF("id"), overwrite = true)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .columns.toSeq == Seq("id"))
    // time travel still serves each epoch under its own schema
    assert(SnapshotTable.readAsOf(spark, t, 2).columns.length == 3)
  }

  test("the streaming-sink maintenance policy keeps an unbounded table bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint6-").toString
    val t = s"$dir/tbl"
    // the stream_snapshot_sink loop, deterministically: one idempotent
    // commit per micro-batch, compact+vacuum every 8th
    (0 until 25).foreach { id =>
      assert(SnapshotTable.commitIdempotent(spark, t, Seq(id.toLong).toDF("id"),
        overwrite = false, txnId = s"batch-$id").nonEmpty)
      if (id % 8 == 7) {
        SnapshotTable.compact(spark, t, smallFileBytes = 8L << 20,
          targetFileBytes = 128L << 20)
        SnapshotTable.vacuum(spark, t, keepVersions = 8)
      }
    }
    val res = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(ids(res) == (0L until 25L).toSet, "maintenance lost or duplicated rows")
    // bounded: versions = the 8 kept at the last sweep + the tail since;
    // files = one pack + the tail's singletons, not 25+ micro-batch files
    assert(SnapshotTable.versions(spark, t).size <= 12)
    assert(res.inputFiles.length <= 4,
      s"expected packed layout, got ${res.inputFiles.length} files")
    // exactly-once survives maintenance: an early batch's replay is
    // still recognized after its version was compacted AND vacuumed
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(999L).toDF("id"),
      overwrite = false, txnId = "batch-3").isEmpty)
    assert(ids(SnapshotTable.readAsOf(spark, t, Int.MaxValue)) ==
      (0L until 25L).toSet)
  }

  test("500 micro-batches: manifest stays O(live files + writers) LINES") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint8-").toString
    val t = s"$dir/tbl"
    val n = 500
    // one stable writer + monotone batch versions — the production sink
    // shape (stream_snapshot_sink), at a stream age two orders past the
    // spec'd sweeps: the regression this pins against is replay
    // metadata growing one line per micro-batch EVER committed
    // (quadratic manifest BYTES over the stream's life)
    (0 until n).foreach { id =>
      assert(SnapshotTable.commitIdempotent(spark, t,
        Seq(id.toLong).toDF("id").coalesce(1),
        overwrite = false, txnId = "sink", txnVersion = id).nonEmpty)
      if (id % 8 == 7) {
        SnapshotTable.compact(spark, t, smallFileBytes = 8L << 20,
          targetFileBytes = 128L << 20)
        SnapshotTable.vacuum(spark, t, keepVersions = 8)
      }
    }
    val res = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(res.count() == n.toLong, "maintenance lost or duplicated rows")
    val live = res.inputFiles.length
    // the NEWEST manifest, as raw lines: one per live file, ONE per
    // writer (#txnv), plus constant metadata (#schema, #ts, #ndv per
    // column) — NEVER one per batch ever committed
    val newest = SnapshotTable.versions(spark, t).last
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "tbl", "_commits", f"v$newest%05d.txt"))
    val txnLines = lines.asScala.count(l =>
      l.startsWith("#txnv:") || l.startsWith("#txn:"))
    assert(txnLines == 1, s"$txnLines replay-metadata lines for 1 writer")
    assert(lines.size <= live + 8,
      s"${lines.size} manifest lines for $live live files — " +
        "replay metadata is growing with stream age again")
    // the watermark is the highest batch; replaying any batch is a no-op
    assert(SnapshotTable.committedTxnVersions(spark, t) ==
      Map("sink" -> (n - 1).toLong))
    assert(SnapshotTable.commitIdempotent(spark, t, Seq(-1L).toDF("id"),
      overwrite = false, txnId = "sink", txnVersion = 123L).isEmpty)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == n.toLong)
  }

  test("history answers from manifests alone: versions, files, rows, txns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id")).repartition(2), overwrite = false)
    SnapshotTable.commitIdempotent(spark, t, Seq(99L).toDF("id"),
      overwrite = false, txnId = "b0")
    SnapshotTable.commitBucketed(spark, t, Seq(7L).toDF("id"),
      overwrite = true, nBuckets = 4, bucketCol = "id")
    val h = SnapshotTable.history(spark, t).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(5), Option(r.getString(6))))
    assert(h.length == 3)
    assert(h(0) == ((1, Some("append"), 2L, 10L, 0L, None)))
    assert(h(1) == ((2, Some("append"), 3L, 11L, 1L, None)))
    assert(h(2)._1 == 3 && h(2)._2.contains("overwrite") &&
      h(2)._4 == 1L && h(2)._5 == 1L &&
      h(2)._6.contains("4:id")) // overwrite, bucketed
  }

  test("a 10k-file snapshot: manifest round-trip sub-second, ONE scan planned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-maint5-").toString
    val t = s"$dir/tbl"
    // 8 real files; the 10k-entry manifest references them 1250x each —
    // manifest/plan cost is per ENTRY, so this measures the 10k regime
    // without a 10k-file write job
    SnapshotTable.commit(spark, t,
      spark.range(800).select(col("id")).repartition(8), overwrite = false)
    val v1lines = scala.io.Source.fromFile(s"$t/_commits/v00001.txt")
      .getLines().toList
    val schemaLine = v1lines.find(_.startsWith("#schema:")).get
    val entries = v1lines.filterNot(_.startsWith("#"))
    assert(entries.size == 8)
    val lines = schemaLine +: Seq.fill(1250)(entries).flatten
    assert(lines.size == 10001)
    val w0 = System.nanoTime()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_commits", "v00002.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val writeMs = (System.nanoTime() - w0) / 1e6
    val r0 = System.nanoTime()
    val snap = SnapshotTable.readAsOf(spark, t, 2)
    val resolveMs = (System.nanoTime() - r0) / 1e6
    assert(writeMs < 1000, f"10k-line manifest write took $writeMs%.0f ms")
    assert(resolveMs < 1000, f"10k-entry manifest resolve took $resolveMs%.0f ms")
    // ONE scan node over the whole 10k-entry list — no per-file plan blowup
    val plan = snap.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) <= 1)
    assert(snap.count() == 800L * 1250)
  }
}
