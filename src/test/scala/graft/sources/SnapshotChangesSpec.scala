package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Change feed ([[SnapshotTable.readChanges]]): pure appends serve the
  * zero-compute added-files fast path, rewrites fall back to an exact
  * multiset diff — so compaction (row-preserving) yields an EMPTY feed
  * while merges yield precise delete/insert pairs. */
class SnapshotChangesSpec extends GraftSpec {

  private def changes(t: String, a: Int, b: Int): Set[(String, Long)] =
    SnapshotTable.readChanges(spark, t, a, b)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("append fast path: the feed's scan reads only the added files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id")).repartition(4), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(100L, 101L).toDF("id"), overwrite = false)
    val feed = SnapshotTable.readChanges(spark, t, 1, 2)
    assert(changes(t, 1, 2) == Set(("insert", 100L), ("insert", 101L)))
    // zero-compute: the plan's file set is the appended files only, not
    // the 4 base files
    assert(feed.inputFiles.length <= 2,
      s"append feed read ${feed.inputFiles.length} files, expected the delta only")
    // identity and cross-version feeds
    assert(changes(t, 2, 2).isEmpty)
    assert(changes(t, 1, 1).isEmpty)
    val all = changes(t, 0, 2) // from before v1: everything is an insert
    assert(all.size == 102 && all.forall(_._1 == "insert"))
  }

  test("compaction is invisible to the feed; overwrites and merges are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq((4L, "d")).toDF("id", "v"), overwrite = false)
    // v3 = compaction: same rows, new layout -> EMPTY feed
    assert(SnapshotTable.compact(spark, t, 1L << 20, 1L << 30).contains(3))
    assert(SnapshotTable.readChanges(spark, t, 2, 3).count() == 0)
    // v4 = merge: upsert id 2 (b->B), delete id 3, insert id 9
    SnapshotTable.merge(spark, t,
      Seq((2L, "B"), (9L, "i")).toDF("id", "v"), Seq(3L).toDF("id"), "id")
    val got = SnapshotTable.readChanges(spark, t, 3, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      ("delete", 2L, "b"), ("insert", 2L, "B"),
      ("delete", 3L, "c"), ("insert", 9L, "i")))
    // spanning the compaction AND the merge from v1: net change only
    val span = SnapshotTable.readChanges(spark, t, 1, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(span == Set(
      ("delete", 2L, "b"), ("insert", 2L, "B"),
      ("delete", 3L, "c"), ("insert", 9L, "i"), ("insert", 4L, "d")))
  }

  test("an incremental consumer replaying the feed reconstructs every snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq((3L, "c")).toDF("id", "v"), overwrite = false)
    SnapshotTable.merge(spark, t,
      Seq((2L, "B")).toDF("id", "v"), Seq(1L).toDF("id"), "id")
    SnapshotTable.commit(spark, t, Seq((9L, "z")).toDF("id", "v"), overwrite = true)
    // fold the feed version by version against a driver-side multiset —
    // the MV-maintenance consumer shape
    var state = Map.empty[(Long, String), Int]
    val latest = SnapshotTable.versions(spark, t).last
    (0 until latest).foreach { v =>
      SnapshotTable.readChanges(spark, t, v, v + 1).collect().foreach { r =>
        val key = (r.getLong(1), r.getString(2))
        val d = if (r.getString(0) == "insert") 1 else -1
        state = state.updated(key, state.getOrElse(key, 0) + d)
      }
      val want = SnapshotTable.readAsOf(spark, t, v + 1).collect()
        .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length).toMap
      assert(state.filter(_._2 != 0) == want,
        s"feed replay diverged from snapshot at version ${v + 1}")
    }
  }

  test("a feed from an expired version refuses; from genesis still serves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    SnapshotTable.vacuum(spark, t, keepVersions = 2)
    // v1 is gone: a delta from it is uncomputable — silently reporting
    // the full table as inserts would corrupt an incremental consumer
    intercept[IllegalArgumentException] {
      SnapshotTable.readChanges(spark, t, 1, 3)
    }
    assert(changes(t, 2, 3) == Set(("insert", 3L)))
    assert(changes(t, 0, 3).size == 3) // genesis feed: explicit fromV = 0
  }

  test("followChanges: durable cursor + idempotent sink = exactly-once downstream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg7-").toString
    val t = s"$dir/src"
    val down = s"$dir/down"
    val cursor = s"$dir/cursor"
    def pump(): Option[(Int, Int)] =
      SnapshotTable.followChanges(spark, t, cursor) { (feed, from, to) =>
        SnapshotTable.commitIdempotent(spark, down,
          feed.filter(col("change_type") === "insert").drop("change_type"),
          overwrite = false, txnId = s"feed-$from-$to")
        ()
      }
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    assert(pump().contains((0, 2)))
    assert(ids(SnapshotTable.readAsOf(spark, down, Int.MaxValue)) == Set(1L, 2L, 3L))
    assert(pump().isEmpty) // caught up
    SnapshotTable.commit(spark, t, Seq(4L).toDF("id"), overwrite = false)
    // crash BETWEEN apply and cursor advance: the apply lands, the
    // cursor does not — restart must replay the same range and the
    // idempotent sink must swallow the duplicate
    intercept[RuntimeException] {
      SnapshotTable.followChanges(spark, t, cursor) { (feed, from, to) =>
        SnapshotTable.commitIdempotent(spark, down,
          feed.filter(col("change_type") === "insert").drop("change_type"),
          overwrite = false, txnId = s"feed-$from-$to")
        throw new RuntimeException("crash before cursor advance")
      }
    }
    assert(pump().contains((2, 3))) // replayed; txn id dedupes the apply
    assert(ids(SnapshotTable.readAsOf(spark, down, Int.MaxValue)) ==
      Set(1L, 2L, 3L, 4L), "replay duplicated or lost rows")
    assert(pump().isEmpty)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("rowCount answers from the manifest alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 123).select(col("id")).repartition(4), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(900L).toDF("id"), overwrite = false)
    assert(SnapshotTable.rowCount(spark, t, 1).contains(123L))
    assert(SnapshotTable.rowCount(spark, t, 2).contains(124L))
    assert(SnapshotTable.rowCount(spark, t, 2).get ==
      SnapshotTable.readAsOf(spark, t, 2).count())
  }

  test("cursor advance survives a stale tmp file and replaces atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg8-").toString
    val t = s"$dir/src"
    val cursor = s"$dir/cursor"
    SnapshotTable.commit(spark, t, Seq(1L).toDF("id"), overwrite = false)
    // simulate a consumer that crashed AFTER writing the tmp cursor but
    // BEFORE the replace: a stale .cursor.tmp must not wedge or corrupt
    // the next advance, and the real cursor must never transit through a
    // deleted state (the old delete-then-rename hazard)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".cursor.tmp"),
      "999".getBytes("UTF-8"))
    assert(SnapshotTable.followChanges(spark, t, cursor)((_, _, _) => ())
      .contains((0, 1)))
    def cursorValue: Int = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cursor)), "UTF-8").trim.toInt
    assert(cursorValue == 1)
    // second advance replaces the EXISTING cursor file in place
    SnapshotTable.commit(spark, t, Seq(2L).toDF("id"), overwrite = false)
    assert(SnapshotTable.followChanges(spark, t, cursor)((_, _, _) => ())
      .contains((1, 2)))
    assert(cursorValue == 2)
  }

  test("commit points refuse filesystems without atomic no-overwrite rename") {
    SnapshotTable.requireAtomicRenameScheme("hdfs")
    SnapshotTable.requireAtomicRenameScheme("viewfs")
    SnapshotTable.requireAtomicRenameScheme("file")
    for (scheme <- Seq("s3a", "s3", "gs", "abfs", "wasb", "oss"))
      intercept[IllegalArgumentException] {
        SnapshotTable.requireAtomicRenameScheme(scheme)
      }
  }

  test("evolution: a feed crossing a column-add serves the new schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq((1L, "a")).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), overwrite = false)
    val feed = SnapshotTable.readChanges(spark, t, 1, 2)
    assert(feed.columns.toSeq == Seq("change_type", "id", "v", "score"))
    val r = feed.collect()
    assert(r.length == 1 && r(0).getString(0) == "insert" &&
      r(0).getLong(1) == 2L && r(0).getDouble(3) == 0.5)
  }

  test("diff legs read only the CHANGED files, never the table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg9-").toString
    val t = s"$dir/tbl"
    // four k-banded files; the UPDATE touches exactly one of them
    (0 to 3).foreach(i => SnapshotTable.commit(spark, t,
      spark.range(i * 100, (i + 1) * 100)
        .select(col("id").as("k"), col("id").as("v")).repartition(1),
      overwrite = false))
    assert(SnapshotTable.updateWhere(spark, t, col("k") === 250L,
      Map("v" -> lit(-250L))).nonEmpty)
    val feed = SnapshotTable.readChanges(spark, t, 4, 5)
    val rows = feed.collect()
    // a single-commit UPDATE range arrives as PAIRED update images
    // (the #kind stamp), not an unkeyed delete+insert
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      == Set(("update_preimage", 250L, 250L),
        ("update_postimage", 250L, -250L)))
    // scan budget: one removed file + one rewritten file = 2 scans of
    // 1 file each — the three untouched files never enter the plan
    val scanned = feed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    assert(scanned <= 2, s"diff read $scanned files (expected <= 2 of 8)")
    // a MOR delete changes coverage of ONE file: the diff reads that
    // file (both sides) plus the vector — still never the table
    assert(SnapshotTable.deleteWhere(spark, t, col("k") === 50L).nonEmpty)
    val feed2 = SnapshotTable.readChanges(spark, t, 5, 6)
    assert(feed2.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == Set(("delete", 50L)))
    val scanned2 = feed2.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    assert(scanned2 <= 4,
      s"del-coverage diff read $scanned2 files (expected <= 4)")
  }

  test("above the threshold, the del-coverage diff stays distributed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chg10-").toString
    val t = s"$dir/tbl"
    (0 to 3).foreach(i => SnapshotTable.commit(spark, t,
      spark.range(i * 100, (i + 1) * 100)
        .select(col("id").as("k"), col("id").as("v")).repartition(1),
      overwrite = false))
    // MOR deletes touching two carried files
    assert(SnapshotTable.deleteWhere(spark, t,
      col("k") === 50L || col("k") === 250L).nonEmpty)
    val collected = SnapshotTable.readChanges(spark, t, 4, 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(collected == Set(("delete", 50L), ("delete", 250L)))
    // force the DISTRIBUTED path (threshold 0): identical multiset,
    // and the plan carries the LEFT SEMI intersection instead of a
    // driver-side path collect
    val saved = SnapshotTable.delDiffCollectRows
    try {
      SnapshotTable.delDiffCollectRows = 0L
      val feed = SnapshotTable.readChanges(spark, t, 4, 5)
      val plan = feed.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"distributed del diff must semi-join, plan:\n${plan.take(800)}")
      assert(feed.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == collected)
      // and the streamed per-commit slice agrees too
      val slice = SnapshotTable.streamChangeBatch(spark, t, 4, 5)
      assert(slice.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet == collected)
    } finally SnapshotTable.delDiffCollectRows = saved
  }

  test("GRAFT FOLLOW: SQL-only incremental consumption, exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg11-").toString
    val t = s"$dir/src"
    val down = s"$dir/down"
    val cursor = s"$dir/cursor"
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    def follow() = graftSql(
      s"GRAFT FOLLOW '$t' CURSOR '$cursor' INTO '$down'").collect()
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("id"), overwrite = false)
    SnapshotTable.commit(spark, t, Seq(3L).toDF("id"), overwrite = false)
    val r1 = follow()
    assert(r1.toSeq.map(r => (r.getInt(0), r.getInt(1))) == Seq((0, 2)))
    assert(ids(SnapshotTable.readAsOf(spark, down, Int.MaxValue))
      == Set(1L, 2L, 3L))
    assert(follow().isEmpty) // caught up: zero rows
    // the next slice consumes incrementally
    SnapshotTable.commit(spark, t, Seq(4L).toDF("id"), overwrite = false)
    assert(follow().toSeq.map(r => (r.getInt(0), r.getInt(1)))
      == Seq((2, 3)))
    assert(ids(SnapshotTable.readAsOf(spark, down, Int.MaxValue))
      == Set(1L, 2L, 3L, 4L))
    // a DELETE in the range refuses loudly and does NOT advance the
    // cursor — the feed is no longer inserts-only
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).nonEmpty)
    val e = intercept[IllegalStateException] { follow() }
    assert(e.getMessage.contains("not inserts-only"))
    assert(ids(SnapshotTable.readAsOf(spark, down, Int.MaxValue))
      == Set(1L, 2L, 3L, 4L)) // downstream untouched
    // the refusal left the cursor at 3: a retry refuses again (honest)
    intercept[IllegalStateException] { follow() }
  }

  test("GRAFT FOLLOW KEY: keyed CDC apply mirrors every DML verb") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg12-").toString
    val t = s"$dir/src"
    val down = s"$dir/mirror"
    val cursor = s"$dir/cursor"
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    def follow() = graftSql(
      s"GRAFT FOLLOW '$t' CURSOR '$cursor' INTO '$down' KEY (id)").collect()
    def mirror: Set[(Long, Long)] =
      SnapshotTable.readAsOf(spark, down, Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      overwrite = false)
    assert(follow().nonEmpty) // bootstrap from the genesis feed
    assert(mirror == Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // a range holding an UPDATE + a MOR DELETE + an append applies as
    // ONE keyed merge — the very shape append-mode FOLLOW refuses
    assert(SnapshotTable.updateWhere(spark, t, col("id") === 2L,
      Map("v" -> lit(-20L))).nonEmpty)
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).nonEmpty)
    SnapshotTable.commit(spark, t, Seq((4L, 40L)).toDF("id", "v"),
      overwrite = false)
    assert(follow().nonEmpty)
    assert(mirror == Set((2L, -20L), (3L, 30L), (4L, 40L)))
    // a row-preserving rewrite (absorb) diffs to an EMPTY feed: the
    // step advances the cursor without publishing a junk version
    val downV = SnapshotTable.versions(spark, down).size
    assert(SnapshotTable.absorbDeletes(spark, t).nonEmpty)
    assert(follow().nonEmpty)
    assert(SnapshotTable.versions(spark, down).size == downV,
      "no-op range published a junk downstream version")
    // crash BETWEEN apply and cursor advance: rewinding the cursor
    // replays the range — the idempotency watermark (and the keyed
    // apply being a function of source state) means nothing doubles
    val cursorNow = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cursor)), "UTF-8").trim
    assert(SnapshotTable.updateWhere(spark, t, col("id") === 3L,
      Map("v" -> lit(-30L))).nonEmpty)
    assert(follow().nonEmpty) // a single-commit UPDATE: paired images
    assert(mirror == Set((2L, -20L), (3L, -30L), (4L, 40L)))
    java.nio.file.Files.write(java.nio.file.Paths.get(cursor),
      cursorNow.getBytes("UTF-8")) // the simulated crash: stale cursor
    assert(follow().nonEmpty) // replays (cursorNow, latest]
    assert(mirror == Set((2L, -20L), (3L, -30L), (4L, 40L)),
      "replay doubled or regressed the mirror")
    assert(follow().isEmpty) // caught up
  }

  test("GRAFT CHANGES: the SQL doorway, rename-crossing, refusals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg4-").toString
    val t = s"$dir/tbl"
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((3L, 30L)).toDF("id", "v"), overwrite = false)
    // append chain: the feed IS the added file's rows
    val ins = graftSql(s"GRAFT CHANGES '$t' FROM 1 TO 2").collect()
    assert(ins.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      == Seq(("insert", 3L, 30L)))
    // TO omitted = latest
    assert(graftSql(s"GRAFT CHANGES '$t' FROM 1").count() == 1)
    // empty range: zero rows, correct schema
    val empty = graftSql(s"GRAFT CHANGES '$t' FROM 2 TO 2")
    assert(empty.columns.toSeq == Seq("change_type", "id", "v"))
    assert(empty.count() == 0)
    // rename-crossing (the ee3782c shape): a metadata-only rename plus
    // a delete in the window; the feed serves toV's LOGICAL names and
    // reads pre-rename files through their physical storage names
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    graftSql(s"GRAFT DELETE FROM '$t' WHERE id = 1").collect()
    val feed = graftSql(s"GRAFT CHANGES '$t' FROM 1 TO 4")
    assert(feed.columns.toSeq == Seq("change_type", "id", "val2"))
    val byType = feed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byType == Set(("insert", 3L, 30L), ("delete", 1L, 10L)))
    // from genesis: every live row is an insert
    assert(graftSql(s"GRAFT CHANGES '$t' FROM 0").count() == 2)
    // malformed/invalid ranges fail at sql() parse like native SQL
    intercept[IllegalArgumentException] {
      graftSql(s"GRAFT CHANGES '$t' FROM 4 TO 2") }
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      graftSql(s"GRAFT CHANGES '$t' FROM x") }
  }

  test("GRAFT CHANGES TILED: per-commit batch feed equals the stream's") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chg13-").toString
    val t = s"$dir/tbl"
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), overwrite = false)
    assert(SnapshotTable.updateWhere(spark, t, col("id") === 2L,
      Map("v" -> lit(-20L))).nonEmpty)
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).nonEmpty)
    // the PLAIN multi-commit form nets the delta with insert/delete
    // tags; TILED serves each commit's own diff under its own
    // _commit_version, the UPDATE arriving PAIRED — the stream's view
    val tiled = graftSql(s"GRAFT CHANGES '$t' FROM 0 TILED").collect()
      .map(r => (r.getLong(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("change_type")),
        r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("v")))).toSet
    assert(tiled == Set(
      (1L, "insert", 1L, 10L), (1L, "insert", 2L, 20L),
      (2L, "update_preimage", 2L, 20L),
      (2L, "update_postimage", 2L, -20L),
      (3L, "delete", 1L, 10L)))
    // TO omitted = latest; an empty tiled range is zero rows, right shape
    val empty = graftSql(s"GRAFT CHANGES '$t' FROM 3 TILED")
    assert(empty.columns.toSeq ==
      Seq("change_type", "id", "v", "_commit_version"))
    assert(empty.count() == 0)
    intercept[IllegalArgumentException] {
      graftSql(s"GRAFT CHANGES '$t' FROM 5 TO 2 TILED") }
  }
}
