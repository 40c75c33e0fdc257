package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** UPDATE ... SET ... WHERE — the third row-changing verb: selective
  * file rewrite with SQL UPDATE semantics (provably-TRUE rows only),
  * serializable publish, zone-map-pruned candidate probe. */
class SnapshotUpdateSpec extends GraftSpec {

  test("update changes matched rows only; no-match publishes nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-upd1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, Option(10L), "a"), (2L, Option(20L), "b"),
        (3L, Option.empty[Long], "c"))
        .toDF("k", "v", "s"), overwrite = false)
    // matched row updated, null-predicate row untouched (v > 15 is
    // NULL for k=3 — SQL UPDATE leaves it alone)
    val v = SnapshotTable.updateWhere(spark, t, col("v") > 15L,
      Map("s" -> lit("hit"), "v" -> (col("v") + 1L)))
    assert(v.contains(2))
    val after = SnapshotTable.readAsOf(spark, t, Int.MaxValue).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), r.getString(2))).toMap
    assert(after(1L) == (Some(10L), "a"))
    assert(after(2L) == (Some(21L), "hit"))
    assert(after(3L) == (None, "c"))
    // no row matches: None, NO version published
    assert(SnapshotTable.updateWhere(spark, t, col("v") > 1000L,
      Map("s" -> lit("x"))).isEmpty)
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2))
    // time travel: v1 still serves the pre-update rows
    assert(SnapshotTable.readAsOf(spark, t, 1)
      .filter(col("k") === 2L).head().getString(2) == "b")
    // the change feed for the update step is the exact row diff —
    // and a single-commit UPDATE range arrives as PAIRED update
    // images (the #kind convention), never an unkeyed retract+assert
    val feed = SnapshotTable.readChanges(spark, t, 1, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed ==
      Set(("update_preimage", 2L), ("update_postimage", 2L)))
  }

  test("selective rewrite: untouched files carried by reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upd2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitClustered(spark, t,
      spark.range(0, 4000).select(col("id").as("k"), (col("id") * 3).as("v")),
      overwrite = false, nFiles = 8, clusterCols = Seq("k"))
    val before = SnapshotTable.readAsOf(spark, t, 1).inputFiles.toSet
    assert(before.size == 8)
    // a narrow key band lives in ~1 stripe: the zone-map-pruned probe
    // finds it, and only that file is rewritten
    assert(SnapshotTable.updateWhere(spark, t,
      col("k") >= 1200L && col("k") < 1300L,
      Map("v" -> lit(-1L))).contains(2))
    val afterFiles = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .inputFiles.toSet
    val carried = before.intersect(afterFiles)
    assert(carried.size >= 6,
      s"expected most files carried by reference, kept ${carried.size} of 8")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("v") === -1L).count() == 100)
    assert(snap.count() == 4000)
    // survivors in the rewritten file kept their values
    assert(snap.filter(col("k") === 1199L).head().getLong(1) == 3597L)
  }

  test("constraints gate updates; bucketed and vector-carrying tables refuse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-upd3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), overwrite = false)
    SnapshotTable.addConstraint(spark, t, "v_pos", "v > 0")
    // an update whose result violates the CHECK is refused atomically
    intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, t, col("k") === 1L,
        Map("v" -> lit(-5L)))
    }
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter(col("k") === 1L).head().getLong(1) == 10L)
    // outstanding deletion vectors: refuse with the escape hatch named
    SnapshotTable.deleteWhere(spark, t, col("k") === 2L)
    val delErr = intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, t, col("k") === 1L,
        Map("v" -> lit(99L)))
    }
    assert(delErr.getMessage.contains("absorbDeletes"))
    SnapshotTable.absorbDeletes(spark, t)
    assert(SnapshotTable.updateWhere(spark, t, col("k") === 1L,
      Map("v" -> lit(99L))).nonEmpty)
    // bucketed layout: refuse (rewrite would shear bucket-id naming)
    val tb = s"$dir/bucketed"
    SnapshotTable.commitBucketed(spark, tb,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v")),
      overwrite = false, nBuckets = 4, bucketCol = "k")
    val bErr = intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, tb, col("k") === 1L,
        Map("v" -> lit(0L)))
    }
    assert(bErr.getMessage.contains("relayout"))
  }

  test("partitioned tables: an update migrates rows across directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upd4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      spark.range(0, 100).select((col("id") % 4).as("p"), col("id").as("v")),
      "p", overwrite = false)
    // move every p=3 row to p=7: the rewrite re-lands under the new
    // value's directory and directory pruning keeps composing
    assert(SnapshotTable.updateWhere(spark, t, col("p") === 3L,
      Map("p" -> lit(7L))).nonEmpty)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("p") === 3L).count() == 0)
    assert(snap.filter(col("p") === 7L).count() == 25)
    assert(snap.count() == 100)
    assert(snap.inputFiles.exists(_.contains("p=7")),
      "migrated rows must live under the new hive directory")
  }

  test("updates compose with renamed columns (physical rewrite)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upd5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 100).select(col("id").as("k"), (col("id") * 3).as("v")),
      overwrite = false)
    SnapshotTable.renameColumn(spark, t, "v", "val2")
    assert(SnapshotTable.updateWhere(spark, t, col("k") < 10L,
      Map("val2" -> lit(-1L))).nonEmpty)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.filter(col("val2") === -1L).count() == 10)
    assert(snap.filter(col("k") === 50L).head().getLong(1) == 150L)
    // the rewritten file still stores the PHYSICAL name
    val raw = spark.read.parquet(snap.inputFiles.map(_.stripPrefix("file:")): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("val2"))
  }

  test("GRAFT UPDATE: the SQL doorway, multi-assignment, refusals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-upd6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s"),
      overwrite = false)
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    // multi-assignment with commas INSIDE expressions (concat args)
    assert(graftSql(s"GRAFT UPDATE '$t' SET v = v + 100, " +
      "s = concat(s, '!', 'x') WHERE k = 2").head().getInt(0) == 2)
    val r = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter($"k" === 2L).head()
    assert(r.getLong(1) == 120L && r.getString(2) == "b!x")
    // no match → NULL version
    assert(graftSql(s"GRAFT UPDATE '$t' SET v = 0 WHERE k = 99").head()
      .isNullAt(0))
    // malformed assignment / duplicate target refused at parse time
    intercept[IllegalArgumentException] {
      graftSql(s"GRAFT UPDATE '$t' SET nonsense WHERE k = 1")
    }
    intercept[IllegalArgumentException] {
      graftSql(s"GRAFT UPDATE '$t' SET v = 1, v = 2 WHERE k = 1")
    }
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      graftSql(s"GRAFT UPDATE '$t' SET v = ( WHERE k = 1")
    }
  }

  test("GRAFT UPDATE splits on the TOP-LEVEL WHERE only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-upd7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s"),
      overwrite = false)
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    // a string literal containing ' where ' must NOT shear the split
    assert(graftSql(s"GRAFT UPDATE '$t' SET s = 'not where you think' " +
      "WHERE k = 1").head().getInt(0) == 2)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter($"k" === 1L).head().getString(2) == "not where you think")
    // WHERE inside parens (CASE guard shape) belongs to the expression
    assert(graftSql(s"GRAFT UPDATE '$t' SET v = (v + length(' where ')) " +
      "WHERE k = 2").head().getInt(0) == 3)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter($"k" === 2L).head().getLong(1) == 27L)
    // no top-level WHERE at all: targeted parse error, not a mis-split
    val e = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      graftSql(s"GRAFT UPDATE '$t' SET v = (1 WHERE 2)")
    }
    assert(e.getMessage.contains("WHERE"))
    // the scanner unit contract: first top-level WHERE is the boundary
    assert(GraftSqlParser.splitSetWhere(
      "a = (SELECT max(v) FROM w WHERE z = 1) WHERE k = 1") ==
      ("a = (SELECT max(v) FROM w WHERE z = 1)", "k = 1"))
    assert(GraftSqlParser.splitSetWhere("a = ' where ' WHERE k = 1") ==
      ("a = ' where '", "k = 1"))
    assert(GraftSqlParser.splitSetWhere("a = 1 WHERE k IN (1, 2)") ==
      ("a = 1", "k IN (1, 2)"))
    // backslash-escaped quote (Spark's default string mode): the
    // literal does not end at \' — split at the statement's own WHERE
    assert(GraftSqlParser.splitSetWhere(
      """a = 'don\'t know where' WHERE k = 1""") ==
      ("""a = 'don\'t know where'""", "k = 1"))
    // end-to-end through the parser + delegate expression parser
    assert(graftSql(s"GRAFT UPDATE '$t' SET s = 'don\\'t know where' " +
      "WHERE k = 1").head().getInt(0) == 4)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter($"k" === 1L).head().getString(2) == "don't know where")
  }
}
