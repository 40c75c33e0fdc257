package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** The pure-configuration deployment path: a session built with
  * `withExtensions(new GraftExtensions)` (what
  * `spark.sql.extensions=graft.functions.GraftExtensions` does at
  * startup) must expose every custom expression to SQL and plan the
  * as-of operator — with NO library-side `register()` call anywhere.
  * Forked sbt tests run suites sequentially, so temporarily clearing the
  * default session to force a genuinely new one is safe here.
  */
class ExtensionsSpec extends GraftSpec {

  test("conf-loaded extensions expose SQL functions and the asof strategy") {
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base, "builder must have created a fresh session")
      // SQL-only user: functions resolve through the injected registry
      val h = s2.sql("SELECT graft_poly_hash('abc') AS h").head().getLong(0)
      assert(h === PolyHash.hash(UTF8String.fromString("abc")))
      val c = s2.sql(
        """SELECT graft_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                    array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(c - 0.96) < 1e-9)
      // the generator + sketch families must resolve from conf alone too
      val nw = s2.sql(
        "SELECT i, sh FROM (SELECT 'a b c d' AS t) LATERAL VIEW graft_ngram_windows(t, 3) g AS i, sh")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(nw === Seq((0L, "a b c"), (1L, "b c d")))
      assert(s2.sql("SELECT graft_portable_simhash('x y z', 60, 1000000007) AS s")
        .head().getLong(0) ===
        SketchOps.portableSimhash(
          org.apache.spark.unsafe.types.UTF8String.fromString("x y z"), 60, 1000000007L))
      // whole-operator surface: the injected planner strategy (NOT
      // experimental.extraStrategies) must plan the asof node
      assert(s2.experimental.extraStrategies.isEmpty)
      import s2.implicits._
      val quotes = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "t", "tag")
      val trades = Seq((1L, 15L), (1L, 25L)).toDF("k", "t")
      val planned = graft.plans.AsofJoin.asof(trades, quotes, "k", "k", "t", "t")
      // asof() defensively calls register(); prove the CONF path alone
      // suffices by planning with extraStrategies stripped again
      s2.experimental.extraStrategies = Nil
      val got = planned.select($"k", $"t", $"tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._2)
      assert(got.toSeq === Seq((1L, 15L, "a"), (1L, 25L, "b")))
      assert(planned.queryExecution.executedPlan.toString.contains("AsofJoin"))
    } finally {
      s2.experimental.extraStrategies = Nil
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected parser serves GRAFT RESTORE / CLONE / VACUUM in pure SQL") {
    import graft.sources.SnapshotTable
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-sql")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcmd-").toString
      val t = s"$dir/tbl"
      val c = s"$dir/cln"
      SnapshotTable.commit(s2, t, Seq(1L, 2L).toDF("id"), overwrite = false)
      SnapshotTable.commit(s2, t, Seq(9L).toDF("id"), overwrite = true)
      // pure-SQL rollback
      assert(s2.sql(s"GRAFT RESTORE '$t' VERSION AS OF 1").head().getInt(0) == 3)
      assert(SnapshotTable.readAsOf(s2, t, 3).select("id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L))
      // pure-SQL shallow clone at an explicit version
      assert(s2.sql(s"GRAFT CLONE '$t' TO '$c' VERSION AS OF 2")
        .head().getInt(0) == 1)
      assert(SnapshotTable.readAsOf(s2, c, 1).select("id").collect()
        .map(_.getLong(0)).toSet == Set(9L))
      // pure-SQL vacuum reports (expired manifests, deleted files)
      val vac = s2.sql(s"GRAFT VACUUM '$t' KEEP 1").head()
      assert(vac.getLong(0) == 2L, s"expected 2 expired versions, got $vac")
      // pure-SQL history inspection: one row per surviving version
      val hist = s2.sql(s"GRAFT HISTORY '$t'").collect()
      assert(hist.map(_.getInt(0)).toSeq == Seq(3),
        s"after KEEP 1 only the restored version remains: ${hist.mkString}")
      assert(hist.head.getLong(3) == 2L) // n_rows of the restored state
      // pure-SQL OPTIMIZE: two tiny commits bin-pack into one file
      val t2 = s"$dir/tbl2"
      SnapshotTable.commit(s2, t2, Seq(1L, 2L).toDF("id"), overwrite = false)
      SnapshotTable.commit(s2, t2, Seq(3L).toDF("id"), overwrite = false)
      assert(s2.sql(s"GRAFT OPTIMIZE '$t2'").head().getInt(0) == 3)
      assert(SnapshotTable.readAsOf(s2, t2, 3).select("id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
      // re-OPTIMIZE is a no-op: NULL version, nothing republished
      assert(s2.sql(s"GRAFT OPTIMIZE '$t2'").head().isNullAt(0))
      // pure-SQL OPTIMIZE ZORDER BY: whole-snapshot Morton rewrite
      val t3 = s"$dir/tbl3"
      SnapshotTable.commit(s2,
        t3, s2.range(0, 64).selectExpr("id % 8 AS x", "id / 8 AS y", "id"),
        overwrite = false)
      assert(s2.sql(s"GRAFT OPTIMIZE '$t3' ZORDER BY (x, y) FILES 2")
        .head().getInt(0) == 2)
      assert(SnapshotTable.readAsOf(s2, t3, 2).count() == 64)
      assert(SnapshotTable.readAsOf(s2, t3, 2).inputFiles.length == 2)
      // the n-dim form: 3 dimensions through the same verb
      assert(s2.sql(s"GRAFT OPTIMIZE '$t3' ZORDER BY (x, y, id) FILES 2")
        .head().getInt(0) == 3)
      assert(SnapshotTable.readAsOf(s2, t3, 3).count() == 64)
      // a duplicate dimension is refused; a 5-dim list never parses
      // (the grammar caps at 4 — it falls to the targeted usage hint)
      val zdup = intercept[IllegalArgumentException] {
        s2.sql(s"GRAFT OPTIMIZE '$t3' ZORDER BY (x, y, X) FILES 2").collect()
      }
      assert(zdup.getMessage.contains("duplicate"))
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT OPTIMIZE '$t3' ZORDER BY (x, y, id, x, y) FILES 2")
      }
      // pure-SQL STATS: metadata-served exact column statistics
      val st = s2.sql(s"GRAFT STATS '$t2'").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(st("id").getLong(2) == 3L && st("id").getLong(3) == 3L)
      assert(st("id").getLong(4) == 1L && st("id").getLong(5) == 3L)
      assert(st("id").getBoolean(10))
      // metadata-served NDV: 3 distinct ids, exact below the sketch K
      assert(st("id").getDouble(11) == 3.0)
      // pure-SQL ANALYZE: a merge drops the NDV sketch (bottom-k cannot
      // subtract); the verb recollects and publishes a stats-only commit
      SnapshotTable.merge(s2, t2, Seq(4L).toDF("id"),
        s2.emptyDataset[Long].toDF("id"), "id")
      assert(s2.sql(s"GRAFT STATS '$t2'").collect()
        .find(_.getString(0) == "id").get.isNullAt(11),
        "post-merge NDV must be unknown")
      assert(!s2.sql(s"GRAFT ANALYZE '$t2'").head().isNullAt(0))
      val stA = s2.sql(s"GRAFT STATS '$t2'").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(stA("id").getDouble(11) == 4.0 && stA("id").getLong(5) == 4L,
        s"ANALYZE must restore NDV and bounds: ${stA("id")}")
      // pure-SQL ABSORB DELETES: materializes outstanding vectors,
      // NULL when there is nothing to absorb
      val t5 = s"$dir/tbl5"
      SnapshotTable.commit(s2, t5, (1L to 6L).toDF("id"), overwrite = false)
      SnapshotTable.deleteWhere(s2, t5, $"id" === 4L)
      assert(s2.sql(s"GRAFT ABSORB DELETES '$t5'").head().getInt(0) == 3)
      assert(SnapshotTable.readAsOf(s2, t5, 3).collect()
        .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L, 6L))
      assert(s2.sql(s"GRAFT ABSORB DELETES '$t5'").head().isNullAt(0))
      // VACUUM MIN AGE: expired manifests drop, but young files survive
      // the in-flight-commit guard
      val vac5 = s2.sql(s"GRAFT VACUUM '$t5' KEEP 1 MIN AGE 3600000").head()
      assert(vac5.getLong(0) == 2L && vac5.getLong(1) == 0L,
        s"expected 2 expired manifests and 0 young files deleted: $vac5")
      // wall-clock time travel: TIMESTAMP AS OF resolves against the
      // manifests' commit stamps (UTC)
      val t4 = s"$dir/tbl4"
      SnapshotTable.commit(s2, t4, Seq(1L).toDF("id"), overwrite = false)
      Thread.sleep(15) // commit stamps are millis; separate them
      SnapshotTable.commit(s2, t4, Seq(2L).toDF("id"), overwrite = false)
      val ts1 = s2.sql(s"GRAFT HISTORY '$t4'").collect()
        .find(_.getInt(0) == 1).get.getLong(8)
      val tsStr = java.time.Instant.ofEpochMilli(ts1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val st4 = s2.sql(s"GRAFT STATS '$t4' TIMESTAMP AS OF '$tsStr'")
        .collect().map(r => r.getString(0) -> r).toMap
      assert(st4("id").getLong(2) == 1L, "v1 had one row")
      // epoch-millis literal works too, and CLONE pins the same version
      val c4 = s"$dir/cln4"
      assert(s2.sql(s"GRAFT CLONE '$t4' TO '$c4' TIMESTAMP AS OF '$ts1'")
        .head().getInt(0) == 1)
      assert(SnapshotTable.readAsOf(s2, c4, 1).collect()
        .map(_.getLong(0)).toSet == Set(1L))
      // RESTORE by timestamp rolls the table back to v1's state
      assert(s2.sql(s"GRAFT RESTORE '$t4' TIMESTAMP AS OF '$tsStr'")
        .head().getInt(0) == 3)
      assert(SnapshotTable.readAsOf(s2, t4, Int.MaxValue).collect()
        .map(_.getLong(0)).toSet == Set(1L))
      // a pre-genesis timestamp refuses rather than flooring
      intercept[IllegalArgumentException] {
        s2.sql(s"GRAFT STATS '$t4' TIMESTAMP AS OF '2000-01-01'").collect()
      }
      // a malformed timestamp gets the targeted hint
      val badTs = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT STATS '$t4' TIMESTAMP AS OF 'yesterday'")
      }
      assert(badTs.getMessage.contains("epoch millis"))
      // calendar-invalid fields match the shape regex but must get the
      // SAME targeted hint, not a raw DateTimeParseException
      val badCal = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT STATS '$t4' TIMESTAMP AS OF '2026-02-31'")
      }
      assert(badCal.getMessage.contains("epoch millis"))
      // a MALFORMED GRAFT statement gets a targeted usage message, not
      // the delegate ANTLR parser's generic "syntax error at GRAFT"
      val mal = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT VACUUM '$t'") // missing KEEP clause
      }
      assert(mal.getMessage.contains("GRAFT VACUUM '<dir>' KEEP <n>"),
        s"expected the GRAFT usage hint, got: ${mal.getMessage}")
      val unk = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql("GRAFT FROBNICATE 'x'")
      }
      assert(unk.getMessage.contains("supported grammars"))
      // ordinary SQL still parses through the delegate untouched
      assert(s2.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
      assert(s2.sql("SELECT graft_poly_hash('abc') IS NOT NULL AS ok")
        .head().getBoolean(0))
      // TIMESTAMP AS OF wall-clock literals resolve in the SESSION's
      // spark.sql.session.timeZone (the Delta rule), not pinned UTC: the
      // same literal names a point 9 hours EARLIER under a UTC+9 zone,
      // so a stamp that lands between two commits under UTC falls before
      // genesis under +09:00 — and a SET in the same session takes
      // effect at the next parse
      val t6 = s"$dir/tbl6"
      SnapshotTable.commit(s2, t6, Seq(1L).toDF("id"), overwrite = false)
      Thread.sleep(15)
      SnapshotTable.commit(s2, t6, Seq(2L).toDF("id"), overwrite = false)
      val stamp1 = s2.sql(s"GRAFT HISTORY '$t6'").collect()
        .find(_.getInt(0) == 1).get.getLong(8)
      val litUtc = java.time.Instant.ofEpochMilli(stamp1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val stUtc = s2.sql(s"GRAFT STATS '$t6' TIMESTAMP AS OF '$litUtc'")
        .collect().map(r => r.getString(0) -> r).toMap
      assert(stUtc("id").getLong(2) == 1L, "UTC session: literal pins v1")
      s2.conf.set("spark.sql.session.timeZone", "UTC+09:00")
      try {
        // same literal, +09:00 session: it now denotes stamp1 − 9h,
        // which precedes genesis — the resolver must refuse, proving
        // the zone was honored rather than silently re-pinned to UTC
        val shifted = intercept[IllegalArgumentException] {
          s2.sql(s"GRAFT STATS '$t6' TIMESTAMP AS OF '$litUtc'").collect()
        }
        assert(shifted.getMessage.contains("earliest retained commit"),
          s"expected a pre-genesis refusal, got: ${shifted.getMessage}")
      } finally s2.conf.set("spark.sql.session.timeZone", "UTC")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("GRAFT MERGE INTO / DELETE FROM: the SQL DML doorway") {
    import graft.sources.SnapshotTable
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-dml")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sqldml-").toString
      val t = s"$dir/tbl"
      SnapshotTable.commit(s2, t,
        (1L to 8L).map(i => (i, i * 10)).toDF("k", "v"), overwrite = false)
      // upsert k∈{2,3} with new v, insert k=9, delete k∈{5,6} — one
      // serializable commit, driven purely by SQL text
      Seq((2L, 200L), (3L, 300L), (9L, 900L)).toDF("k", "v")
        .createOrReplaceTempView("dml_ups")
      Seq(5L, 6L).toDF("k").createOrReplaceTempView("dml_del")
      val v = s2.sql(
        s"GRAFT MERGE INTO '$t' USING (SELECT k, v FROM dml_ups) ON k " +
          "DELETE (SELECT k FROM dml_del)").head().getInt(0)
      assert(v == 2)
      val after = SnapshotTable.readAsOf(s2, t, Int.MaxValue).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after == Map(1L -> 10L, 2L -> 200L, 3L -> 300L, 4L -> 40L,
        7L -> 70L, 8L -> 80L, 9L -> 900L))
      // the USING subquery may contain joins with their own ON — the
      // grammar anchors on the LAST `) ON <ident>`
      val v2 = s2.sql(
        s"GRAFT MERGE INTO '$t' USING (SELECT a.k, a.v * 2 AS v " +
          "FROM dml_ups a JOIN dml_ups b ON a.k = b.k WHERE a.k = 9) ON k")
        .head().getInt(0)
      assert(v2 == 3)
      assert(SnapshotTable.readAsOf(s2, t, Int.MaxValue)
        .filter($"k" === 9L).head().getLong(1) == 1800L)
      // DELETE FROM: merge-on-read vector delete; SQL semantics — only
      // provably-TRUE rows go (the k=100 null-v row survives v >= 200)
      SnapshotTable.commit(s2, t,
        Seq((100L, Option.empty[Long])).toDF("k", "v"), overwrite = false)
      val dv = s2.sql(s"GRAFT DELETE FROM '$t' WHERE v >= 200").head()
      assert(!dv.isNullAt(0))
      val kept = SnapshotTable.readAsOf(s2, t, Int.MaxValue).collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(1L, 4L, 7L, 8L, 100L),
        s"null-v and sub-200 rows survive: $kept")
      // nothing matched → NULL version, nothing published
      assert(s2.sql(s"GRAFT DELETE FROM '$t' WHERE v >= 200").head()
        .isNullAt(0))
      // a missing key column in USING is refused with the key named
      val bad = intercept[IllegalArgumentException] {
        s2.sql(s"GRAFT MERGE INTO '$t' USING (SELECT 1 AS x) ON k").collect()
      }
      assert(bad.getMessage.contains("key 'k'"))
      // a malformed USING subquery fails at PARSE time like native SQL
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT MERGE INTO '$t' USING (SELEC nope) ON k")
      }
      // --- the pure-SQL governance/evolution verbs ---
      val t2 = s"$dir/tbl2"
      SnapshotTable.commit(s2, t2,
        (1L to 6L).map(i => (i, i * 10)).toDF("k", "v"), overwrite = false)
      // ADD CHECK validates current data, then gates commits
      assert(s2.sql(s"GRAFT ADD CHECK '$t2' v_pos (v > 0)").head()
        .getInt(0) == 2)
      intercept[IllegalArgumentException] {
        SnapshotTable.commit(s2, t2, Seq((9L, -1L)).toDF("k", "v"),
          overwrite = false)
      }
      // a malformed CHECK expression fails at PARSE time
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT ADD CHECK '$t2' bad (v > )")
      }
      // DROP CHECK: version on success, NULL when absent
      assert(s2.sql(s"GRAFT DROP CHECK '$t2' v_pos").head().getInt(0) == 3)
      assert(s2.sql(s"GRAFT DROP CHECK '$t2' v_pos").head().isNullAt(0))
      // RENAME + DROP COLUMN in pure SQL; dropped names stay reserved
      assert(s2.sql(s"GRAFT RENAME COLUMN '$t2' v TO score").head()
        .getInt(0) == 4)
      assert(SnapshotTable.readAsOf(s2, t2, Int.MaxValue).columns.toSeq ==
        Seq("k", "score"))
      assert(s2.sql(s"GRAFT DROP COLUMN '$t2' score").head().getInt(0) == 5)
      val haunted = intercept[IllegalArgumentException] {
        SnapshotTable.commit(s2, t2,
          Seq((1L, 1L)).toDF("k", "score"), overwrite = false)
      }
      assert(haunted.getMessage.contains("dropped"))
      // BLOOM declaration round-trips; () clears it
      assert(s2.sql(s"GRAFT BLOOM '$t2' (k)").head().getInt(0) == 6)
      assert(s2.sql(s"GRAFT BLOOM '$t2' ()").head().getInt(0) == 7)
      // DESCRIBE / CHECKS: the SQL introspection pair — physical names,
      // bloom flags, layout roles, and named constraints, one manifest
      // read each (asserted AFTER rename/bloom/check ops below)
      // ADD COLUMN: metadata-only — old rows read NULL, the declared
      // type is the contract the next append must match or widen
      assert(s2.sql(s"GRAFT ADD COLUMN '$t2' price DECIMAL(10, 2)")
        .head().getInt(0) == 8)
      val sc2 = SnapshotTable.readAsOf(s2, t2, Int.MaxValue).schema
      assert(sc2("price").dataType ==
        org.apache.spark.sql.types.DecimalType(10, 2))
      assert(SnapshotTable.readAsOf(s2, t2, Int.MaxValue)
        .filter($"price".isNotNull).count() == 0)
      // re-adding an existing or dropped name refuses; malformed type
      // fails at parse time through the delegate
      intercept[IllegalArgumentException] {
        s2.sql(s"GRAFT ADD COLUMN '$t2' price BIGINT").collect()
      }
      intercept[IllegalArgumentException] {
        s2.sql(s"GRAFT ADD COLUMN '$t2' score BIGINT").collect()
      }
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        s2.sql(s"GRAFT ADD COLUMN '$t2' x NOTATYPE")
      }
      // GRAFT DESCRIBE: k was renamed away from nothing (plain), price
      // added; declare a bloom + a check and read both back in SQL
      s2.sql(s"GRAFT BLOOM '$t2' (k)").collect()
      s2.sql(s"GRAFT ADD CHECK '$t2' k_pos (k > 0)").collect()
      val desc = s2.sql(s"GRAFT DESCRIBE '$t2'").collect()
        .map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
      assert(desc("k") == (("bigint", "k", true)))
      assert(desc("price") == (("decimal(10,2)", "price", false)))
      val checks = s2.sql(s"GRAFT CHECKS '$t2'").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(checks == Map("k_pos" -> "k > 0"))
      // a renamed column shows its physical storage name
      val t3d = s"$dir/tbl3d"
      SnapshotTable.commit(s2, t3d,
        (1L to 3L).map(i => (i, i)).toDF("a", "b"), overwrite = false)
      s2.sql(s"GRAFT RENAME COLUMN '$t3d' a TO aa").collect()
      val d2 = s2.sql(s"GRAFT DESCRIBE '$t3d'").collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      assert(d2 == Map("aa" -> "a", "b" -> "b"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
