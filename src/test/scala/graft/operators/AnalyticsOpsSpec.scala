package graft.operators

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ground truth for the warehouse-analytics pack: the profiler against a
  * hand-computed fixture, CDC classification re-derived independently,
  * cohort/OHLC cells against tiny event fixtures with deliberate
  * timestamp ties, integer PageRank against a driver-side naive walk of
  * the SAME graph, and priority sampling against a scalar re-computation
  * of every hash. */
class AnalyticsOpsSpec extends GraftSpec {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def writeEvents(rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-an-ev-").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), eventsSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("profiler: every cell of a hand-computed fixture") {
    val dir = writeDocs(Seq(
      (1L, "abc", "en", "web", 3L),
      (2L, null, "en", null, 5L),
      (3L, "zz", "fr", "web", 5L)))
    val got = AnalyticsOps.profileColumns(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("doc_id") === ((3L, 0L, 3L, "1", "3")))
    assert(got("text") === ((3L, 1L, 2L, "abc", "zz")))
    assert(got("lang") === ((3L, 0L, 2L, "en", "fr")))
    assert(got("source") === ((3L, 1L, 1L, "web", "web")))
    assert(got("n_chars") === ((3L, 0L, 2L, "3", "5")))
  }

  test("CDC delta: classification law re-derived from the base snapshot") {
    import org.apache.spark.sql.functions.{coalesce, col, length, lit}
    val idLen = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(coalesce(col("text"), lit(""))))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ids = idLen.keySet
    val expected =
      ids.filter(_ % 13 == 0).map(_ -> "D") ++
      ids.filter(id => id % 13 != 0 &&
        (id % 7 == 0 || (id % 19 == 0 && idLen(id) >= 1))).map(_ -> "U") ++
      ids.filter(_ % 17 == 0).map(id => (id + 10000000L) -> "I")
    val got = AnalyticsOps.cdcSnapshotDelta(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got === expected)
  }

  test("CDC delta: a boundary-shift row (char moves text->lang) is an Update") {
    // doc_id=19: %13!=0, %7!=0, %19==0 → next snapshot has text="a",
    // lang="bfr" where base had text="ab", lang="fr". The concatenated
    // bytes are IDENTICAL without a field separator — this row exists to
    // prove the -separated digest catches the move.
    val dir = writeDocs(Seq(
      (19L, "ab", "fr", "web", 2L),
      (20L, "same", "en", "web", 4L)))
    val got = AnalyticsOps.cdcSnapshotDelta(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(19L -> "U"))
  }

  test("CDC merge-apply: replayed delta reconstructs next, counts tie out") {
    val deltaOps = AnalyticsOps.cdcSnapshotDelta(spark, sfDir).collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = AnalyticsOps.cdcMergeApply(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === deltaOps.getOrElse("U", 0L), "n_updated")
    assert(row.getLong(1) === deltaOps.getOrElse("I", 0L), "n_inserted")
    assert(row.getLong(2) === deltaOps.getOrElse("D", 0L), "n_deleted")
    assert(row.getBoolean(4), "merged table must checksum-equal the next snapshot")
  }

  test("cohort retention: exact cells on a three-user fixture") {
    // 2024-01-01 is a Monday; weeks W0/W1/W2 start 01-01 / 01-08 / 01-15
    val dir = writeEvents(Seq(
      Row(1L, ts("2024-01-02 10:00:00"), 1L, "click", 1.0, null),
      Row(2L, ts("2024-01-16 10:00:00"), 1L, "click", 1.0, null),
      Row(3L, ts("2024-01-03 09:00:00"), 2L, "view", 1.0, null),
      Row(4L, ts("2024-01-10 09:00:00"), 3L, "view", 1.0, null)))
    val got = AnalyticsOps.cohortRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }

  test("OHLC bars: tied timestamps resolve by event_id, volume sums") {
    val dir = writeEvents(Seq(
      Row(1L, ts("2024-03-05 10:00:00"), 1L, "t", 5.0, null),
      Row(2L, ts("2024-03-05 10:00:00"), 1L, "t", 7.0, null), // open tie
      Row(3L, ts("2024-03-05 10:30:00"), 1L, "t", 1.0, null),
      Row(4L, ts("2024-03-05 10:59:00"), 1L, "t", 9.0, null),
      Row(5L, ts("2024-03-05 10:59:00"), 1L, "t", 2.0, null), // close tie
      Row(6L, ts("2024-03-05 11:15:00"), 1L, "t", 4.0, null)))
    val got = AnalyticsOps.eventsOhlc(spark, dir).collect()
      .map(r => r.getTimestamp(1).toString ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7))).toMap
    assert(got("2024-03-05 10:00:00.0") === ((5.0, 9.0, 1.0, 2.0, 24.0, 5L)))
    assert(got("2024-03-05 11:00:00.0") === ((4.0, 4.0, 4.0, 4.0, 4.0, 1L)))
  }

  private def naivePagerankTop20(rounds: Int): Seq[(String, Long, Long)] = {
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (s, p) =>
      Seq((2 * s, 2 * p + 1), (2 * p + 1, 2 * s)) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) =>
        contrib(dst) += rank(src) * 85 / (100L * outdeg(src)) }
      rank = contrib.map { case (n, c) => n -> (150000L + c) }.toMap
    }
    rank.toSeq
      .map { case (n, rm) =>
        (if (n % 2 == 0) "s" else "p", n / 2, rm) }
      .sortBy { case (t, k, rm) => (-rm, t, k) }
      .take(20).toSeq
  }

  test("integer PageRank: bit-identical to a driver-side naive walk") {
    val got = AnalyticsOps.graphPagerank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === naivePagerankTop20(3))
  }

  test("integer PageRank: 12 rounds, periodic checkpoint keeps lineage bounded") {
    // Uncheckpointed this would grow a 24-join lineage; the every-4th-round
    // localCheckpoint bounds the plan at <= 8 joins at any depth (and the
    // declared 3-round query pays zero extra materializations). Answer
    // still bit-exact against the naive walk at the same depth.
    val got = AnalyticsOps.graphPagerank(spark, sfDir, rounds = 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === naivePagerankTop20(12))
  }

  test("anomaly extraction: exactly the planted outlier, z2 hand-computed") {
    // type "t": twenty 10.00s and one 100.00 — n=21, s1=30000c,
    // s2=1.2e8c². Outlier: num=21*10000-30000=180000, den=21*1.2e8-9e8
    // =1.62e9, num²=3.24e10 > 9·den → flagged, z² = 3.24e10/1.62e9 = 20.
    // Normals: num=-9000, num²=8.1e7 < 1.458e10 → clean.
    val rows = (1L to 20L).map(i =>
      Row(i, ts("2024-03-05 10:00:00"), 1L, "t", 10.0, null)) :+
      Row(21L, ts("2024-03-05 11:00:00"), 1L, "t", 100.0, null)
    val dir = writeEvents(rows)
    val got = AnalyticsOps.eventsAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((21L, 10000L, 20.0)))
  }

  test("approx percentiles: exact interpolation hand-checked, bound holds") {
    // values 0.01..0.04 -> cents 1..4; p=0.5 over n=4: rank 1.5 (0-based)
    // -> 2 + 0.5*(3-2) = 2.5; p=0.9: rank 2.7 -> 3.7; p=0.99: 3.97
    val rows = (1L to 4L).map(i =>
      Row(i, ts("2024-03-01 10:00:00"), 1L, "t", i * 0.01, null))
    val got = AnalyticsOps.eventsApproxPercentiles(spark, writeEvents(rows))
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getBoolean(4)))
    assert(got.toSeq === Seq((0.5, 2.5, true), (0.9, 3.7, true), (0.99, 3.97, true)))
  }

  test("range trailing: 1h frame boundary, peers, and user isolation") {
    val rows = Seq(
      Row(1L, ts("2024-03-01 10:00:00"), 1L, "t", 1.0, null),
      Row(2L, ts("2024-03-01 10:30:00"), 1L, "t", 2.0, null),
      // exactly 1h after e1: the (t-1h, t] frame EXCLUDES e1
      Row(3L, ts("2024-03-01 11:00:00"), 1L, "t", 4.0, null),
      // peer of e3: RANGE frames include all peers in BOTH frames
      Row(4L, ts("2024-03-01 11:00:00"), 1L, "t", 8.0, null),
      // another user: frames never cross the partition
      Row(5L, ts("2024-03-01 10:45:00"), 2L, "t", 16.0, null),
      // dropped rows: null ts, null user, non-finite value
      Row(6L, null, 1L, "t", 1.0, null),
      Row(7L, ts("2024-03-01 10:10:00"), null, "t", 1.0, null),
      Row(8L, ts("2024-03-01 10:10:00"), 1L, "t", Double.NaN, null))
    val got = AnalyticsOps.eventsRangeTrailing(spark, writeEvents(rows))
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      1L -> ((100L, 1L)), 2L -> ((300L, 2L)),
      3L -> ((1400L, 3L)), 4L -> ((1400L, 3L)),
      5L -> ((1600L, 1L))))
  }

  test("histogram: integer bins map lo->0 and hi->9; degenerate range -> one bin") {
    val rows = (0L to 9L).map(i =>
      Row(i + 1, ts("2024-03-01 10:00:00"), 1L, "t", i * 0.01, null)) ++
      Seq(Row(20L, ts("2024-03-01 10:00:00"), 1L, "z", 5.0, null),
        Row(21L, ts("2024-03-01 11:00:00"), 1L, "z", 5.0, null))
    val got = AnalyticsOps.eventsHistogram(spark, writeEvents(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cents 0..9 over [0,9]: bin = (x*10) div 10 = x — one value per bin
    (0L to 9L).foreach(x => assert(got(("t", x)) === ((1L, x, x))))
    assert(got(("z", 0L)) === ((2L, 500L, 500L)))
    assert(got.size === 11)
  }

  test("corr stats: exact-moment closed forms on a linear fixture") {
    val rows = Seq(
      // x = 100·hour cents: perfectly linear -> corr 1, slope 100 c/h
      Row(1L, ts("2024-03-01 01:00:00"), 1L, "t", 1.0, null),
      Row(2L, ts("2024-03-01 02:00:00"), 1L, "t", 2.0, null),
      Row(3L, ts("2024-03-01 03:00:00"), 1L, "t", 3.0, null),
      // zero hour variance -> corr and slope NULL, stddev still defined
      Row(4L, ts("2024-03-01 05:00:00"), 1L, "z", 1.0, null),
      Row(5L, ts("2024-03-01 05:30:00"), 1L, "z", 3.0, null))
    val got = AnalyticsOps.eventsCorrStats(spark, writeEvents(rows)).collect()
    val t = got.find(_.getString(0) == "t").get
    assert(t.getLong(1) == 3 && t.getLong(2) == 600 && t.getLong(3) == 6)
    assert(t.getLong(4) == 1000000L)   // corr_micro
    assert(t.getLong(5) == 100000L)    // stddev 100c -> milli
    assert(t.getLong(6) == 100000000L) // slope 100 c/hour in micro
    val z = got.find(_.getString(0) == "z").get
    assert(z.isNullAt(4) && z.isNullAt(6))
    assert(z.getLong(5) == 141421L) // sqrt(2)·100c in milli
  }

  test("funnel: order violations and window expiry drop users per stage") {
    val d1 = "2024-03-01 10:00:00"
    val rows = Seq(
      // user 1: clean view -> click -> purchase
      Row(1L, ts(d1), 1L, "view", 1.0, null),
      Row(2L, ts("2024-03-02 10:00:00"), 1L, "click", 1.0, null),
      Row(3L, ts("2024-03-03 10:00:00"), 1L, "purchase", 1.0, null),
      // user 2: click BEFORE its first view -> counts only as a view
      Row(4L, ts(d1), 2L, "click", 1.0, null),
      Row(5L, ts("2024-03-02 10:00:00"), 2L, "view", 1.0, null),
      // user 3: click 8 days later -> outside the 7-day window
      Row(6L, ts(d1), 3L, "view", 1.0, null),
      Row(7L, ts("2024-03-09 11:00:00"), 3L, "click", 1.0, null),
      // user 4: purchase outside the window measured from the VIEW
      Row(8L, ts(d1), 4L, "view", 1.0, null),
      Row(9L, ts("2024-03-02 10:00:00"), 4L, "click", 1.0, null),
      Row(10L, ts("2024-03-09 11:00:00"), 4L, "purchase", 1.0, null),
      // user 5: purchase with no view -> invisible to the funnel
      Row(11L, ts(d1), 5L, "purchase", 1.0, null))
    val got = AnalyticsOps.eventsFunnel(spark, writeEvents(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("stratified sampling: per-lang quota, priorities re-derived scalar-side") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), coalesce(col("n_chars"), lit(1L)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.map { case (id, lang, w) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4294967296.0
      (lang, id, w, w.toDouble / u)
    }.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy { case (_, id, _, p) => (-p, id) }.take(5).zipWithIndex
        .map { case ((_, id, w, p), i) => (lang, (i + 1).toLong, id, w, p) }
    }
    val got = AnalyticsOps.sampleStratifiedTopK(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSet === expected.toSet)
  }

  test("priority sampling: scalar md5 recomputation agrees on the top-20") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), coalesce(col("n_chars"), lit(1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.map { case (id, w) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4294967296.0
      (id, w, w.toDouble / u)
    }.sortBy { case (id, _, p) => (-p, id) }.take(20).toSeq
    val got = AnalyticsOps.sampleWeighted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }
}
