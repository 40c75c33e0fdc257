package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** The FUSED single-pass commit stats (round-19 optimization: zone
  * maps / byte totals / KMV NDV / Bloom bits fold inside the write job
  * via a per-task observer, instead of a second job re-reading the
  * batch) must publish BIT-IDENTICAL manifest stats to the legacy
  * read-back aggregation — the stats feed oracle-pinned outputs
  * (metaAgg's est_ndv, zone-map bounds) and the file-skipping pruner,
  * so equivalence is asserted at the manifest TEXT level on a frame
  * exercising every stat kind: integral/date/timestamp/decimal longs,
  * float/double (with NaN and +Inf bounds that must drop), strings
  * with nulls and multi-byte UTF-8, struct leaves, a declared scalar
  * Bloom, and an all-null column. */
class SnapshotFusedStatsSpec extends GraftSpec {

  /** Latest manifest's (sorted per-entry "rows|stats" strings, sorted
    * #ndv lines) — everything path/size/uuid-independent. */
  private def statsFingerprint(t: String): (Seq[String], Seq[String]) = {
    val dir = new org.apache.hadoop.fs.Path(t, "_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.txt"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".txt").toInt)
    val text = {
      val in = fs.open(last)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val lines = text.split("\n").toSeq
    val entries = lines.filterNot(_.startsWith("#")).map { l =>
      val f = l.split("\t", -1)
      // f(0)=path f(1)=size f(2)=rows f(3)=stats [f(4+)=era tags]
      s"${f(2)}|${f.lift(3).getOrElse("")}"
    }.sorted
    val ndv = lines.filter(_.startsWith("#ndv:")).sorted
    (entries, ndv)
  }

  private def mixedFrame = {
    import spark.implicits._
    val rows = (1L to 300L).map { i =>
      (i,
        if (i % 11 == 0) null else s"säg_${i % 13}",
        if (i % 7 == 0) Double.NaN
        else if (i == 5L) Double.PositiveInfinity
        else i * 1.5 - 100.0,
        (i % 17).toInt,
        java.sql.Date.valueOf("2024-03-%02d".format((i % 28 + 1).toInt)),
        java.sql.Timestamp.valueOf("2024-03-01 10:%02d:00".format((i % 60).toInt)),
        new java.math.BigDecimal(s"${i % 50}.25"),
        (i % 5, if (i % 3 == 0) null else s"leaf${i % 4}"),
        null.asInstanceOf[java.lang.Long])
    }
    rows.toDF("id", "name", "score", "grp", "d", "ts", "money",
        "meta", "allnull")
      .withColumn("money", col("money").cast("decimal(12,2)"))
      .withColumn("meta", struct(col("meta._1").as("a"), col("meta._2").as("b")))
      .repartition(5)
  }

  test("fused write-job stats == legacy read-back stats, manifest-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fused-").toString
    val df = mixedFrame.localCheckpoint(true) // pin identical input rows
    val old = SnapshotTable.fuseCommitStats
    try {
      SnapshotTable.fuseCommitStats = true
      SnapshotTable.commit(spark, s"$dir/fused", df, overwrite = false)
      SnapshotTable.fuseCommitStats = false
      SnapshotTable.commit(spark, s"$dir/legacy", df, overwrite = false)
    } finally SnapshotTable.fuseCommitStats = old
    val (eF, nF) = statsFingerprint(s"$dir/fused")
    val (eL, nL) = statsFingerprint(s"$dir/legacy")
    assert(eF == eL, s"entry stats differ:\nfused : $eF\nlegacy: $eL")
    assert(nF == nL, s"#ndv lines differ:\nfused : $nF\nlegacy: $nL")
    assert(eF.nonEmpty && nF.nonEmpty)
  }

  test("fused stats under a declared Bloom column match legacy") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fusedb-").toString
    val df = mixedFrame.localCheckpoint(true)
    val old = SnapshotTable.fuseCommitStats
    try {
      Seq(("fused", true), ("legacy", false)).foreach { case (name, on) =>
        SnapshotTable.fuseCommitStats = on
        val t = s"$dir/$name"
        SnapshotTable.commit(spark, t, df.limit(10), overwrite = false)
        SnapshotTable.setBloomColumns(spark, t, Seq("id", "name"))
        // post-declaration commit collects the declared Blooms
        SnapshotTable.commit(spark, t, df, overwrite = false)
      }
    } finally SnapshotTable.fuseCommitStats = old
    val (eF, nF) = statsFingerprint(s"$dir/fused")
    val (eL, nL) = statsFingerprint(s"$dir/legacy")
    assert(eF == eL, s"bloom entry stats differ:\nfused : $eF\nlegacy: $eL")
    assert(nF == nL)
    // the declared blooms actually landed (7-field stat for id/name)
    assert(eF.exists(_.split(";").exists(f =>
      f.split(":").length == 7)), s"no bloom field found in $eF")
  }

  test("merge + readChanges stay correct with fused stats on") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusedm-").toString
    val t = s"$dir/tbl"
    val base = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotTable.commit(spark, t, base, overwrite = false)
    SnapshotTable.merge(spark, t,
      (1L to 50L).map(i => (i * 4, s"u${i * 4}")).toDF("k", "v"),
      Seq(3L, 7L).toDF("k"), "k")
    val got = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ((1L to 200L).filterNot(Set(3L, 7L))
      .map(i => (i, if (i % 4 == 0) s"u$i" else s"v$i"))).sorted
    assert(got.toSeq == want)
    val changes = SnapshotTable.readChanges(spark, t, 1, 2)
      .groupBy(col("change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 50 upserts re-landed + 2 deletes gone; pre-images = 50 touched
    // existing rows + 2 deleted rows
    assert(changes("insert") == 50L, s"$changes")
    assert(changes("delete") == 52L, s"$changes")
  }
}
