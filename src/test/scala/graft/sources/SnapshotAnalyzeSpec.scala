package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** `GRAFT ANALYZE` / [[SnapshotTable.analyze]] — the stats-recompute
  * commit: a table that saw DML (merge/delete drop the NDV sketch) or
  * carries stats-poor files regains full planner statistics from ONE
  * distributed pass, published as a stats-only commit (no data
  * rewrite, layout preserved, history intact). */
class SnapshotAnalyzeSpec extends GraftSpec {

  /** Rewrite the latest manifest of `t` through `f` (test-only surgery
    * simulating files written by older stats formats). */
  private def editLatestManifest(t: String)(f: String => String): Unit = {
    val cd = new org.apache.hadoop.fs.Path(t, "_commits")
    val fs = cd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(cd).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.txt")).maxBy(_.getName)
    val text = {
      val in = fs.open(latest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = fs.create(latest, true)
    out.write(f(text).getBytes("UTF-8")); out.close()
  }

  test("analyze restores NDV and exact bounds after a merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-anl1-").toString
    val t = s"$dir/tbl"
    // 40 distinct keys < K=64, so the restored sketch must be EXACT
    SnapshotTable.commit(spark, t,
      (1L to 200L).map(i => (i % 40, i * 10L)).toDF("k", "v"),
      overwrite = false)
    def ndv(asOf: Int = Int.MaxValue): Option[Long] = {
      val ps = SnapshotTable.plannerStats(spark, t, asOf).collect()
        .map(r => r.getString(0) -> r).toMap
      if (ps("k").isNullAt(3)) None else Some(ps("k").getLong(3))
    }
    assert(ndv().contains(40L))
    // DML: the selective merge rewrites touched files and — honestly —
    // drops the cumulative NDV sketch (a bottom-k cannot subtract)
    SnapshotTable.merge(spark, t,
      Seq((5L, 999L), (41L, 1L)).toDF("k", "v"),
      Seq(7L).toDF("k"), "k")
    assert(ndv().isEmpty, "post-merge NDV must be unknown")
    // ANALYZE: one pass over the live files, stats-only commit (the
    // SQL verb rides the injected parser — SnapshotSqlSpec covers it;
    // the shared spec session runs without extensions)
    val v = SnapshotTable.analyze(spark, t)
    assert(v.nonEmpty, "analyze must publish")
    // {0..39} minus deleted 7, plus upserted 41 = 40 distinct
    assert(ndv().contains(40L), "NDV restored exactly (distinct k = 40)")
    val ma = SnapshotTable.metaAgg(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ma("k").getAs[Boolean]("bounds_exact") &&
      ma("k").getAs[Long]("min_long") == 0L &&
      ma("k").getAs[Long]("max_long") == 41L)
    assert(ma("v").getAs[Long]("max_long") == 2000L)
    // rows preserved; history intact (the pre-analyze version still
    // serves its own degraded stats — a stats commit is a new VERSION)
    // merge replaced the 5 k=5 rows with one, deleted the 5 k=7 rows,
    // and inserted one k=41 row: 200 - 4 - 5 + 1 = 192
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(192L))
    assert(ndv(asOf = v.get - 1).isEmpty,
      "time travel must still see the pre-analyze degradation")
  }

  test("analyze repairs a stats-poor manifest: counts, bounds, broadcast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-anl2-").toString
    val bounded = s"$dir/bounded"
    val fact = s"$dir/fact"
    SnapshotTable.commit(spark, bounded,
      (0L until 5000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
        .repartition(4),
      overwrite = false)
    SnapshotTable.commit(spark, fact,
      (0L until 20000L).map(i => (i % 100, i)).toDF("k", "w")
        .repartition(4),
      overwrite = false)
    // simulate a pre-stats writer: strip rows/zone-maps/NDV from the
    // manifest — the planner is then size-only blind on this table
    editLatestManifest(bounded) { text =>
      text.linesIterator.flatMap { l =>
        if (l.startsWith("#ndv:")) None
        else if (l.startsWith("#")) Some(l)
        else Some(l.split("\t", -1).take(2).mkString("\t") + "\t\t")
      }.mkString("\n")
    }
    def joinPlan(): String = {
      val fork = org.apache.spark.sql.GraftSqlShim.forkSession(spark)
      fork.conf.set("spark.sql.cbo.enabled", "true")
      fork.conf.set("spark.sql.cbo.planStats.enabled", "true")
      fork.conf.set("spark.sql.adaptive.enabled", "false")
      fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
      val d = SnapshotTable.readAsOf(fork, bounded, Int.MaxValue)
        .filter(col("v") < 50.0)
      val f = SnapshotTable.readAsOf(fork, fact, Int.MaxValue)
      f.join(d, "k").groupBy(d("v")).agg(sum(f("w")).as("s"))
        .queryExecution.sparkPlan.toString
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.plannerStats(spark, bounded) }
    assert(!joinPlan().contains("BroadcastHashJoin"),
      "a stats-blind dim must not broadcast at this threshold")
    assert(SnapshotTable.analyze(spark, bounded).contains(2))
    // full planner stats are back: exact rows, true bounds, NDV
    val ps = SnapshotTable.plannerStats(spark, bounded).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ps("v").getLong(2) == 5000L)
    assert(ps("v").getString(6) == "0.0" && ps("v").getString(7) == "4999.0")
    val est = ps("v").getLong(3)
    assert(math.abs(est - 5000L) <= 1500L, s"v NDV $est vs 5000")
    assert(joinPlan().contains("BroadcastHashJoin"),
      "analyze must restore the min/max-sized broadcast decision")
  }

  test("analyze on a partitioned table synthesizes partition stats, keeps layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-anl3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      (0L until 300L).map(i => (i, s"p${i % 3}", i * 2L)).toDF("id", "p", "v"),
      partitionBy = "p")
    // merge-on-read delete outstanding: analyze must REFUSE (per-file
    // stats would describe dead rows) until the vectors are absorbed
    SnapshotTable.deleteWhere(spark, t, col("id") % 10 === 0)
    assert(SnapshotTable.analyze(spark, t).isEmpty,
      "analyze must refuse under outstanding deletion vectors")
    SnapshotTable.absorbDeletes(spark, t)
    // the absorb rewrite dropped NDV? no — absorb carries it; merge the
    // real degradation in: a selective merge drops the sketch
    SnapshotTable.merge(spark, t,
      Seq((7L, "p1", 999L)).toDF("id", "p", "v"),
      spark.emptyDataset[Long].toDF("id"), "id")
    val v = SnapshotTable.analyze(spark, t)
    assert(v.nonEmpty)
    val snap = SnapshotTable.readAsOf(spark, t, v.get)
    assert(snap.inputFiles.forall(_.contains("/p=")),
      "analyze must preserve the hive layout")
    assert(snap.count() == 270L)
    val ma = SnapshotTable.metaAgg(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    // partition-column stats synthesized from the recorded directory
    // values: bounds exact, NDV exact (3 values < K), zero data reads
    assert(ma("p").getAs[String]("min_string") == "p0" &&
      ma("p").getAs[String]("max_string") == "p2" &&
      ma("p").getAs[Boolean]("bounds_exact"))
    assert(ma("p").getAs[Double]("est_ndv") == 3.0)
    assert(ma("id").getAs[Long]("n_nonnull") == 270L)
    // directory pruning still composes after the stats commit: the
    // executed scan touches only p=p1's files
    val one = snap.filter(col("p") === "p1")
    assert(one.count() == 90L)
    val plan = one.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    val total = snap.inputFiles.length
    assert(scanned < total,
      s"partition filter must prune: scanned $scanned of $total files")
  }
}
