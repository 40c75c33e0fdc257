package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Round-14 statistics surface:
  *  - date/timestamp columns carry zone maps (stored as epoch-day /
  *    epoch-micros under the long kind) so `WHERE ts >= X` on a
  *    time-ordered table SKIPS files — the single most common predicate
  *    on a 100 TB event store;
  *  - the catalog column statistics carry table-level min/max, so
  *    Catalyst's FilterEstimation sizes range predicates for real and
  *    a selective filter can flip a join to broadcast;
  *  - the partitioned FileIndex never throws on a filter it cannot
  *    bind — it conservatively keeps every directory. */
class SnapshotTimeStatsSpec extends GraftSpec {

  /** Executes `df` and returns (rows, files actually scanned). */
  private def run(df: DataFrame): (Long, Long) = {
    val n = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val files = plan.collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
    (n, files)
  }

  test("timestamp range prunes files on a time-ordered table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts1-").toString
    val t = s"$dir/tbl"
    // 1000 minutes of events, time-ordered into 8 files (the
    // time-ordered-append layout every event store converges to)
    val src = spark.range(0, 1000)
      .select(col("id"), timestamp_seconds(col("id") * 60).as("ts"),
        (col("id") % 7).as("v"))
      .repartitionByRange(8, col("ts"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    val (all, allFiles) = run(snap)
    assert(all == 1000 && allFiles == 8)
    // >= the 900th minute: the tail file(s) only
    val (tail, tailFiles) = run(
      snap.filter(col("ts") >= timestamp_seconds(lit(900 * 60))))
    assert(tail == 100 && tailFiles <= 2,
      s"ts >= bound scanned $tailFiles of 8 files")
    // a one-hour window mid-table
    val (win, winFiles) = run(snap.filter(
      col("ts") >= timestamp_seconds(lit(480 * 60)) &&
        col("ts") < timestamp_seconds(lit(540 * 60))))
    assert(win == 60 && winFiles <= 2,
      s"one-hour window scanned $winFiles of 8 files")
    // equality on one instant
    val (one, oneFiles) = run(
      snap.filter(col("ts") === timestamp_seconds(lit(417 * 60))))
    assert(one == 1 && oneFiles == 1)
    // a refuted range scans nothing
    val (none, noneFiles) = run(
      snap.filter(col("ts") >= timestamp_seconds(lit(2000 * 60))))
    assert(none == 0 && noneFiles == 0)
    // catalog NDV reaches the planner for the timestamp column too
    val stats = snap.queryExecution.optimizedPlan.stats
    val tsStat = stats.attributeStats.toSeq
      .collectFirst { case (a, st) if a.name == "ts" => st }.get
    assert(tsStat.distinctCount.exists(_ >= BigInt(700)),
      s"ts NDV ${tsStat.distinctCount} not estimated")
    assert(tsStat.min.isDefined && tsStat.max.isDefined,
      "ts min/max missing from catalog stats")
  }

  test("date range prunes files; null dates stay sound") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts2-").toString
    val t = s"$dir/tbl"
    val src = spark.range(0, 400)
      .select(col("id"),
        when(col("id") === 13, lit(null).cast("date"))
          .otherwise(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (col("id") / 4).cast("int"))).as("d"))
      .repartitionByRange(8, col("id")) // id-ordered == date-ordered
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    // one calendar day == 4 ids == a fraction of one range file
    val (day, dayFiles) = run(
      snap.filter(col("d") === lit(java.sql.Date.valueOf("2024-02-10"))))
    assert(day == 4 && dayFiles == 1, s"one day scanned $dayFiles files")
    val (tail, tailFiles) = run(
      snap.filter(col("d") >= lit(java.sql.Date.valueOf("2024-04-01"))))
    assert(tail > 0 && tailFiles <= 2)
    // IS NULL finds the injected null regardless of bounds
    val (nulls, _) = run(snap.filter(col("d").isNull))
    assert(nulls == 1)
    // pruned results must equal the unpruned plain-parquet evaluation
    val base = spark.read.parquet(snap.inputFiles: _*)
    val cut = java.sql.Date.valueOf("2024-01-20")
    assert(snap.filter(col("d") < lit(cut)).count() ==
      base.filter(col("d") < lit(cut)).count())
  }

  test("catalog min/max: a selective filter flips the join to broadcast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts3-").toString
    val bounded = s"$dir/bounded"
    val unbounded = s"$dir/unbounded"
    val fact = s"$dir/fact"
    // 5000 rows, v uniform over [0, 5000): `v < 50` is 1% selective
    SnapshotTable.commit(spark, bounded,
      (0L until 5000L).map(i => (i % 100, i.toDouble)).toDF("k", "v")
        .repartition(4),
      overwrite = false)
    // the negative control: SAME data shape, but a NaN in every file
    // makes each file's double bounds unstorable → the catalog carries
    // no min/max for v → FilterEstimation keeps selectivity 1.0
    SnapshotTable.commit(spark, unbounded,
      (0L until 5000L).map(i =>
          (i % 100, if (i % 1250 == 3) Double.NaN else i.toDouble))
        .toDF("k", "v").repartition(4),
      overwrite = false)
    SnapshotTable.commit(spark, fact,
      (0L until 20000L).map(i => (i % 100, i)).toDF("k", "w")
        .repartition(4),
      overwrite = false)
    def joinPlan(side: String): String = {
      val fork = org.apache.spark.sql.GraftSqlShim.forkSession(spark)
      // leaf catalog stats flow under planStats alone, but FILTER
      // estimation (FilterEstimation via BasicStatsPlanVisitor) only
      // runs under full CBO — that is the planner mode this feature
      // serves
      fork.conf.set("spark.sql.cbo.enabled", "true")
      fork.conf.set("spark.sql.cbo.planStats.enabled", "true")
      fork.conf.set("spark.sql.adaptive.enabled", "false")
      // between the filtered estimate (~50 rows) and the unfiltered
      // relation (5000 rows × ~20B): only a planner that SIZED the
      // range predicate from catalog min/max may broadcast
      fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
      val d = SnapshotTable.readAsOf(fork, side, Int.MaxValue)
        .filter(col("v") < 50.0)
      val f = SnapshotTable.readAsOf(fork, fact, Int.MaxValue)
      f.join(d, "k").groupBy(d("v")).agg(sum(f("w")).as("s"))
        .queryExecution.sparkPlan.toString
    }
    assert(joinPlan(bounded).contains("BroadcastHashJoin"),
      "catalog min/max must size `v < 50` down to broadcastable")
    assert(!joinPlan(unbounded).contains("BroadcastHashJoin"),
      "without column bounds the same filter must NOT broadcast — " +
        "proves the broadcast above came from min/max, not row count")
    // and the bounds themselves are the true extremes (plan-stat form)
    val vStat = SnapshotTable.readAsOf(spark, bounded, Int.MaxValue)
      .queryExecution.optimizedPlan.stats.attributeStats.toSeq
      .collectFirst { case (a, st) if a.name == "v" => st }.get
    assert(vStat.min.contains(0.0) && vStat.max.contains(4999.0),
      s"v bounds ${vStat.min}/${vStat.max}")
  }

  test("partition filter the index cannot bind keeps all directories") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    import org.apache.hadoop.fs.{FileStatus, Path => HP}
    val fields = Seq(StructField("p", StringType, nullable = true))
    def entry(p: String, v: String) = SnapshotTable.FileEntry(
      new FileStatus(10L, false, 1, 128L, 0L, new HP(s"/t/p=$v/$p")),
      rows = Some(1L), stats = Map.empty, part = Some(Seq(Some(v))))
    val idx = new SnapshotTable.PartitionedManifestFileIndex(
      new HP("/t"), Seq(entry("a.parquet", "x"), entry("b.parquet", "y")),
      fields)
    val pAttr = AttributeReference("p", StringType)()
    // a bindable filter prunes to one directory
    val pruned = idx.listFiles(
      Seq(EqualTo(pAttr, Literal.create("x", StringType))), Nil)
    assert(pruned.map(_.files.length).sum == 1)
    // case-variant spelling still binds (resolver-friendly)
    val ciAttr = AttributeReference("P", StringType)()
    val ci = idx.listFiles(
      Seq(EqualTo(ciAttr, Literal.create("x", StringType))), Nil)
    assert(ci.map(_.files.length).sum == 1,
      "case-variant partition attribute must bind")
    // an attribute that is NOT a partition column: conservative
    // keep-all, never IndexOutOfBounds at plan time
    val alien = AttributeReference("not_partitioned", StringType)()
    val kept = idx.listFiles(
      Seq(EqualTo(alien, Literal.create("x", StringType))), Nil)
    assert(kept.map(_.files.length).sum == 2,
      "unbindable partition filter must keep every directory")
    // mixed: the bindable conjunct still prunes, the alien one is dropped
    val mixed = idx.listFiles(
      Seq(EqualTo(pAttr, Literal.create("y", StringType)),
        EqualTo(alien, Literal.create("z", StringType))), Nil)
    assert(mixed.map(_.files.length).sum == 1)
  }

  test("timestamp_ntz prunes — under ANY session zone at write time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts5-").toString
    val t = s"$dir/tbl"
    // the parquet-default reading of a tz-less timestamp column is NTZ
    // (the orders.o_orderdate shape) — it must prune like the others
    val src = spark.range(0, 800)
      .select(col("id"),
        expr("to_timestamp_ntz('2024-01-01 00:00:00') + " +
          "make_interval(0, 0, 0, 0, 0, id, 0)").as("nts"))
      .repartitionByRange(8, col("nts"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    val (tail, tailFiles) = run(snap.filter(
      col("nts") >= expr("to_timestamp_ntz('2024-01-01 12:00:00')")))
    assert(tail == 80 && tailFiles <= 2,
      s"ntz range scanned $tailFiles of 8 files")
    // pruned == unpruned on an exact minute probe
    val probe = expr("to_timestamp_ntz('2024-01-01 03:27:00')")
    assert(snap.filter(col("nts") === probe).count() == 1)
    // NTZ bounds are assembled from the wall-clock FIELDS (zone-
    // independent), so a NON-UTC writer session stores the SAME sound
    // bounds — a DST-crossing zone is the adversarial case: any
    // instant-based shortcut would shift bounds by the offset
    val fork = org.apache.spark.sql.GraftSqlShim.forkSession(spark)
    fork.conf.set("spark.sql.session.timeZone", "America/New_York")
    val t2 = s"$dir/tbl2"
    SnapshotTable.commit(fork, t2, src, overwrite = false)
    val snap2 = SnapshotTable.readAsOf(spark, t2, 1) // read back under UTC
    val (all2, files2) = run(snap2.filter(
      col("nts") >= expr("to_timestamp_ntz('2024-01-01 12:00:00')")))
    assert(all2 == 80, "results must stay correct")
    assert(files2 <= 2,
      s"non-UTC-committed NTZ must prune too, scanned $files2 of 8")
    // the stored bounds equal the UTC-committed ones exactly — same
    // internal-micros representation from either session zone
    val (one2, oneFiles2) = run(snap2.filter(col("nts") === probe))
    assert(one2 == 1 && oneFiles2 == 1)
    // and a refuted range scans nothing even cross-zone
    val (none2, noneFiles2) = run(snap2.filter(
      col("nts") >= expr("to_timestamp_ntz('2024-01-02 00:00:00')")))
    assert(none2 == 0 && noneFiles2 == 0)
    // catalog bounds present and identical to the UTC table's
    def bounds(df: DataFrame) = df.queryExecution.optimizedPlan.stats
      .attributeStats.toSeq.collectFirst {
        case (a, st) if a.name == "nts" => (st.min, st.max) }.get
    assert(bounds(snap2) == bounds(snap) && bounds(snap)._1.isDefined,
      s"cross-zone NTZ catalog bounds diverge: ${bounds(snap2)} vs ${bounds(snap)}")
  }

  test("decimal zone maps: unscaled-long bounds prune; unwrapped casts stay sound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts6-").toString
    val t = s"$dir/tbl"
    // money amounts 0.00 .. 99.99, price-ordered into 8 files
    val src = spark.range(0, 10000)
      .select(col("id"),
        expr("CAST(concat(CAST(id DIV 100 AS STRING), '.', " +
          "lpad(CAST(id % 100 AS STRING), 2, '0')) AS DECIMAL(12,2))")
          .as("amount"))
      .repartitionByRange(8, col("amount"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, 1)
    // a same-scale literal prunes (coerced to DECIMAL(12,2) in place)
    val (tail, tailFiles) = run(
      snap.filter(col("amount") >= expr("CAST(90.00 AS DECIMAL(12,2))")))
    assert(tail == 1000 && tailFiles <= 2,
      s"decimal range scanned $tailFiles of 8 files")
    val (one, oneFiles) = run(
      snap.filter(col("amount") === expr("CAST(41.70 AS DECIMAL(12,2))")))
    assert(one == 1 && oneFiles == 1)
    // a FINER-scale literal (99.985): Catalyst's
    // UnwrapCastInBinaryComparison rewrites the widened comparison
    // back to the column's scale, so the pushed filter still prunes —
    // and the boundary row (99.99 > 99.985) must survive it
    val (fine, fineFiles) = run(
      snap.filter(col("amount") > expr("CAST(99.985 AS DECIMAL(13,3))")))
    assert(fine == 1 && fineFiles <= 2,
      s"finer-scale literal: got $fine rows from $fineFiles files")
    // catalog bounds render in decimal external form and reach CBO
    val aStat = snap.queryExecution.optimizedPlan.stats.attributeStats
      .toSeq.collectFirst { case (a, st) if a.name == "amount" => st }.get
    assert(aStat.min.contains(org.apache.spark.sql.types.Decimal("0.00")) ||
      aStat.min.map(_.toString).contains("0.00"),
      s"amount min ${aStat.min}")
    assert(aStat.max.map(_.toString).contains("99.99"),
      s"amount max ${aStat.max}")
    // pruned == unpruned parity on a mid band
    val base = spark.read.schema(snap.schema).parquet(snap.inputFiles: _*)
    val band = col("amount") >= expr("CAST(25.50 AS DECIMAL(12,2))") &&
      col("amount") < expr("CAST(30.00 AS DECIMAL(12,2))")
    assert(snap.filter(band).count() == base.filter(band).count())
  }

  test("metaAgg serves date/timestamp extremes through the long kind") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts4-").toString
    val t = s"$dir/tbl"
    val src = spark.range(0, 100)
      .select(col("id"), timestamp_seconds(col("id") * 3600).as("ts"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          col("id").cast("int")).as("d"))
    SnapshotTable.commit(spark, t, src, overwrite = false)
    val ma = SnapshotTable.metaAgg(spark, t).collect()
      .map(r => r.getString(0) -> r).toMap
    // timestamp extremes in epoch-micros, date extremes in epoch-days
    assert(ma("ts").getLong(4) == 0L &&
      ma("ts").getLong(5) == 99L * 3600L * 1000000L)
    val epoch0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(ma("d").getLong(4) == epoch0 && ma("d").getLong(5) == epoch0 + 99)
    assert(ma("ts").getBoolean(10), "bounds must be exact")
  }
}
