package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Hive-style partition layout ([[SnapshotTable.commitPartitioned]]):
  * `<col>=<value>/` directories, manifest-recorded partition values,
  * directory-level pruning from Catalyst's partition filters (composed
  * with zone-map data skipping), append layout discipline, and the
  * row-level-rewrite refusals. */
class SnapshotPartitionSpec extends GraftSpec {

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  test("round trip: hive directories, reconstructed column, schema order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part1-").toString
    val t = s"$dir/tbl"
    val df = Seq((1L, "us", 10L), (2L, "eu", 20L), (3L, "us", 30L),
      (4L, "ap", 40L)).toDF("id", "region", "v")
    SnapshotTable.commitPartitioned(spark, t, df, "region")
    // the data landed under hive directories, and the files do NOT
    // store the partition column
    val dataDirs = new java.io.File(s"$t/data").listFiles().head.listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dataDirs.toSeq == Seq("region=ap", "region=eu", "region=us"))
    val back = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(back.columns.toSeq == Seq("id", "region", "v"))
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "us", 10L), (2L, "eu", 20L), (3L, "us", 30L), (4L, "ap", 40L)))
    // rowCount/metaAgg stay metadata-served on the hive layout
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(4L))
  }

  test("partition filter prunes whole directories at plan time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part2-").toString
    val t = s"$dir/tbl"
    // 4 partitions × 2 commits = up to 8 files; each partition's rows
    // carry ids spanning the whole range so ZONE maps alone could not
    // prune (the id ranges overlap across partitions)
    val df = (1L to 400L).map(i => (i, s"p${i % 4}", i * 2L))
      .toDF("id", "part", "v")
    SnapshotTable.commitPartitioned(spark, t,
      df.filter(col("id") <= 200L), "part")
    SnapshotTable.commitPartitioned(spark, t,
      df.filter(col("id") > 200L), "part")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    val total = SnapshotTable.readAsOf(spark, t, Int.MaxValue).inputFiles.length
    assert(total >= 8, s"expected >=8 files, got $total")
    val one = snap.filter(col("part") === "p1")
    assert(one.count() == 100L)
    // shuffle-free probe: under AQE a scan inside a query stage is not
    // reachable from the final plan's collect
    val scanned = scannedFiles(one)
    assert(scanned == total / 4,
      s"partition-pruned scan read $scanned of $total files")
    // IN-list over two partitions: half the directories
    val two = scannedFiles(snap.filter(col("part").isin("p0", "p3")))
    assert(two == total / 2, s"two-partition scan read $two of $total")
  }

  test("null partition, hive escaping, int and date partition types") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part3-").toString
    // string with nulls + path-hostile characters
    val ts = s"$dir/s"
    SnapshotTable.commitPartitioned(spark, ts,
      Seq((1L, "a/b c=d:e"), (2L, null), (3L, "plain"))
        .toDF("id", "k"), "k")
    val backS = SnapshotTable.readAsOf(spark, ts, Int.MaxValue)
    assert(backS.orderBy("id").collect().map(r =>
        (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, Some("a/b c=d:e")), (2L, None), (3L, Some("plain"))))
    assert(backS.filter(col("k").isNull).count() == 1L)
    assert(backS.filter(col("k") === "a/b c=d:e").count() == 1L)
    // int partition: typed pruning predicate evaluates on the cast value
    val ti = s"$dir/i"
    SnapshotTable.commitPartitioned(spark, ti,
      (1L to 60L).map(i => (i, (i % 3).toInt)).toDF("id", "b"), "b")
    val backI = SnapshotTable.readAsOf(spark, ti, Int.MaxValue)
    assert(backI.filter(col("b") >= 1).count() == 40L)
    val totI = backI.inputFiles.length
    assert(scannedFiles(backI.filter(col("b") === 2)) == totI / 3)
    // EMPTY-STRING partition value: the hive directory form cannot
    // represent it (it files as the null partition and would read back
    // as NULL) — refused loudly in the write pass, nothing published
    val te = s"$dir/e"
    val err = intercept[Exception] {
      SnapshotTable.commitPartitioned(spark, te,
        Seq((1L, "")).toDF("id", "k"), "k")
    }
    assert(err.getMessage != null)
    assert(SnapshotTable.versions(spark, te).isEmpty,
      "a refused empty-string commit must publish nothing")
    // date partition round-trips through the directory string
    val td = s"$dir/d"
    SnapshotTable.commitPartitioned(spark, td,
      Seq((1L, java.sql.Date.valueOf("2024-03-01")),
        (2L, java.sql.Date.valueOf("2024-03-02"))).toDF("id", "day"), "day")
    val backD = SnapshotTable.readAsOf(spark, td, Int.MaxValue)
    assert(backD.filter(col("day") === lit("2024-03-02").cast("date"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("appends keep the layout; mismatches and rewrites are refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      Seq((1L, "x", 1L)).toDF("id", "k", "v"), "k")
    // plain append onto the hive layout: refused (its files would carry
    // no partition values)
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, t, Seq((2L, "y", 2L)).toDF("id", "k", "v"),
        overwrite = false)
    }
    // differently-partitioned append: refused
    intercept[IllegalArgumentException] {
      SnapshotTable.commitPartitioned(spark, t,
        Seq((2L, "y", 2L)).toDF("id", "k", "v"), "id")
    }
    // merge routes through the selective path on the hive layout; the
    // full-rewrite fallback (here: upserts missing a column) refuses
    // loudly instead of flattening the directories
    intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, t,
        Seq((1L, 9L)).toDF("id", "v"),
        Seq.empty[Long].toDF("id"), "id")
    }
    // Z-order works WITHIN partitions; it declines only when a Z
    // dimension is the partition column itself (constant per directory)
    assert(SnapshotTable.rewriteZordered(spark, t, "id", "v").isDefined)
    assert(SnapshotTable.rewriteZordered(spark, t, "k", "v").isEmpty)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .inputFiles.forall(_.contains("/k=")))
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, t, "k")
    }
    // an overwrite may re-layout (hive -> flat), after which key
    // rewrites work again
    SnapshotTable.commit(spark, t,
      Seq((5L, "z", 5L)).toDF("id", "k", "v"), overwrite = true)
    assert(SnapshotTable.merge(spark, t,
      Seq((5L, "z", 6L)).toDF("id", "k", "v"),
      Seq.empty[Long].toDF("id"), "id") > 0)
  }

  test("selective merge keeps the hive layout; rows migrate partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partB-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      (1L to 20L).map(i => (i, s"p${i % 2}", i * 2L)).toDF("id", "k", "v"),
      "k")
    // upsert: update id=4 in place, MOVE id=5 from p1 to p0, insert
    // id=21 into p1; delete id=6
    val v = SnapshotTable.merge(spark, t,
      Seq((4L, "p0", 999L), (5L, "p0", 555L), (21L, "p1", 42L))
        .toDF("id", "k", "v"),
      Seq(6L).toDF("id"), "id")
    assert(v == 2)
    val m = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(m.count() == 20L) // 20 - 1 delete + 1 insert
    assert(m.filter(col("id") === 4L).select("v").head().getLong(0) == 999L)
    assert(m.filter(col("id") === 5L).select("k").head().getString(0) == "p0")
    assert(m.filter(col("id") === 6L).count() == 0L)
    assert(m.filter(col("id") === 21L).select("k").head().getString(0) == "p1")
    // every file still lives under a hive directory, and directory
    // pruning still matches the merged truth
    assert(m.inputFiles.forall(_.matches(".*/k=p[01]/.*")),
      m.inputFiles.mkString(","))
    assert(m.filter(col("k") === "p0").count() ==
      m.collect().count(_.getString(1) == "p0"))
    // CDC composition: mergeLatest (order-proof upsert) also works
    assert(SnapshotTable.mergeLatest(spark, t,
      Seq((4L, "p0", 1000L)).toDF("id", "k", "v"), "id",
      orderCols = Seq("v")).isDefined)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter(col("id") === 4L).select("v").head().getLong(0) == 1000L)
    // deleting EVERY row must not wedge the table: a later merge
    // bootstraps the empty partitioned snapshot through the same
    // selective path
    assert(SnapshotTable.merge(spark, t,
      spark.emptyDataset[(Long, String, Long)].toDF("id", "k", "v"),
      SnapshotTable.readAsOf(spark, t, Int.MaxValue).select("id"),
      "id") > 0)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 0L)
    assert(SnapshotTable.merge(spark, t,
      Seq((1L, "p0", 7L)).toDF("id", "k", "v"),
      Seq.empty[Long].toDF("id"), "id") > 0)
    val reborn = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(reborn.count() == 1L)
    assert(reborn.inputFiles.forall(_.contains("/k=p0/")))
    // a merge with OUTSTANDING deletion vectors refuses loudly (the
    // flat table's full-rewrite tolerance would flatten this layout)
    SnapshotTable.commitPartitioned(spark, t,
      Seq((2L, "p1", 8L)).toDF("id", "k", "v"), "k")
    assert(SnapshotTable.deleteWhere(spark, t, col("id") === 1L).isDefined)
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, t,
        Seq((3L, "p0", 9L)).toDF("id", "k", "v"),
        Seq.empty[Long].toDF("id"), "id")
    }
    assert(err.getMessage.contains("absorbDeletes"), err.getMessage)
    SnapshotTable.absorbDeletes(spark, t)
    assert(SnapshotTable.merge(spark, t,
      Seq((3L, "p0", 9L)).toDF("id", "k", "v"),
      Seq.empty[Long].toDF("id"), "id") > 0)
  }

  test("Z-order within partitions: directory pruning then zone-map boxes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partC-").toString
    val t = s"$dir/tbl"
    // 2 partitions × a 32×32 (x, y) grid each, committed range-ordered
    // by x so pre-Z zone maps are blind to y
    val rows = for (p <- 0 until 2; x <- 0L until 32L; y <- 0L until 32L)
      yield (s"p$p", x, y)
    SnapshotTable.commitPartitioned(spark, t,
      rows.toDF("part", "x", "y"), "part")
    assert(SnapshotTable.rewriteZordered(spark, t, "x", "y",
      nFiles = 16).isDefined)
    val z = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(z.count() == 2048L)
    // the rewrite stayed inside the hive directories, several files per
    // partition (z-stripes)
    assert(z.inputFiles.forall(_.matches(".*/part=p[01]/.*")),
      z.inputFiles.mkString(","))
    val perPart = z.inputFiles.count(_.contains("/part=p0/"))
    assert(perPart >= 4, s"expected z-stripes, got $perPart files in p0")
    // a 2-D box INSIDE one partition: directory pruning drops the other
    // partition, zone maps drop most z-stripes within this one
    val box = z.filter(col("part") === "p0" &&
      col("x") >= 4L && col("x") < 8L && col("y") >= 4L && col("y") < 8L)
    assert(box.count() == 16L)
    val scanned = scannedFiles(box)
    assert(scanned <= perPart / 2,
      s"z-within-partition scan read $scanned of $perPart p0 files")
  }

  test("merge-on-read deletes and absorb keep the hive layout intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partA-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      (1L to 40L).map(i => (i, s"p${i % 2}", i * 2L)).toDF("id", "k", "v"),
      "k")
    // PII-style delete across BOTH partitions: metadata-only vectors,
    // no data file rewritten, layout untouched
    assert(SnapshotTable.deleteWhere(spark, t,
      col("id") % 10 === 0L).isDefined)
    val live = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(live.count() == 36L)
    assert(live.filter(col("id") % 10 === 0L).count() == 0L)
    // count stays metadata-exact under vectors; bounds degrade
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(36L))
    // partition pruning still applies to the del-subtracted read (all
    // deleted ids are even = partition p0; p1 is untouched)
    assert(live.filter(col("k") === "p0").count() == 16L)
    assert(live.filter(col("k") === "p1").count() == 20L)
    // absorb rewrites only the affected files, back under hive dirs
    assert(SnapshotTable.absorbDeletes(spark, t).isDefined)
    val absorbed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(absorbed.count() == 36L)
    assert(absorbed.inputFiles.forall(_.matches(".*/k=p[01]/.*")),
      absorbed.inputFiles.mkString(","))
    assert(absorbed.filter(col("k") === "p0").collect()
      .map(_.getLong(0)).toSet == (1L to 40L)
        .filter(i => i % 2 == 0 && i % 10 != 0).toSet)
    // post-absorb: metaAgg fully eligible again on the hive layout
    val ma = SnapshotTable.metaAgg(spark, t)
      .filter(col("column") === "id").head()
    assert(ma.getAs[Long]("n_rows") == 36L && ma.getAs[Boolean]("bounds_exact"))
  }

  test("compact packs per partition; vacuum sweeps nested partition dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part6-").toString
    val t = s"$dir/tbl"
    // a streaming-sink-shaped tail: 6 tiny appends × 2 partitions
    (0 until 6).foreach { i =>
      SnapshotTable.commitPartitioned(spark, t,
        Seq((i.toLong, s"p${i % 2}", i * 10L)).toDF("id", "k", "v"), "k")
    }
    val before = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(before.inputFiles.length == 6)
    assert(SnapshotTable.compact(spark, t, 8L << 20, 128L << 20).isDefined)
    val after = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // one packed file per partition value, still under hive directories
    assert(after.inputFiles.length == 2,
      s"expected 2 packed files, got ${after.inputFiles.length}")
    assert(after.inputFiles.forall(p => p.contains("/k=p0/") ||
      p.contains("/k=p1/")), after.inputFiles.mkString(","))
    assert(after.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      (0 until 6).map(i => (i.toLong, s"p${i % 2}", i * 10L)))
    // pruning still holds on the packed layout
    assert(scannedFiles(after.filter(col("k") === "p1")) == 1)
    // vacuum: superseded micro-batch files AND their now-empty nested
    // partition dirs are gone
    SnapshotTable.vacuum(spark, t, keepVersions = 1)
    val dataDirs = new java.io.File(s"$t/data").listFiles()
    val fileCount = dataDirs.flatMap(d =>
      java.nio.file.Files.walk(d.toPath).iterator().asScala
        .filter(p => p.toFile.isFile &&
          !p.getFileName.toString.startsWith("."))).length
    assert(fileCount == 2, s"vacuum left $fileCount files")
    // no empty partition-dir litter from the swept commits
    assert(dataDirs.forall(d => d.listFiles().nonEmpty),
      "vacuum left empty commit dirs behind")
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 6L)
  }

  test("multi-level partitioning: nested dirs, subset pruning, layout discipline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part8-").toString
    val t = s"$dir/tbl"
    // the year/month feed layout: 2 years × 3 months × 10 rows
    val df = (0 until 60).map { i =>
      (i.toLong, 2023 + i % 2, (i % 3 + 1), s"v$i") }
      .toDF("id", "year", "month", "payload")
    SnapshotTable.commitPartitionedBy(spark, t, df, Seq("year", "month"))
    // nested hive directories in partition order
    val lvl1 = new java.io.File(s"$t/data").listFiles().head.listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(lvl1.toSeq == Seq("year=2023", "year=2024"))
    val lvl2 = new java.io.File(s"$t/data").listFiles().head.listFiles()
      .filter(_.isDirectory).head.listFiles().map(_.getName).sorted
    assert(lvl2.toSeq == Seq("month=1", "month=2", "month=3"))
    val back = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(back.columns.toSeq == Seq("id", "year", "month", "payload"))
    assert(back.count() == 60L)
    val total = back.inputFiles.length
    assert(total == 6, s"expected 6 files (one per year×month), got $total")
    // both-level point filter: exactly one directory's files
    assert(scannedFiles(back.filter(col("year") === 2024 &&
      col("month") === 2)) == 1)
    // prefix filter (year only): half the directories
    assert(scannedFiles(back.filter(col("year") === 2023)) == 3)
    // NON-prefix filter (month only): still prunes to a third — value
    // tuples are recorded per file, not resolved by directory walking
    assert(scannedFiles(back.filter(col("month") === 3)) == 2)
    // round trip of both reconstructed columns
    assert(back.filter(col("id") === 7L).select("year", "month").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((2024, 2)))
    // appends must keep the SAME multi-level layout (order included)
    intercept[IllegalArgumentException] {
      SnapshotTable.commitPartitionedBy(spark, t,
        Seq((99L, 2025, 1, "x")).toDF("id", "year", "month", "payload"),
        Seq("month", "year"))
    }
    SnapshotTable.commitPartitionedBy(spark, t,
      Seq((99L, 2025, 1, "x")).toDF("id", "year", "month", "payload"),
      Seq("year", "month"))
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue).count() == 61L)
    // per-partition compaction keeps the nested scheme
    assert(SnapshotTable.compact(spark, t, 8L << 20, 128L << 20).isDefined)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(packed.count() == 61L)
    assert(packed.inputFiles.forall(_.matches(".*/year=\\d+/month=\\d+/.*")),
      packed.inputFiles.mkString(","))
    assert(scannedFiles(packed.filter(col("year") === 2025)) == 1)
  }

  test("writeSpread salts a skewed partition across multiple files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part9-").toString
    val t = s"$dir/tbl"
    spark.conf.set("spark.graft.partitioned.writeSpread", "8")
    // wide shuffle so the 8 (value, salt) tuples spread over many
    // tasks; AQE off for the assertion — on a production-sized batch
    // it keeps the width, but it (correctly) coalesces this tiny
    // fixture back to one partition, which is exactly the "UP TO N"
    // semantics the knob promises
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // one dominant partition value: without the spread this would
      // serialize into a single task/file
      SnapshotTable.commitPartitioned(spark, t,
        (1L to 800L).map(i => (i, "hot")).toDF("id", "k"), "k")
    } finally {
      spark.conf.unset("spark.graft.partitioned.writeSpread")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val back = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(back.count() == 800L)
    assert(back.inputFiles.length >= 2,
      s"spread produced ${back.inputFiles.length} file(s)")
    assert(back.inputFiles.forall(_.contains("/k=hot/")))
    // pruning and values unharmed by the salt
    assert(back.filter(col("k") === "hot").count() == 800L)
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(800L))
    // a malformed knob fails EARLY with the conf key named
    spark.conf.set("spark.graft.partitioned.writeSpread", "four")
    try {
      val err = intercept[IllegalArgumentException] {
        SnapshotTable.commitPartitioned(spark, t,
          Seq((9L, "hot")).toDF("id", "k"), "k")
      }
      assert(err.getMessage.contains("writeSpread"), err.getMessage)
    } finally spark.conf.unset("spark.graft.partitioned.writeSpread")
    // compaction PACKS regardless of any session spread: one file per
    // partition value, always
    assert(SnapshotTable.compact(spark, t, 8L << 20, 128L << 20).isDefined)
    assert(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .inputFiles.length == 1)
  }

  test("the standard reader doorway serves the hive layout (partition col last)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part7-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v"), "k")
    val df = spark.read.format("graft.sources.SnapshotSourceProvider")
      .option("path", t).load()
    // the relation doorway reports hive order: data columns, then the
    // reconstructed partition column (Spark's own partitioned-table
    // convention)
    assert(df.columns.toSet == Set("id", "k", "v"))
    assert(df.columns.last == "k")
    assert(df.filter(col("k") === "b").select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 20L)))
  }

  test("time travel and change feed see partition values per version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitPartitioned(spark, t,
      Seq((1L, "a")).toDF("id", "k"), "k")
    SnapshotTable.commitPartitioned(spark, t,
      Seq((2L, "b")).toDF("id", "k"), "k")
    assert(SnapshotTable.readAsOf(spark, t, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a")))
    val feed = SnapshotTable.readChanges(spark, t, 1, 2).collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq(("insert", 2L, "b")))
  }
}
