package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Struct-leaf zone maps + Blooms: `WHERE meta.k = v` must skip files
  * from the manifest alone, exactly as top-level predicates do — the
  * dominant predicate shape on crawl/event schemas, whose interesting
  * columns live one struct level down. */
class SnapshotNestedStatsSpec extends GraftSpec {

  private def scannedFiles(df: org.apache.spark.sql.DataFrame,
      rows: Long): Long = {
    assert(df.collect().length == rows)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  // one commit per disjoint range of meta.k (clustered layout: the
  // zone-map shape); meta.tag carries a string leaf, meta.inner.d a
  // depth-3 double leaf
  private def slice(i: Int) =
    spark.range(i * 100, (i + 1) * 100).select(
      col("id").as("doc"),
      struct(
        col("id").as("k"),
        concat(lit("t"), col("id")).as("tag"),
        struct((col("id") * lit(1.5)).as("d")).as("inner")).as("meta"))

  test("struct-leaf zone maps prune files from the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst1-").toString
    val t = s"$dir/tbl"
    (0 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // point probe on the long leaf: exactly the home file
    assert(scannedFiles(snap.filter(col("meta.k") === 250L), 1) == 1)
    // range probe: two of four files
    assert(scannedFiles(
      snap.filter(col("meta.k") >= 150L && col("meta.k") < 300L), 150) == 2)
    // string leaf point probe rides the same keys (byte-order bounds)
    assert(scannedFiles(snap.filter(col("meta.tag") === "t42"), 1) <= 2)
    // depth-3 double leaf
    assert(scannedFiles(snap.filter(col("meta.inner.d") === 300.0), 1) == 1)
    assert(scannedFiles(snap.filter(col("meta.inner.d") > 525.0), 49) == 1)
    // IsNotNull on a leaf with no nulls keeps everything (sound, cheap)
    assert(snap.filter(col("meta.k").isNotNull).count() == 400)
    // out-of-range probe: zero files
    assert(scannedFiles(snap.filter(col("meta.k") === 999L), 0) == 0)
  }

  test("leaf IS NULL / IS NOT NULL refute from the stored null counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst2-").toString
    val t = s"$dir/tbl"
    // file A: every meta.k null (parent struct non-null, leaf null);
    // file B: no nulls at all
    SnapshotTable.commit(spark, t,
      spark.range(0, 50).select(col("id").as("doc"),
        struct(lit(null).cast("long").as("k")).as("meta")).repartition(1),
      overwrite = false)
    SnapshotTable.commit(spark, t,
      spark.range(50, 100).select(col("id").as("doc"),
        struct(col("id").as("k")).as("meta")).repartition(1),
      overwrite = false)
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // IS NULL: file B (zero leaf nulls) refuted
    assert(scannedFiles(snap.filter(col("meta.k").isNull), 50) == 1)
    // IS NOT NULL: file A (all-null leaf) refuted
    assert(scannedFiles(snap.filter(col("meta.k").isNotNull), 50) == 1)
    // a comparison is vacuously refuted on the all-null file
    assert(scannedFiles(snap.filter(col("meta.k") === 60L), 1) == 1)
  }

  test("nested Blooms: GRAFT BLOOM (meta.k) refutes unclustered probes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst3-").toString
    val t = s"$dir/tbl"
    // interleaved EVEN keys: every file's leaf range straddles every
    // probe — only the Bloom can refute (the SnapshotBloomSpec shape,
    // one struct level down)
    def islice(i: Int) = spark.range(0, 250).select(
      col("id").as("doc"),
      struct((col("id") * 8 + i * 2).as("k"),
        concat(lit("s"), col("id") * 8 + i * 2).as("tag")).as("meta"))
    SnapshotTable.commit(spark, t, islice(0).repartition(1),
      overwrite = false)
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    // declaration through the SQL doorway, dotted grammar
    graftSql(s"GRAFT BLOOM '$t' (meta.k, meta.tag)").collect()
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, islice(i).repartition(1),
        overwrite = false))
    SnapshotTable.analyze(spark, t) // backfill the pre-declaration file
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    val probe = 2L * 8 + 2 * 2 // id 2 of slice 2
    assert(scannedFiles(snap.filter(col("meta.k") === probe), 1) == 1,
      "leaf Bloom must isolate the home file")
    assert(scannedFiles(snap.filter(col("meta.k") === 777L), 0) == 0,
      "an in-range absent leaf key is refuted everywhere")
    assert(scannedFiles(snap.filter(col("meta.tag") === s"s$probe"), 1) == 1)
    // DESCRIBE reflects the leaf declaration on the struct column AND
    // lists each stat-eligible leaf as its own dotted row
    val desc = SnapshotTable.describeColumns(spark, t).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(3))).toMap
    assert(desc("meta")._2, "struct column shows declared")
    assert(desc("meta.k") == ("bigint", true))
    assert(desc("meta.tag") == ("string", true))
    assert(desc("doc") == ("bigint", false))
    // soundness: every present key still found
    assert(snap.filter(col("meta.k") === 0L).count() == 1)
    // clearing resets the paths marker too
    SnapshotTable.setBloomColumns(spark, t, Seq.empty)
    val sc = SnapshotTable.readAsOf(spark, t, Int.MaxValue).schema
    assert(!sc("meta").metadata.contains(SnapshotTable.BloomPathsKey))
  }

  test("dotted-name collision: writer drops the stat, pruner stays sound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst4-").toString
    val t = s"$dir/tbl"
    // a top-level column literally named `meta.k` COEXISTS with struct
    // meta{k}: the dotted stat key is ambiguous, so the nested leaf
    // collects no stat and nested predicates must keep every file —
    // while the top-level `meta.k` column still prunes normally
    def cslice(i: Int) = spark.range(i * 10, (i + 1) * 10).select(
      col("id").as("meta.k"),
      struct((lit(100L) - col("id")).as("k")).as("meta"))
    (0 to 1).foreach(i =>
      SnapshotTable.commit(spark, t, cslice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 2)
    // nested probe: meta.k = 95 lives in file 0 (ids 0-9 → k 100..91);
    // the TOP-LEVEL column's stat says [0,9]/[10,19] — consulting it
    // would wrongly refute BOTH files. The guard keeps both.
    assert(scannedFiles(snap.filter(col("meta.k") === 95L), 1) == 2,
      "ambiguous dotted key must not prune nested predicates")
    // the top-level dotted column itself prunes by its own stat
    assert(scannedFiles(snap.filter(col("`meta.k`") === 15L), 1) == 1)
  }

  test("nested-nested collision: both dotted claimants drop, sound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst4b-").toString
    val t = s"$dir/tbl"
    // struct a{`b.c`: long, b: struct{c: long}} — BOTH leaves spell
    // dotted key 'a.b.c'; a stat stored under it would describe the
    // wrong column for one of them, so the writer must drop BOTH and
    // the pruner must keep every file for either probe
    def cslice(i: Int) = spark.range(i * 10, (i + 1) * 10).select(
      col("id").as("doc"),
      struct(
        col("id").as("b.c"),
        struct((lit(100L) - col("id")).as("c")).as("b")).as("a"))
    (0 to 1).foreach(i =>
      SnapshotTable.commit(spark, t, cslice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 2)
    // a.b.c = 95 lives in file 0 (ids 0-9 → c 100..91); consulting the
    // colliding `b.c` leaf's stat ([0,9]/[10,19]) would refute BOTH
    assert(scannedFiles(snap.filter(col("a.b.c") === 95L), 1) == 2,
      "nested-nested collision key must not prune")
    // the literal-dot leaf probes correctly too (its stat also dropped)
    assert(scannedFiles(
      snap.filter(col("a").getField("b.c") === 15L), 1) == 2)
    // the un-colliding sibling path still prunes normally
    assert(scannedFiles(snap.filter(col("doc") === 15L), 1) == 1)
    // and GRAFT STATS never serves an ambiguous dotted row
    assert(SnapshotTable.metaAgg(spark, t).collect()
      .count(_.getString(0).startsWith("a.b")) == 0)
  }

  test("budget-truncated nested coverage degrades honestly, ANALYZE repairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst4c-").toString
    val t = s"$dir/tbl"
    // wide{f00..f59} eats 60 of the 64-leaf budget; tail{g0..g9} gets
    // only g0..g3 enumerated — g4..g9 carry NO stats in commit 1
    def wide = struct(
      (0 until 60).map(i => lit(i.toLong).as(f"f$i%02d")): _*)
    def tail(off: Long) = struct(
      (0 until 10).map(i => (col("id") + lit(off + i)).as(s"g$i")): _*)
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id"),
        wide.as("wide"), tail(0L).as("tail")).repartition(1),
      overwrite = false)
    // over-budget leaves are not enumerated at all yet
    val ma1 = SnapshotTable.metaAgg(spark, t)
      .collect().map(_.getString(0)).toSet
    assert(ma1.contains("tail.g3") && !ma1.contains("tail.g4"))
    // dropping the wide struct frees the budget: tail.g4.. become
    // enumerated — but commit-1's file has VALUES for them with no
    // stat, and its marker must NOT vouch "absent → all null, exact"
    SnapshotTable.dropColumn(spark, t, "wide")
    val ma2 = SnapshotTable.metaAgg(spark, t)
      .collect().map(r => r.getString(0) -> r).toMap
    val g4 = ma2("tail.g4")
    assert(g4.isNullAt(3) && !g4.getBoolean(10),
      "budget-dropped leaf must degrade to unknown, not claim exact")
    // in-budget leaves from commit 1 keep their exact accounting
    assert(ma2("tail.g0").getBoolean(10))
    // ANALYZE recollects under the slim schema and restores exactness
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val ma3 = SnapshotTable.metaAgg(spark, t)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ma3("tail.g4").getBoolean(10) &&
      ma3("tail.g4").getLong(4) == 4L && ma3("tail.g4").getLong(5) == 13L)
  }

  test("nested stats survive compaction, merge, and ANALYZE recollection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst5-").toString
    val t = s"$dir/tbl"
    (0 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    // selective merge rewrites one file; its nested stats recollect
    SnapshotTable.merge(spark, t,
      spark.range(0, 1).select(lit(250L).as("doc"),
        struct(lit(250L).as("k"), lit("patched").as("tag"),
          struct(lit(375.0).as("d")).as("inner")).as("meta")),
      spark.range(0, 1).select(lit(-1L).as("doc")).filter(lit(false)),
      "doc")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // the rewrite split slice 2 into survivor (200-299 minus 250) +
    // upsert file (250,250): both straddle the probe — but the OTHER
    // three slices are refuted by the recollected nested stats
    assert(scannedFiles(snap.filter(col("meta.k") === 250L), 1) <= 2)
    assert(scannedFiles(snap.filter(col("meta.k") === 50L), 1) == 1)
    assert(snap.filter(col("meta.k") === 250L).head()
      .getStruct(1).getString(1) == "patched")
    // compaction packs to one file with fresh nested stats
    assert(SnapshotTable.compact(spark, t, 64L * 1024 * 1024,
      128L * 1024 * 1024).nonEmpty)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(packed.inputFiles.length == 1)
    assert(scannedFiles(packed.filter(col("meta.k") === 999L), 0) == 0)
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    assert(scannedFiles(SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .filter(col("meta.k") === 250L), 1) == 1)
  }

  test("GRAFT STATS serves struct leaves like flat columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst7-").toString
    val t = s"$dir/tbl"
    (0 to 1).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    val ma = SnapshotTable.metaAgg(spark, t)
      .collect().map(r => r.getString(0) -> r).toMap
    // dotted logical rows exist with exact metadata-served aggregates
    val mk = ma("meta.k")
    assert(mk.getLong(2) == 200L && mk.getLong(3) == 200L) // rows, nonnull
    assert(mk.getLong(4) == 0L && mk.getLong(5) == 199L)   // min/max long
    assert(mk.getBoolean(10), "bounds must be exact")
    val md = ma("meta.inner.d")
    assert(md.getDouble(6) == 0.0 && md.getDouble(7) == 298.5)
    val mt = ma("meta.tag")
    assert(mt.getString(8) == "t0" && mt.getString(9) == "t99")
    // NDV sketch rides the dotted key too (exact below K here? 200 > 64
    // → KMV estimate; just assert it is served and sane)
    assert(!mk.isNullAt(11) && mk.getDouble(11) > 100.0)
    // pre-v3 manifests: strip the coverage markers — nested rows must
    // DEGRADE (absent nested stat is ambiguous), while a top-level
    // column with stats in every file stays exact
    val cd = new org.apache.hadoop.fs.Path(t, "_commits")
    val fs = cd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(cd).map(_.getPath)
      .filter(_.getName.matches("v\\d+\\.txt")).maxBy(_.getName)
    val text = {
      val in = fs.open(latest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    // strip the coverage markers AND drop one file's meta.k stat —
    // the ambiguous shape a pre-v3 writer would leave behind
    val noMark = text.replace(s";*:${SnapshotTable.StatsFormatVersion}", "")
    val firstDataLine = text.linesIterator.find(!_.startsWith("#")).get
    val kb64 = java.util.Base64.getEncoder
      .encodeToString("meta.k".getBytes("UTF-8"))
    val degraded = noMark.replace(
      firstDataLine.replace(s";*:${SnapshotTable.StatsFormatVersion}", ""),
      firstDataLine.split("\t").zipWithIndex.map { case (fld, i) =>
        if (i == 3) fld.split(";").filterNot(_.startsWith(kb64 + ":"))
          .mkString(";")
        else fld
      }.mkString("\t")
        .replace(s";*:${SnapshotTable.StatsFormatVersion}", ""))
    val out = fs.create(latest, true)
    out.write(degraded.getBytes("UTF-8")); out.close()
    val ma2 = SnapshotTable.metaAgg(spark, t)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ma2("meta.k").isNullAt(3) && !ma2("meta.k").getBoolean(10),
      "an unmarked statless nested path must degrade to unknown")
    assert(ma2("doc").getBoolean(10),
      "a path with stats in every file stays exact unmarked")
  }

  test("nested skipping composes with hive directory pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst8-").toString
    val t = s"$dir/tbl"
    // two partitions x two nc-banded files each: a (partition, leaf)
    // predicate must prune directories FIRST (driver-side) and then
    // zone-map-skip within the surviving directory via the dotted key
    (0 to 3).foreach { i =>
      graft.sources.SnapshotTable.commitPartitioned(spark, t,
        spark.range(i * 100, (i + 1) * 100).select(
          lit(if (i < 2) "a" else "b").as("p"),
          col("id").as("doc"),
          struct(col("id").as("k")).as("meta")).repartition(1),
        "p", overwrite = false)
    }
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // p=a holds meta.k 0-199 in two files; the point probe must plan
    // ONE file (directory pruning drops p=b, the leaf zone map drops
    // the other a-file)
    assert(scannedFiles(
      snap.filter(col("p") === "a" && col("meta.k") === 150L), 1) == 1)
    // leaf-only predicate: directory pruning cannot bite, zone maps
    // keep exactly the home file across both directories
    assert(scannedFiles(snap.filter(col("meta.k") === 250L), 1) == 1)
    // out-of-range in the surviving directory: zero files
    assert(scannedFiles(
      snap.filter(col("p") === "a" && col("meta.k") === 300L), 0) == 0)
  }

  test("ZORDER BY a struct leaf clusters it for nested skipping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst9-").toString
    val t = s"$dir/tbl"
    // UNCLUSTERED: meta.k and doc are independent shuffles of 0..1023,
    // committed as 8 random files — every file straddles every band
    val rnd = spark.range(0, 1024).select(
      col("id").as("doc"),
      struct(pmod(col("id") * 389 + 71, lit(1024)).as("k")).as("meta"))
    graft.sources.SnapshotTable.commit(spark, t, rnd.repartition(8),
      overwrite = false)
    val before = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(before.inputFiles.length == 8)
    assert(scannedFiles(before.filter(
      col("meta.k") >= 0L && col("meta.k") < 64L), 64) == 8,
      "pre-zorder every file straddles the band")
    // the SQL doorway accepts the dotted dimension
    def graftSql(sql: String) =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        new GraftSqlParser(spark.sessionState.sqlParser, Some(spark))
          .parsePlan(sql))
    assert(!graftSql(s"GRAFT OPTIMIZE '$t' ZORDER BY (meta.k, doc) FILES 8")
      .head().isNullAt(0))
    val after = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(after.inputFiles.length == 8)
    // a 64-wide band on the LEAF now scans a strict subset, and the
    // answer is unchanged
    assert(scannedFiles(after.filter(
      col("meta.k") >= 0L && col("meta.k") < 64L), 64) <= 4,
      "post-zorder the leaf band must prune most files")
    assert(scannedFiles(after.filter(col("doc") >= 0L && col("doc") < 64L),
      64) <= 4, "the second dimension prunes too")
    assert(after.count() == 1024)
    // unresolvable dimension refused BEFORE any rewrite
    intercept[IllegalArgumentException] {
      SnapshotTable.rewriteZorderedBy(spark, t, Seq("meta.nope", "doc"))
    }
  }

  test("refusals: non-leaf, unhashable, and too-deep Bloom declarations") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nst6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 5).select(col("id").as("doc"),
        struct(col("id").as("k"),
          array(col("id")).as("arr"),
          (col("id") * 0.5).as("w")).as("meta")),
      overwrite = false)
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("meta.nope")) }
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("meta.arr")) }
    // double leaves are kind 'd' — not hashable, same as top level
    val bad = intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("meta.w")) }
    assert(bad.getMessage.contains("hashable"))
    // a valid leaf declares fine alongside a top-level column
    assert(SnapshotTable.setBloomColumns(spark, t,
      Seq("doc", "meta.k")) > 0)
  }
}
