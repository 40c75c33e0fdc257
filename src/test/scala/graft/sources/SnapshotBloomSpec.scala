package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Declared-column per-file membership Blooms: manifest zone maps gain
  * a point-probe refuter for UNCLUSTERED tables, where every file's
  * min/max straddles every key and range pruning keeps everything. */
class SnapshotBloomSpec extends GraftSpec {

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

  // four interleaved slices: every file's key range spans the whole
  // domain (ids 0,4,8,... / 1,5,9,... / ...), so min/max CANNOT prune a
  // point probe — only the Bloom can. Keys are EVEN (id*2) so an odd
  // probe is in-range but absent everywhere.
  private def slice(i: Int) =
    spark.range(0, 250).select((col("id") * 8 + i * 2).as("k"),
      concat(lit("s"), col("id") * 8 + i * 2).as("s"))

  test("declared Blooms prune unclustered point lookups; ANALYZE backfills") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm1-").toString
    val t = s"$dir/tbl"
    // slice 0 lands BEFORE the declaration — no Bloom on its file
    SnapshotTable.commit(spark, t, slice(0).repartition(1),
      overwrite = false)
    SnapshotTable.setBloomColumns(spark, t, Seq("k", "s"))
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.inputFiles.length == 4)
    // a key living in slice 2 only: range pruning keeps all 4 files;
    // the Bloom drops slices 1 and 3; slice 0 (pre-declaration, no
    // Bloom) is conservatively kept — a STRICT subset scan
    val probe = 2L * 8 + 2 * 2 // = id 2 of slice 2
    assert(scannedFiles(snap.filter(col("k") === probe), 1) <= 2,
      "bloom must refute the two non-matching bloomed files")
    // an in-range but ABSENT key (odd): every bloomed file refuted
    assert(scannedFiles(snap.filter(col("k") === 777L), 0) <= 1)
    // string probes prune the same way (UTF-8 byte hashing)
    assert(scannedFiles(snap.filter(col("s") === s"s$probe"), 1) <= 2)
    // IN-lists compose for free (mayEq per element)
    assert(scannedFiles(snap.filter(col("k").isin(probe, probe + 8)), 2) <= 2)
    // ANALYZE backfills the pre-declaration file in one pass
    assert(SnapshotTable.analyze(spark, t).nonEmpty)
    val snap2 = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(scannedFiles(snap2.filter(col("k") === probe), 1) <= 1,
      "post-ANALYZE every file carries a Bloom: exactly the home file")
    assert(scannedFiles(snap2.filter(col("k") === 777L), 0) == 0,
      "an absent key is refuted everywhere after the backfill")
    // soundness guard: every present key still found (no false refusal)
    assert(snap2.filter(col("k") === 0L).count() == 1)
    assert(snap2.filter(col("s") === "s16").count() == 1)
  }

  test("Blooms survive compaction and selective merge rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1),
      overwrite = false)
    SnapshotTable.setBloomColumns(spark, t, Seq("k"))
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    // a selective merge rewrites ONE slice's file — the rewritten file
    // recollects its Bloom (the declaration rides the schema marker)
    SnapshotTable.merge(spark, t,
      spark.range(0, 1).select(lit(16L).as("k"), lit("patched").as("s")),
      spark.range(0, 1).select(lit(-1L).as("k")).filter(lit(false)), "k")
    val afterMerge = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(afterMerge.filter(col("k") === 16L).head().getString(1) ==
      "patched")
    assert(scannedFiles(afterMerge.filter(col("k") === 777L), 0) <= 1,
      "rewritten + untouched bloomed files all refute the absent key")
    // compaction packs everything into one file and recollects ITS
    // Bloom from the same pass
    assert(SnapshotTable.compact(spark, t, 64L * 1024 * 1024,
      128L * 1024 * 1024).nonEmpty)
    val packed = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(packed.inputFiles.length == 1)
    assert(scannedFiles(packed.filter(col("k") === 777L), 0) == 0,
      "the packed file's Bloom refutes the absent key")
    assert(packed.filter(col("k") === 16L).count() == 1)
  }

  test("Blooms compose with RENAME COLUMN (physical-name keyed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1),
      overwrite = false)
    SnapshotTable.setBloomColumns(spark, t, Seq("k"))
    SnapshotTable.commit(spark, t, slice(1).repartition(1),
      overwrite = false)
    SnapshotTable.renameColumn(spark, t, "k", "key2")
    // post-rename appends keep collecting under the physical name
    (2 to 3).foreach(i =>
      SnapshotTable.commit(spark, t,
        slice(i).select(col("k").as("key2"), col("s")).repartition(1),
        overwrite = false))
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    assert(snap.columns.toSeq == Seq("key2", "s"))
    // probe on the LOGICAL name: pre- and post-rename Blooms both bite
    // (slice 0 predates the declaration — kept conservatively)
    assert(scannedFiles(snap.filter(col("key2") === 777L), 0) <= 1)
    val probe = 2L * 8 + 2 * 2
    assert(scannedFiles(snap.filter(col("key2") === probe), 1) <= 2)
    // declaring by the NEW logical name round-trips
    SnapshotTable.setBloomColumns(spark, t, Seq("key2", "s"))
    SnapshotTable.analyze(spark, t)
    assert(scannedFiles(
      SnapshotTable.readAsOf(spark, t, Int.MaxValue)
        .filter(col("key2") === 777L), 0) == 0)
  }

  test("date and decimal Blooms replay the internal-form hash exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm5-").toString
    val t = s"$dir/tbl"
    // interleaved slices again: every file's date range spans the whole
    // year and every file's money range spans the whole band — only the
    // Bloom can refute a point probe. Dates hash their epoch-DAY,
    // decimals their UNSCALED long (both the literal's internal form).
    def dslice(i: Int) = spark.range(0, 200)
      .selectExpr(s"date_add(DATE'2026-01-01', CAST((id * 8 + $i * 2) AS INT)) AS d",
        s"CAST((id * 8 + $i * 2) + 0.25 AS DECIMAL(12,2)) AS amt")
    SnapshotTable.commit(spark, t, dslice(0).repartition(1), overwrite = false)
    SnapshotTable.setBloomColumns(spark, t, Seq("d", "amt"))
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, dslice(i).repartition(1),
        overwrite = false))
    SnapshotTable.analyze(spark, t) // backfill slice 0
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // present date (slice 2, id 3): exactly its home file
    val hit = java.time.LocalDate.of(2026, 1, 1).plusDays(3 * 8 + 2 * 2)
    assert(scannedFiles(snap.filter(col("d") === lit(hit)), 1) <= 1)
    // absent (odd offset) date inside the global range: zero files
    val miss = java.time.LocalDate.of(2026, 1, 1).plusDays(777)
    assert(scannedFiles(snap.filter(col("d") === lit(miss)), 0) == 0)
    // decimal point probe: present exact amount vs absent same-scale
    assert(scannedFiles(
      snap.filter(col("amt") === lit(BigDecimal("28.25"))), 1) <= 1)
    assert(scannedFiles(
      snap.filter(col("amt") === lit(BigDecimal("777.25"))), 0) == 0)
    // soundness: every present value still found
    assert(snap.filter(col("d") === lit(hit)).count() == 1)
    assert(snap.filter(col("amt") === lit(BigDecimal("0.25"))).count() == 1)
  }

  test("Blooms survive the FULL-rewrite merge path (outstanding dels)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, slice(0).repartition(1),
      overwrite = false)
    SnapshotTable.setBloomColumns(spark, t, Seq("k"))
    (1 to 3).foreach(i =>
      SnapshotTable.commit(spark, t, slice(i).repartition(1),
        overwrite = false))
    SnapshotTable.analyze(spark, t)
    // a deletion vector forces the next merge onto the FULL-rewrite
    // path — the one that used to drop Bloom collection silently
    assert(SnapshotTable.deleteWhere(spark, t, col("k") === 16L).nonEmpty)
    SnapshotTable.merge(spark, t,
      spark.range(0, 1).select(lit(4L).as("k"), lit("patched").as("s")),
      spark.range(0, 1).select(lit(-1L).as("k")).filter(lit(false)), "k")
    val snap = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
    // declaration carried through the rewrite...
    assert(snap.schema("k").metadata.contains(SnapshotTable.BloomKey),
      "full merge must carry the Bloom declaration")
    // ...and the all-new files collected their Blooms in the same pass:
    // an in-range absent key is refuted EVERYWHERE, no ANALYZE needed
    assert(scannedFiles(snap.filter(col("k") === 777L), 0) == 0,
      "post-merge files must carry Blooms without an explicit ANALYZE")
    assert(snap.filter(col("k") === 4L).head().getString(1) == "patched")
    assert(snap.filter(col("k") === 16L).count() == 0)
  }

  test("a declaration never rides a read into ANOTHER table's commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm7-").toString
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    SnapshotTable.commit(spark, src, slice(0), overwrite = false)
    SnapshotTable.setBloomColumns(spark, src, Seq("k", "s"))
    // the foreign-read hazard: committing a bloom-declared table's read
    // into a fresh table must NOT import the declaration (collection
    // the dst owner never asked for)
    SnapshotTable.commit(spark, dst,
      SnapshotTable.readAsOf(spark, src, Int.MaxValue), overwrite = false)
    val sc = SnapshotTable.readAsOf(spark, dst, Int.MaxValue).schema
    assert(!sc.fields.exists(_.metadata.contains(SnapshotTable.BloomKey)),
      "BloomKey must be stripped from foreign reads entering a commit")
    // describeColumns reports the COLLECTIBLE state, not raw markers
    val desc = SnapshotTable.describeColumns(spark, dst)
      .select("column", "bloom").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(desc == Map("k" -> false, "s" -> false))
    assert(SnapshotTable.describeColumns(spark, src)
      .filter(col("column") === "k").head().getBoolean(3))
  }

  test("refusals and the unhashable-kind guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blm4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      spark.range(0, 10).select(col("id").as("k"),
        col("id").cast("double").as("w")), overwrite = false)
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("nope")) }
    // double rides kind 'd' — not hashable for membership (NaN/-0.0
    // equality pitfalls); refused with the kind named
    val bad = intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, t, Seq("w")) }
    assert(bad.getMessage.contains("hashable"))
    // declaring then clearing: the full-set contract removes markers
    SnapshotTable.setBloomColumns(spark, t, Seq("k"))
    SnapshotTable.setBloomColumns(spark, t, Seq.empty)
    val sc = SnapshotTable.readAsOf(spark, t, Int.MaxValue).schema
    assert(!sc("k").metadata.contains(SnapshotTable.BloomKey))
  }
}
