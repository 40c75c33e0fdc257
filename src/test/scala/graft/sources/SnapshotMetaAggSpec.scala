package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Metadata-served aggregates ([[SnapshotTable.metaAgg]]): exactness
  * against a real scan, the zero-data-read guarantee (proven by
  * garbaging every data file first), the deletion-vector refusal, and
  * null accounting under schema evolution. */
class SnapshotMetaAggSpec extends GraftSpec {

  private def row(df: org.apache.spark.sql.DataFrame, column: String): Row =
    df.filter(col("column") === column).head()

  test("min/max/counts match a real scan; answered with data files garbaged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg1-").toString
    val t = s"$dir/tbl"
    val data = Seq(
      (5L, 2.5, "pear"), (1L, -3.25, "apple"), (9L, 0.0, "zest"),
      (3L, 7.125, "fig"), (7L, -8.5, "kiwi"))
    SnapshotTable.commit(spark, t,
      data.take(3).toDF("k", "v", "s"), overwrite = false)
    SnapshotTable.commit(spark, t,
      data.drop(3).toDF("k", "v", "s"), overwrite = false)
    // destroy every data file: a metaAgg that touches ANY of them now
    // throws a parquet error — surviving proves manifest-only planning
    val root = new org.apache.hadoop.fs.Path(t, "data")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var garbaged = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) {
        val out = fs.create(f.getPath, true)
        out.write("not parquet".getBytes("UTF-8")); out.close()
        garbaged += 1
      }
    }
    assert(garbaged >= 2, "expected at least one data file per commit")
    val ma = SnapshotTable.metaAgg(spark, t)
    val k = row(ma, "k")
    assert(k.getAs[Long]("n_rows") == 5L && k.getAs[Long]("n_nonnull") == 5L)
    assert(k.getAs[Long]("min_long") == 1L && k.getAs[Long]("max_long") == 9L)
    assert(k.getAs[Boolean]("bounds_exact"))
    val v = row(ma, "v")
    assert(v.getAs[Double]("min_double") == -8.5 &&
      v.getAs[Double]("max_double") == 7.125)
    val s0 = row(ma, "s")
    assert(s0.getAs[String]("min_string") == "apple" &&
      s0.getAs[String]("max_string") == "zest")
  }

  test("under deletion vectors: exact n_rows, unknown bounds; full after absorbDeletes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"), overwrite = false)
    SnapshotTable.deleteWhere(spark, t, col("k") === 10L)
    // NOT refused: the live row count is still manifest-exact (each
    // position deletes at most once), but the deleted row may have been
    // the extremal or the null one — bounds and non-null counts degrade
    // to unknown rather than serving the pre-delete values
    val kd = row(SnapshotTable.metaAgg(spark, t), "k")
    assert(kd.getAs[Long]("n_rows") == 9L)
    assert(kd.isNullAt(kd.fieldIndex("n_nonnull")))
    assert(kd.isNullAt(kd.fieldIndex("min_long")) &&
      kd.isNullAt(kd.fieldIndex("max_long")))
    assert(!kd.getAs[Boolean]("bounds_exact"))
    // agrees with the dedicated count doorway
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(9L))
    SnapshotTable.absorbDeletes(spark, t)
    val k = row(SnapshotTable.metaAgg(spark, t), "k")
    // the absorbed rewrite re-collected stats: the deleted max is gone
    assert(k.getAs[Long]("n_rows") == 9L && k.getAs[Long]("max_long") == 9L)
    assert(k.getAs[Long]("n_nonnull") == 9L && k.getAs[Boolean]("bounds_exact"))
  }

  test("schema evolution: pre-column files count as all-null; all-null bounds stay null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      overwrite = false)
    // adds column v: the two v1 rows read NULL for it
    SnapshotTable.commit(spark, t,
      Seq((3L, "c", 5.0), (4L, "d", 6.0)).toDF("k", "s", "v"),
      overwrite = false)
    // adds column w holding ONLY nulls: min/max undefined, exactly
    SnapshotTable.commit(spark, t,
      Seq((5L, "e", 7.0)).toDF("k", "s", "v")
        .withColumn("w", lit(null).cast("long")),
      overwrite = false)
    val ma = SnapshotTable.metaAgg(spark, t)
    val v = row(ma, "v")
    assert(v.getAs[Long]("n_rows") == 5L && v.getAs[Long]("n_nonnull") == 3L)
    assert(v.getAs[Double]("min_double") == 5.0 &&
      v.getAs[Double]("max_double") == 7.0)
    assert(v.getAs[Boolean]("bounds_exact"))
    val w = row(ma, "w")
    assert(w.getAs[Long]("n_nonnull") == 0L)
    assert(w.isNullAt(w.fieldIndex("min_long")) &&
      w.isNullAt(w.fieldIndex("max_long")))
    assert(w.getAs[Boolean]("bounds_exact"))
    // a historical version answers from ITS manifest (time travel)
    val v1 = row(SnapshotTable.metaAgg(spark, t, asOf = 1), "k")
    assert(v1.getAs[Long]("n_rows") == 2L && v1.getAs[Long]("max_long") == 2L)
  }

  test("coverage marker: unmarked statless files degrade, marked stay exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg6-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      overwrite = false)
    // evolution adds v: the v1 files lack its stat but carry the current `*:N`
    // coverage marker — so their rows are PROVABLY all-null for v and
    // the accounting stays exact
    SnapshotTable.commit(spark, t,
      Seq((3L, "c", 5.0), (4L, "d", 6.0)).toDF("k", "s", "v"),
      overwrite = false)
    val exactV = row(SnapshotTable.metaAgg(spark, t), "v")
    assert(exactV.getAs[Long]("n_nonnull") == 2L &&
      exactV.getAs[Boolean]("bounds_exact"))
    // simulate a PRE-v15 writer: strip the coverage markers from the
    // latest manifest. A statless file is then ambiguous (it may
    // predate the column's stat ELIGIBILITY, not the column), so
    // claiming "its rows are null for v" would be a silent lie —
    // metaAgg must degrade v to unknown, and the catalog must stop
    // serving nullCount/min/max for it.
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
    out.write(text.replace(s";*:${SnapshotTable.StatsFormatVersion}", "")
      .getBytes("UTF-8")); out.close()
    val ma = SnapshotTable.metaAgg(spark, t)
    val v = row(ma, "v")
    assert(v.isNullAt(v.fieldIndex("n_nonnull")) &&
      !v.getAs[Boolean]("bounds_exact") &&
      v.isNullAt(v.fieldIndex("min_double")),
      s"unmarked statless file must degrade v: $v")
    // k has a stat in EVERY file — no ambiguity, stays exact unmarked
    val k = row(ma, "k")
    assert(k.getAs[Long]("n_nonnull") == 4L && k.getAs[Boolean]("bounds_exact"))
    // the planner-visible catalog view degrades the same way (NDV-only)
    val ps = SnapshotTable.plannerStats(spark, t)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ps("v").isNullAt(4) && ps("v").isNullAt(6) && ps("v").isNullAt(7),
      s"catalog must not claim nullCount/bounds for v: ${ps("v")}")
    assert(!ps("v").isNullAt(3), "the NDV sketch itself is still served")
    assert(ps("k").getString(6) == "1" && ps("k").getString(7) == "4")
  }

  test("NDV sketch: exact below K, merged across appends, dropped by row removal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg4-").toString
    val t = s"$dir/tbl"
    // 3 appends with OVERLAPPING values: cumulative distinct = 40 < K=64,
    // so the manifest sketch is exact — and a per-commit (non-merged)
    // sketch would see only ≤20 each
    SnapshotTable.commit(spark, t, (1L to 20L).toDF("k"), overwrite = false)
    SnapshotTable.commit(spark, t, (11L to 30L).toDF("k"), overwrite = false)
    SnapshotTable.commit(spark, t, (21L to 40L).toDF("k"), overwrite = false)
    def ndv(asOf: Int = Int.MaxValue): Option[Double] = {
      val r = row(SnapshotTable.metaAgg(spark, t, asOf), "k")
      if (r.isNullAt(r.fieldIndex("est_ndv"))) None
      else Some(r.getAs[Double]("est_ndv"))
    }
    assert(ndv().contains(40.0))
    assert(ndv(asOf = 2).contains(30.0), "time travel serves v2's sketch")
    // appends of already-seen values never inflate it
    SnapshotTable.commit(spark, t, (1L to 40L).toDF("k"), overwrite = false)
    assert(ndv().contains(40.0))
    // saturated regime: the estimator lands within 30% of truth (K=64
    // ⇒ ~12.6% RSE; deterministic for this fixed corpus)
    SnapshotTable.commit(spark, t, (1L to 5000L).toDF("k"), overwrite = true)
    val est = ndv().get
    assert(math.abs(est - 5000.0) <= 1500.0, s"est_ndv $est vs 5000")
    // a row-removing op drops the sketch (bottom-k cannot subtract)...
    SnapshotTable.deleteWhere(spark, t, col("k") === 1L)
    SnapshotTable.absorbDeletes(spark, t)
    assert(ndv().isEmpty, "NDV must be unknown after deleteWhere")
    // ...and an overwrite recollects from scratch
    SnapshotTable.commit(spark, t, (1L to 7L).toDF("k"), overwrite = true)
    assert(ndv().contains(7.0))
    // compaction carries the sketch (rows unchanged)
    SnapshotTable.commit(spark, t, Seq(8L).toDF("k"), overwrite = false)
    if (SnapshotTable.compact(spark, t, 1L << 20, 1L << 30).nonEmpty)
      assert(ndv().contains(8.0))
  }

  test("NDV under schema evolution: a new column's sketch starts at its first batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t, Seq(1L, 2L).toDF("k"), overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((3L, "x"), (4L, "y")).toDF("k", "s"), overwrite = false)
    val ma = SnapshotTable.metaAgg(spark, t)
    assert(row(ma, "k").getAs[Double]("est_ndv") == 4.0)
    // old rows are all-null for s — 2 non-null distincts is the truth
    assert(row(ma, "s").getAs[Double]("est_ndv") == 2.0)
  }
}
