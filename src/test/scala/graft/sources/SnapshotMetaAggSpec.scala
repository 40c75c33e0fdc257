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

  test("refused under deletion vectors; eligible again after absorbDeletes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-magg2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v"), overwrite = false)
    SnapshotTable.deleteWhere(spark, t, col("k") === 10L)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.metaAgg(spark, t)
    }
    assert(e.getMessage.contains("deletion"), e.getMessage)
    // count(*) alone stays exact under deletes, via rowCount
    assert(SnapshotTable.rowCount(spark, t, Int.MaxValue).contains(9L))
    SnapshotTable.absorbDeletes(spark, t)
    val k = row(SnapshotTable.metaAgg(spark, t), "k")
    // the absorbed rewrite re-collected stats: the deleted max is gone
    assert(k.getAs[Long]("n_rows") == 9L && k.getAs[Long]("max_long") == 9L)
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
}
