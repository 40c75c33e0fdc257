package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Plain-SQL access to the snapshot table: `CREATE TABLE ... USING
  * graft.sources.SnapshotSourceProvider` registers a catalog name over
  * the table directory, and every SELECT resolves through the same
  * manifest-planned relation as `spark.read.format(...)` — zero-RPC
  * planning, zone-map skipping, bucket layout, and the deletion-vector
  * refusal all hold from SQL. Time travel in SQL = a table definition
  * pinned with `versionAsOf` in its OPTIONS (the V1-connector shape;
  * DML beyond SELECT goes through the DataFrame writer / SnapshotTable
  * API, as with any V1 connector). */
class SnapshotSqlSpec extends GraftSpec {

  private val fmt = "graft.sources.SnapshotSourceProvider"

  test("CREATE TABLE USING the snapshot provider serves SQL SELECTs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sql1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((4L, "d")).toDF("id", "v"), overwrite = false)
    spark.sql(s"CREATE TABLE snap_sql1 USING `$fmt` OPTIONS (path '$t')")
    try {
      val got = spark.sql("SELECT id, v FROM snap_sql1 ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      // filters + aggregates push through the same planned relation
      val n = spark.sql("SELECT count(*) FROM snap_sql1 WHERE id >= 3")
        .head().getLong(0)
      assert(n == 2L)
      // the session catalog caches the resolved relation (standard V1
      // semantics, same as a parquet table): a later commit appears
      // after REFRESH TABLE — and NOT before, which is exactly snapshot
      // isolation for repeated reads of the cached definition
      SnapshotTable.commit(spark, t,
        Seq((5L, "e")).toDF("id", "v"), overwrite = false)
      assert(spark.sql("SELECT count(*) FROM snap_sql1").head().getLong(0) == 4L)
      spark.sql("REFRESH TABLE snap_sql1")
      assert(spark.sql("SELECT count(*) FROM snap_sql1").head().getLong(0) == 5L)
    } finally spark.sql("DROP TABLE snap_sql1")
  }

  test("SQL time travel: a table definition pinned with versionAsOf") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sql2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a")).toDF("id", "v"), overwrite = false)
    SnapshotTable.commit(spark, t,
      Seq((9L, "z")).toDF("id", "v"), overwrite = true)
    spark.sql(
      s"CREATE TABLE snap_sql_v1 USING `$fmt` OPTIONS (path '$t', versionAsOf '1')")
    spark.sql(s"CREATE TABLE snap_sql_live USING `$fmt` OPTIONS (path '$t')")
    try {
      assert(spark.sql("SELECT id FROM snap_sql_v1").collect()
        .map(_.getLong(0)).toSeq == Seq(1L))
      assert(spark.sql("SELECT id FROM snap_sql_live").collect()
        .map(_.getLong(0)).toSeq == Seq(9L))
    } finally {
      spark.sql("DROP TABLE snap_sql_v1")
      spark.sql("DROP TABLE snap_sql_live")
    }
  }

  test("SQL reads refuse outstanding deletion vectors like the relation doorway") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sql3-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = false)
    spark.sql(s"CREATE TABLE snap_sql_del USING `$fmt` OPTIONS (path '$t')")
    try {
      SnapshotTable.deleteWhere(spark, t, col("id") === 1L)
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM snap_sql_del").collect()
      }
      assert(err.getMessage.contains("deletion vectors"),
        s"expected the deletion-vector refusal, got: ${err.getMessage}")
      // absorb retires the vectors; SQL then sees the post-delete state
      SnapshotTable.absorbDeletes(spark, t)
      assert(spark.sql("SELECT id FROM snap_sql_del").collect()
        .map(_.getLong(0)).toSeq == Seq(2L))
    } finally spark.sql("DROP TABLE snap_sql_del")
  }
}
