package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[AnalyticsOps.eventsNewUsers]] first-seen/cumulative arithmetic and
  * [[SimilarityOps.embedCentroidDistances]] on prototypes with known
  * geometry (orthogonal → 0, parallel → 1e6). */
class NewUsersCentroidSpec extends GraftSpec {

  test("new users: first-seen day only, cumulative is a running sum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nu-").toString
    // u1 first on d1 (again d2, d3); u2 first d1; u3 first d2; u4 first d3
    Seq(
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-02 10:00:00", 1L),
      (3L, "2024-01-03 10:00:00", 1L), (4L, "2024-01-01 11:00:00", 2L),
      (5L, "2024-01-02 09:00:00", 3L), (6L, "2024-01-03 09:00:00", 4L))
      .toDF("event_id", "tss", "user_id")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsNewUsers(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 3L), ("2024-01-03", 1L, 4L)))
  }

  test("centroid distances: orthogonal prototypes 0, parallel 1e6") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cd-").toString
    def vec(axis: Int, scale: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) scale else 0.0f)
    // label 0: axis-0; label 1: axis-1 (orthogonal to 0);
    // label 2: axis-0 at a different scale (parallel to 0)
    val rows = Seq(
      (1L, vec(0, 1.0f), 0), (2L, vec(0, 3.0f), 0),
      (3L, vec(1, 2.0f), 1),
      (4L, vec(0, 5.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SimilarityOps.embedCentroidDistances(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got((0, 1)) == 0L)
    assert(got((1, 2)) == 0L)
    assert(got((0, 2)) == 1000000L)
  }
}
