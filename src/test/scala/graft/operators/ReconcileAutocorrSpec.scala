package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[QualityOps.priceReconcile]] header-vs-lines accounting and
  * [[AnalyticsOps.eventsAutocorr]] closed-form correlation on planted
  * series. */
class ReconcileAutocorrSpec extends GraftSpec {

  test("price reconcile: exact, near, divergent, and lineless orders") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-").toString
    // order 1 (status O): one line 100.00, no discount/tax -> exact match
    // order 2 (status O): line sums to 200.00, header 200.50 -> within $1
    // order 3 (status F): line sums to 50.00, header 99.00 -> divergent
    // order 4 (status F): no lines at all -> lineless
    Seq(
      (1L, 100.0, 0.0, 0.0),
      (2L, 200.0, 0.0, 0.0),
      (3L, 50.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "O", 100.0), (2L, "O", 200.5), (3L, "F", 99.0), (4L, "F", 77.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = QualityOps.priceReconcile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("F", 2L, 1L, 0L, 0L, 4900L),
      ("O", 2L, 0L, 1L, 2L, 50L)))
  }

  test("autocorr: rising series ~ +1e6, alternating series negative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ac-").toString
    // type up: 1,2,3,4,5 -> lag-1 pairs perfectly linear -> exactly 1e6
    // type alt: 1,5,1,5,1 -> pairs (1,5),(5,1),(1,5),(5,1) -> corr -1e6
    val up = (1 to 5).map(i =>
      (i.toLong, f"2024-01-01 10:0$i:00", 1L, "up", i.toDouble))
    val alt = (1 to 5).map(i =>
      (10L + i, f"2024-01-01 10:0$i:00", 1L, "alt",
        if (i % 2 == 1) 1.0 else 5.0))
    (up ++ alt).toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsAutocorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("alt", 4L, -1000000L), ("up", 4L, 1000000L)))
  }
}
