package graft.operators

import graft.{GraftSpec, Tables}

/** [[AnalyticsOps.mvIncrementalRefresh]] semantics on a planted orders
  * fixture (group deletion, price-bump updates, zero mismatches) and
  * [[AnalyticsOps.sketchHllDistinct]] audit verdicts on real data. */
class MvHllSpec extends GraftSpec {

  private def writeOrders(rows: Seq[(Long, Long, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orders-").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("incremental refresh: updates applied, emptied groups leave, audit 0") {
    // cust 1: orders 1 (kept), 10 (update: +500 cents), 20 (delete)
    // cust 2: order 40 only (delete) -> group vanishes
    // cust 3: orders 3, 13 (kept)
    val dir = writeOrders(Seq(
      (1L, 1L, 10.00), (10L, 1L, 20.00), (20L, 1L, 30.00),
      (40L, 2L, 99.00),
      (3L, 3L, 5.00), (13L, 3L, 7.00)))
    val r = AnalyticsOps.mvIncrementalRefresh(spark, dir).collect()(0)
    // groups: cust1 (2 orders: 1000 + 2000+500), cust3 (2 orders: 500+700)
    assert(r.getLong(0) == 2L)   // n_groups
    assert(r.getLong(1) == 4L)   // n_orders
    assert(r.getLong(2) == (1000L + 2500L + 500L + 700L))
    assert(r.getLong(3) == 0L)   // n_mismatch
  }

  test("hll estimates: direct and shard-merged both within bound on sf0.001") {
    val rows = AnalyticsOps.sketchHllDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} direct estimate out of bound")
      assert(r.getBoolean(3), s"${r.getString(0)} merged estimate out of bound")
      assert(r.getLong(1) > 0)
    }
    // exact counts agree with a direct computation
    val exact = Tables.events(spark, sfDir)
      .filter("user_id IS NOT NULL")
      .groupBy("event_type").agg(org.apache.spark.sql.functions
        .countDistinct("user_id").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }
}
