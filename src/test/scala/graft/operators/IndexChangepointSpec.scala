package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[LayoutOps.layoutGlobalIndex]] two-phase numbering vs the naive
  * global window, and [[AnalyticsOps.eventsChangepoint]] CUSUM peak on a
  * planted level shift. */
class IndexChangepointSpec extends GraftSpec {

  test("global index: bit-identical to the single-window naive answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gi-").toString
    // non-contiguous, shuffled ids across many input splits
    val ids = scala.util.Random.shuffle((1 to 5000).map(_ * 7L).toList)
    ids.map(i => (i, s"doc $i", "en", "t", i % 97))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LayoutOps.layoutGlobalIndex(spark, dir)
      .select("doc_id", "global_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = ids.sorted.zipWithIndex.map { case (id, i) => (id, i + 1L) }
    assert(got == expected)
  }

  test("changepoint: CUSUM peaks at a planted level shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cp-").toString
    // 20 events of 1.00 then 20 events of 5.00 -> |D_t| peaks at t=20
    val rows = (1 to 40).map { i =>
      val v = if (i <= 20) 1.0 else 5.0
      (i.toLong, f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00", 1L, "x", v)
    }
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsChangepoint(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // n=40, T=20*100+20*500=12000; at t=20: D = 40*2000 - 20*12000 =
    // -160000 -> |D| = 160000, the maximum
    assert(got == Seq(("x", 40L, 20L, 20L)))
    val full = AnalyticsOps.eventsChangepoint(spark, dir).collect()
    assert(full.head.getAs[Long]("peak_dev_n") == 160000L)
  }
}
