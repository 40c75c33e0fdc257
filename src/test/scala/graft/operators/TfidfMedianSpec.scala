package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[TextOps.textTfidfKeywords]], [[AdvancedOps.q47WeightedMedian]], and
  * [[AnalyticsOps.eventsDeciles]] on planted fixtures. */
class TfidfMedianSpec extends GraftSpec {

  test("tfidf keywords: rare terms outrank common, corpus-wide terms drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tk-").toString
    // "the" appears in all 3 docs -> idf 0 -> never a keyword.
    // doc 1's "zebra zebra" (tf 2, df 1) must outrank "apple" (tf 1, df 2).
    Seq(
      (1L, "the zebra zebra apple", "en", "t", 21L),
      (2L, "the apple", "en", "t", 9L),
      (3L, "the banana", "en", "t", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.textTfidfKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // ln(3/1)=1.0986, ln(3/2)=0.405: doc1 zebra (2*1.0986) > apple (0.405)
    assert(got == Seq(
      (1L, 1L, "zebra"), (1L, 2L, "apple"),
      (2L, 1L, "apple"), (3L, 1L, "banana")))
  }

  test("weighted median: weight mass decides, not row count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wm-").toString
    // flag A: price 1.00 x qty 1, price 2.00 x qty 1, price 3.00 x qty 10
    //   -> total 12, half 6 -> first cum >= 6 is price 3.00 (cum 12)
    // flag B: symmetric qty -> lower median at 1.00 (cum 5, 2*5 >= 10)
    Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0),
      ("B", 1.0, 5.0), ("B", 2.0, 5.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = AdvancedOps.q47WeightedMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 300L, 12L), ("B", 100L, 10L)))
  }

  test("deciles: equal-population buckets, exact bounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-").toString
    // 20 rows of type x with cents 1..20 -> each decile holds 2 rows,
    // decile d covers [2d-1, 2d]
    val rows = (1 to 20).map(i =>
      (i.toLong, f"2024-01-01 10:${i}%02d:00", 1L, "x", i / 100.0))
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsDeciles(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == (1 to 10).map(d => (d.toLong, 2L, 2L * d - 1, 2L * d)))
  }
}
