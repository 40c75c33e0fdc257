package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ground truth for [[AnalyticsOps.sketchKmvSetops]] on a planted corpus
  * whose sets fit inside the sketch (n < K): every estimate must then be
  * EXACT, and the exact union/intersection columns must equal a scalar
  * re-computation of the planted overlap. */
class KmvSketchSpec extends GraftSpec {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sub-K sets: estimates exact, overlap equals the planted truth") {
    // one day per event, so the element key is user*1000 + doy(Jan d) = d.
    // A = users 1..30, B = users 21..70 (overlap 10), C = users 100..109
    // (disjoint from both).
    val rows =
      (1L to 30L).map(u => Row(u, ts("2024-01-05 10:00:00"), u, "a", 1.0, "")) ++
      (21L to 70L).map(u => Row(u + 100, ts("2024-01-05 11:00:00"), u, "b", 1.0, "")) ++
      (100L to 109L).map(u => Row(u + 300, ts("2024-01-05 12:00:00"), u, "c", 1.0, "")) ++
      // duplicate events must not inflate the distinct sets
      (1L to 5L).map(u => Row(u + 500, ts("2024-01-05 13:00:00"), u, "a", 2.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), eventsSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = AnalyticsOps.sketchKmvSetops(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))

    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("exact_a") == 30L && ab.getAs[Long]("exact_b") == 50L)
    assert(ab.getAs[Long]("exact_inter") == 10L &&
      ab.getAs[Long]("exact_union") == 70L)
    // 70 < K: the union sketch holds everything — estimates are exact
    assert(ab.getAs[Double]("est_union") == 70.0)
    assert(ab.getAs[Double]("est_inter") == 10.0)
    assert(ab.getAs[Boolean]("union_ok"))

    val ac = got(("a", "c"))
    assert(ac.getAs[Long]("exact_inter") == 0L &&
      ac.getAs[Long]("exact_union") == 40L)
    assert(ac.getAs[Double]("est_inter") == 0.0 &&
      ac.getAs[Double]("est_union") == 40.0)

    val bc = got(("b", "c"))
    assert(bc.getAs[Long]("exact_union") == 60L &&
      bc.getAs[Double]("est_union") == 60.0)
  }

  test("bounded KMV aggregator: K-cap, dedup, skip marker, merge ≡ bulk") {
    import graft.functions.KmvDistinctAgg
    val K = KmvDistinctAgg.K
    // deterministic pseudo-hashes in the real range [0, 2^60)
    val hs = (1 to 1000).map(i =>
      (i.toLong * 2654435761L) % (1L << 60)).distinct
    val bulk = hs.foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce)
    assert(bulk.length == K)
    assert(bulk.sorted.sameElements(bulk), "buffer stays sorted")
    assert(bulk.toSet == hs.sorted.take(K).toSet, "exactly the K smallest")
    // duplicates never inflate the sketch
    val dup = (hs ++ hs).foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce)
    assert(dup.toSeq == bulk.toSeq)
    // skip marker contributes nothing
    val skp = KmvDistinctAgg.reduce(bulk, KmvDistinctAgg.Skip)
    assert(skp.toSeq == bulk.toSeq)
    // split + merge lands bit-identically on the bulk result
    val (a, b) = hs.splitAt(317)
    val merged = KmvDistinctAgg.merge(
      a.foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce),
      b.foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce))
    assert(merged.toSeq == bulk.toSeq)
    // estimator: exact below K, (K-1)*2^60/U_K at K
    val few = hs.take(K - 1).foldLeft(KmvDistinctAgg.zero)(KmvDistinctAgg.reduce)
    assert(KmvDistinctAgg.finish(few) == (K - 1).toDouble)
    assert(KmvDistinctAgg.finish(bulk) ==
      (K - 1).toDouble * 1152921504606846976.0 / bulk.last.toDouble)
  }

  test("multi-day elements: a user active on two days is two elements") {
    val rows = Seq(
      Row(1L, ts("2024-01-05 10:00:00"), 7L, "a", 1.0, ""),
      Row(2L, ts("2024-01-06 10:00:00"), 7L, "a", 1.0, ""),
      Row(3L, ts("2024-01-05 10:00:00"), 7L, "b", 1.0, ""))
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv2-").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), eventsSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = AnalyticsOps.sketchKmvSetops(spark, dir).head()
    assert(r.getAs[Long]("exact_a") == 2L && r.getAs[Long]("exact_b") == 1L)
    // the shared element is (user 7, Jan 5); Jan 6 is a's alone
    assert(r.getAs[Long]("exact_inter") == 1L &&
      r.getAs[Long]("exact_union") == 2L)
  }
}
