package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[TextOps.textBigramLm]] Laplace-smoothed bigram estimates and
  * [[AnalyticsOps.eventsPatternMatch]] non-overlapping sequence
  * matching on planted fixtures. */
class BigramPatternSpec extends GraftSpec {

  test("bigram LM: counts, context totals, add-one smoothing exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bg-").toString
    // corpus: "a b a b" and "a b c" ->
    //   bigrams: (a,b)x3? doc1: a-b, b-a, a-b  doc2: a-b, b-c
    //   c(a,b)=3, c(b,a)=1, c(b,c)=1; ctx a=3, b=2; V={a,b,c}=3
    Seq((1L, "a b a b", "en", "t", 7L), (2L, "a b c", "en", "t", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.textBigramLm(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // p(b|a) = (3+1)/(3+3) = 666666 micro; p(a|b) = (1+1)/(2+3) = 400000;
    // p(c|b) likewise 400000
    assert(got == Seq(
      ("a", "b", 3L, 3L, 666666L),
      ("b", "a", 1L, 2L, 400000L),
      ("b", "c", 1L, 2L, 400000L)))
  }

  test("pattern match: ordered sequences, non-overlapping occurrences") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pm-").toString
    // u1: view purchase view purchase  -> direct x2
    // u2: view click purchase          -> assisted x1 (NOT direct: gap)
    // u3: error error error            -> non-overlapping scan counts 1
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 10:01:00", 1L, "purchase", 1.0),
      (3L, "2024-01-01 10:02:00", 1L, "view", 1.0),
      (4L, "2024-01-01 10:03:00", 1L, "purchase", 1.0),
      (5L, "2024-01-01 10:00:00", 2L, "view", 1.0),
      (6L, "2024-01-01 10:01:00", 2L, "click", 1.0),
      (7L, "2024-01-01 10:02:00", 2L, "purchase", 1.0),
      (8L, "2024-01-01 10:00:00", 3L, "error", 1.0),
      (9L, "2024-01-01 10:01:00", 3L, "error", 1.0),
      (10L, "2024-01-01 10:02:00", 3L, "error", 1.0))
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsOps.eventsPatternMatch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("assisted_purchase", 1L, 1L),
      ("direct_purchase", 1L, 2L),
      ("error_retry", 1L, 1L)))
  }
}
