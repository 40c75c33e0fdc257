package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[QualityOps]] on fixtures with PLANTED violations — each rule must
  * count exactly its own plants, and orphan FKs must be found. */
class QualityOpsSpec extends GraftSpec {

  test("contract audit counts exactly the planted violations") {
    import spark.implicits._
    val dir = writeDocs(Seq(
      (1L, "good text", "en", "a", 9L),
      (2L, null, "en", "a", 0L),           // text_not_null
      (3L, "abc", "en", "a", 99L),         // n_chars mismatch
      (4L, "ok", "xx", "a", 2L),           // lang unknown
      (-5L, "neg", "de", "a", 3L)))        // doc_id negative
    // events: one out-of-range ts, one NaN value, one empty type
    Seq(
      (1L, "2024-06-01 10:00:00", 1L, "view", 1.0),
      (2L, "1999-01-01 00:00:00", 2L, "view", 1.0),
      (3L, "2024-06-01 11:00:00", 3L, "view", Double.NaN),
      (4L, "2024-06-01 12:00:00", 4L, "", 2.0))
      .toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("tss")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = QualityOps.contractAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("documents", "text_not_null", 1L, 5L),
      ("documents", "n_chars_matches_text", 1L, 5L),
      ("documents", "lang_known", 1L, 5L),
      ("documents", "doc_id_positive", 1L, 5L),
      ("events", "ts_in_range", 1L, 4L),
      ("events", "value_finite", 1L, 4L),
      ("events", "event_type_nonempty", 1L, 4L)))
  }

  test("ref integrity finds planted orphans and clean edges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ri-").toString
    Seq((1L, 10L, 100L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 7L, "O", 1.0, "1996-01-01", "1-URGENT"),
        (2L, 999L, "O", 2.0, "1996-01-02", "2-HIGH")) // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((7L, "c", 1L, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((11L, "p", "B", "T", 1, 1.0)) // part 10 missing -> orphan
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((100L, "s", 1L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = QualityOps.refIntegrity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("lineitem.l_orderkey->orders", 0L, 1L),
      ("lineitem.l_partkey->part", 1L, 1L),
      ("lineitem.l_suppkey->supplier", 0L, 1L),
      ("orders.o_custkey->customer", 1L, 2L)))
  }

  test("KS statistic equals a scalar recount over the sorted samples") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = QualityOps.qualityKsTest(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val ev = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "view").map(_._2).sorted
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    // classic merge-walk sup over the union of sample points
    val pts = (a ++ b).distinct.sorted
    val d = pts.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length -
        b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(r.getDouble(2) - d) < 1e-6, s"D mismatch: ${r.getDouble(2)} vs $d")
    val lambda = d * math.sqrt(a.length.toDouble * b.length / (a.length + b.length))
    assert(math.abs(r.getDouble(3) - lambda) < 1e-4)
  }
}
