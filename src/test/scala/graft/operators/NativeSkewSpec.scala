package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

class NativeSkewSpec extends GraftSpec {

  test("native wordcount equals pipe wordcount (same relation, different engine path)") {
    val native = NativeOps.wordcountNative(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val typed = NativeOps.wordcountTyped(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(native == typed)
    assert(native.nonEmpty)
  }

  test("salted join equals plain join and spreads the hot key") {
    import spark.implicits._
    // one mega-key (0) with 10k rows + a uniform tail
    val skewed = ((1 to 10000).map(i => (0L, i)) ++ (1 to 1000).map(i => (i.toLong % 50 + 1, i)))
      .toDF("k", "v")
    val dim = (0L to 50L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k")
    val salted = SkewUtils.saltedJoin(skewed, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    // row-level equality (order-insensitive)
    val a = plain.select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    val b = salted.select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    // the hot key is actually spread across several salt values
    val spread = skewed.withColumn("__salt",
        pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(8)).cast("int"))
      .filter(col("k") === 0L).select("__salt").distinct().count()
    assert(spread > 4)
  }

  test("bucketed tables co-locate the join (no shuffle exchange on the keys)") {
    // uses the default spark-warehouse dir (gitignored); tables dropped below
    val s2 = spark.newSession()
    import s2.implicits._
    (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
      .write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("graft_a")
    (1 to 5000).map(i => (i.toLong, s"n$i")).toDF("id", "y")
      .write.bucketBy(8, "id").mode("overwrite").saveAsTable("graft_b")
    val joined = s2.table("graft_a").join(s2.table("graft_b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read pre-bucketed: no Exchange feeding the join
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
    assert(joined.count() == 5000)
    s2.sql("DROP TABLE IF EXISTS graft_a")
    s2.sql("DROP TABLE IF EXISTS graft_b")
  }
}
