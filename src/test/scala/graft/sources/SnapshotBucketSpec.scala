package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed snapshot commits ([[SnapshotTable.commitBucketed]]): the
  * scan must report the bucket hash partitioning so key joins and
  * aggregations run EXCHANGE-FREE, and — the correctness crux — the
  * file-name bucket ids must match Spark's own hash exactly: a
  * mis-stamped bucket would make a bucketed join silently DROP rows
  * (each bucket pair only ever sees its own partition), so every test
  * here cross-checks results against the unbucketed evaluation. */
class SnapshotBucketSpec extends GraftSpec {

  private def noAqe[T](f: => T): T = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed snapshots join and aggregate exchange-free, with exact results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt1-").toString
    val ta = s"$dir/a"
    val tb = s"$dir/b"
    SnapshotTable.commitBucketed(spark, ta,
      spark.range(0, 1000).select(col("id"), (col("id") * 2).as("va")),
      overwrite = false, nBuckets = 8, bucketCol = "id")
    SnapshotTable.commitBucketed(spark, tb,
      spark.range(500, 1500).select(col("id"), (col("id") % 7).as("vb")),
      overwrite = false, nBuckets = 8, bucketCol = "id")
    noAqe {
      val ra = SnapshotTable.readAsOf(spark, ta, 1)
      val rb = SnapshotTable.readAsOf(spark, tb, 1)
      val joined = ra.join(rb, "id")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin"))
      // the crux: identical results to the unbucketed join — a bucket-id
      // mismatch would silently drop matches
      assert(joined.count() == 500)
      assert(joined.agg(sum(col("id"))).head().getLong(0) ==
        (500L until 1000L).sum)
      // keyed aggregation over one bucketed table: no exchange either
      val agg = ra.groupBy(col("id")).agg(sum(col("va")).as("s"))
      assert(!planOf(agg).contains("Exchange"))
      assert(agg.count() == 1000)
    }
  }

  test("bucketed appends keep the layout; a plain append degrades it safely") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commitBucketed(spark, t,
      spark.range(0, 100).select(col("id")),
      overwrite = false, nBuckets = 4, bucketCol = "id")
    SnapshotTable.commitBucketed(spark, t,
      spark.range(100, 200).select(col("id")),
      overwrite = false, nBuckets = 4, bucketCol = "id")
    noAqe {
      val r = SnapshotTable.readAsOf(spark, t, 2)
      val agg = r.groupBy(col("id")).count()
      assert(!planOf(agg).contains("Exchange"), "append lost the bucket layout")
      assert(agg.count() == 200)
      // a different spec cannot append onto the bucketed layout
      intercept[IllegalArgumentException] {
        SnapshotTable.commitBucketed(spark, t,
          spark.range(200, 210).select(col("id")),
          overwrite = false, nBuckets = 8, bucketCol = "id")
      }
      // a PLAIN append lands (correctness first) but degrades the table
      // to unbucketed — the reader must NOT mis-group the new files
      SnapshotTable.commit(spark, t,
        spark.range(200, 300).select(col("id")), overwrite = false)
      val r2 = SnapshotTable.readAsOf(spark, t, 3)
      val agg2 = r2.groupBy(col("id")).count()
      assert(planOf(agg2).contains("Exchange"), "degraded table still claims buckets")
      assert(agg2.count() == 300)
      // an overwrite re-buckets
      SnapshotTable.commitBucketed(spark, t,
        spark.range(0, 50).select(col("id")),
        overwrite = true, nBuckets = 4, bucketCol = "id")
      val r3 = SnapshotTable.readAsOf(spark, t, 4)
      assert(!planOf(r3.groupBy(col("id")).count()).contains("Exchange"))
      assert(r3.count() == 50)
    }
  }

  test("bucketing composes with zone maps, nulls, time travel, and the feed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt3-").toString
    val t = s"$dir/tbl"
    val rows: Seq[(java.lang.Long, String)] =
      (0L until 100L).map(i => (java.lang.Long.valueOf(i), s"v$i")) :+
        ((null: java.lang.Long), "null-key")
    SnapshotTable.commitBucketed(spark, t, rows.toDF("id", "v"),
      overwrite = false, nBuckets = 4, bucketCol = "id")
    val r = SnapshotTable.readAsOf(spark, t, 1)
    assert(r.count() == 101) // the null-key row bucketed somewhere, kept
    assert(r.filter(col("id").isNull).count() == 1)
    // zone maps still prune (bucket files carry stats too): a refuted
    // id scans nothing
    assert(r.filter(col("id") === 99999).count() == 0)
    // compaction declines to break the bucket layout
    assert(SnapshotTable.compact(spark, t, 1L << 20, 1L << 30).isEmpty)
    // the change feed composes: a bucketed append feeds its delta
    SnapshotTable.commitBucketed(spark, t, Seq((200L, "x")).toDF("id", "v"),
      overwrite = false, nBuckets = 4, bucketCol = "id")
    val feed = SnapshotTable.readChanges(spark, t, 1, 2).collect()
    assert(feed.length == 1 && feed(0).getString(0) == "insert" &&
      feed(0).getLong(1) == 200L)
  }
}
