package graft.sources

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Idempotent + ordered CDC apply into the snapshot table:
  * [[SnapshotTable.mergeIdempotent]] (a replayed transaction can never
  * land twice) and [[SnapshotTable.mergeLatest]] (the greatest-ordered
  * row wins per key, and committed state never regresses under
  * replayed or out-of-order batches — the streaming-upsert-sink
  * contract). */
class SnapshotUpsertSpec extends GraftSpec {

  private def state(t: String): Map[Long, (Long, String)] =
    SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("mergeIdempotent: a replayed txn is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ups1-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("id", "ord", "v"),
      overwrite = false)
    val v = SnapshotTable.mergeIdempotent(spark, t,
      Seq((2L, 20L, "B")).toDF("id", "ord", "v"),
      Seq.empty[Long].toDF("id"), "id", txnId = "b1")
    assert(v.contains(2))
    // replay: recognized, skipped, nothing published
    assert(SnapshotTable.mergeIdempotent(spark, t,
      Seq((2L, 99L, "EVIL")).toDF("id", "ord", "v"),
      Seq.empty[Long].toDF("id"), "id", txnId = "b1").isEmpty)
    assert(SnapshotTable.versions(spark, t) == Seq(1, 2))
    assert(state(t) == Map(1L -> ((10L, "a")), 2L -> ((20L, "B"))))
  }

  test("mergeLatest: within-batch winner per key, only strictly-newer applies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ups2-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 50L, "cur1"), (2L, 10L, "cur2")).toDF("id", "ord", "v"),
      overwrite = false)
    SnapshotTable.mergeLatest(spark, t,
      // id 1: both candidates OLDER than current -> no change
      // id 2: two candidates, ord 30 wins within batch, beats current 10
      // id 3: fresh insert, winner ord 7
      Seq((1L, 40L, "old"), (1L, 45L, "older"),
        (2L, 30L, "new2"), (2L, 25L, "mid2"),
        (3L, 7L, "n3"), (3L, 5L, "n3lo")).toDF("id", "ord", "v"),
      "id", Seq("ord"))
    assert(state(t) == Map(
      1L -> ((50L, "cur1")), 2L -> ((30L, "new2")), 3L -> ((7L, "n3"))))
  }

  test("mergeLatest: out-of-order batches converge to the global maximum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ups3-").toString
    val t = s"$dir/tbl"
    // the NEWER batch lands first; the older one must then be inert
    SnapshotTable.mergeLatest(spark, t,
      Seq((1L, 100L, "newest")).toDF("id", "ord", "v"), "id", Seq("ord"),
      txnId = Some("b2"))
    SnapshotTable.mergeLatest(spark, t,
      Seq((1L, 50L, "stale"), (4L, 1L, "four")).toDF("id", "ord", "v"),
      "id", Seq("ord"), txnId = Some("b1"))
    assert(state(t) == Map(1L -> ((100L, "newest")), 4L -> ((1L, "four"))))
    // replay of either batch: no-op
    assert(SnapshotTable.mergeLatest(spark, t,
      Seq((1L, 50L, "stale")).toDF("id", "ord", "v"), "id", Seq("ord"),
      txnId = Some("b1")).isEmpty)
  }

  test("mergeLatest: a no-op batch still records its txn; null keys drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ups4-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 9L, "a")).toDF("id", "ord", "v"), overwrite = false)
    val rows: Seq[(java.lang.Long, java.lang.Long, String)] =
      Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L), "older"),
        (null, java.lang.Long.valueOf(99L), "anon"))
    val v = SnapshotTable.mergeLatest(spark, t,
      rows.toDF("id", "ord", "v"), "id", Seq("ord"), txnId = Some("nb"))
    assert(v.contains(2), "no-op batch must still commit its txn id")
    assert(state(t) == Map(1L -> ((9L, "a"))), "null-key row must not insert")
    assert(SnapshotTable.mergeLatest(spark, t,
      rows.toDF("id", "ord", "v"), "id", Seq("ord"),
      txnId = Some("nb")).isEmpty)
  }

  test("mergeLatest: multi-column lexicographic order breaks ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ups5-").toString
    val t = s"$dir/tbl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 10L, 5L, "cur")).toDF("id", "ts", "seq", "v"),
      overwrite = false)
    SnapshotTable.mergeLatest(spark, t,
      // same ts as current, higher seq -> strictly newer lexicographically
      Seq((1L, 10L, 6L, "tiebreak"), (1L, 10L, 4L, "loser"))
        .toDF("id", "ts", "seq", "v"),
      "id", Seq("ts", "seq"))
    val got = SnapshotTable.readAsOf(spark, t, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 10L, 6L, "tiebreak")))
  }
}
