package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Invariant checks for the round-4 additions: gap-fill resampling, full
  * outer join, survivor selection, and the hashed-feature quality model.
  */
class QueryExtrasSpec extends GraftSpec {

  test("q39 gap fill: dense hourly spine, no null fills, gaps flagged") {
    val rows = Relational.q39GapFill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val hours = rs.map(_.getTimestamp(1).getTime).sorted
      // dense: every consecutive spine step is exactly one hour
      hours.sliding(2).foreach {
        case Array(a, b) => assert(b - a === 3600000L)
        case _ =>
      }
    }
    rows.foreach { r =>
      assert(!r.isNullAt(3), "filled_avg must be forward-filled")
      assert(r.getBoolean(4) === (r.getLong(2) == 0L), "is_gap <=> n_obs == 0")
    }
  }

  test("q40 full outer: both null-padded sides materialize") {
    val rows = Relational.q40FullOuter(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(rows("ORBITAL") === "quota_only")
    assert(rows.values.toSet.contains("actual_only"))
    assert(rows("AUTOMOBILE") === "both")
  }

  test("survivors: one real doc per multi-member cluster, quality-maximal") {
    val labeled = DedupOps.connectedComponents(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"), "left")
      .select(col("component"), col("doc_id"),
        coalesce(col("n_chars").cast("long"), lit(-1L)).as("qual"))
      .collect().groupBy(_.getLong(0))
    val surv = DedupOps.dedupSurvivors(spark, sfDir).collect()
    assert(surv.nonEmpty)
    assert(surv.map(_.getLong(0)).distinct.length === surv.length)
    surv.foreach { r =>
      val (comp, n, id, qual) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = labeled(comp)
      assert(members.length.toLong === n)
      assert(n >= 2)
      assert(id < 1000000000000L, "planted twin must never be the survivor")
      assert(qual === members.map(_.getLong(2)).max)
    }
  }

  test("entropy matches a scalar recomputation") {
    val dir = writeDocs(Seq(
      (1L, "a a a a", "en", "t", 0L),          // zero entropy
      (2L, "a b c d", "en", "t", 0L),          // maximal: ln(4)
      (3L, "a a b b b c", "en", "t", 0L)))
    val got = TextOps.textEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def expected(toks: Seq[String]): (Long, Long, Long) = {
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val m = counts.values.map(c => math.round(c * math.log(c.toDouble) * 1e6)).sum
      (n, counts.size.toLong, math.round(math.log(n.toDouble) * 1e6 - m / n.toDouble))
    }
    assert(got(1L) === expected(Seq("a", "a", "a", "a")))
    assert(got(1L)._3 === 0L)
    assert(got(2L) === expected(Seq("a", "b", "c", "d")))
    assert(got(2L)._3 === math.round(math.log(4.0) * 1e6))
    assert(got(3L) === expected(Seq("a", "a", "b", "b", "b", "c")))
  }

  test("quality model matches a scalar recomputation") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta alpha", "en", "t", 0L),
      (2L, "gamma", "en", "t", 0L),
      (3L, "delta epsilon zeta eta", "en", "t", 0L)))
    val rows = TextOps.textQualityModel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    def wt(tok: String): Long =
      (graft.functions.PolyHash.hash(UTF8String.fromString(tok)) % 64) * 37 % 101 - 50
    Seq(
      1L -> Seq("alpha", "beta", "alpha"),
      2L -> Seq("gamma"),
      3L -> Seq("delta", "epsilon", "zeta", "eta")).foreach { case (id, toks) =>
      val zSum = toks.map(wt).sum
      val (n, z, zMicro, keep) = rows(id)
      assert(n === toks.length.toLong)
      assert(z === zSum)
      assert(zMicro === math.round(zSum * 10000.0 / toks.length))
      assert(keep === (zSum > 0))
    }
  }
}
