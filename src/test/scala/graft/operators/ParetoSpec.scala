package graft.operators

import graft.{GraftSpec, Tables}

/** [[AnalyticsOps.paretoFrontier]] vs brute-force dominance over the
  * sf0.001 corpus — the banded prefix-max scan must equal the O(n²)
  * definition exactly. */
class ParetoSpec extends GraftSpec {

  test("frontier equals brute-force dominance filter") {
    val pts = Tables.part(spark, sfDir)
      .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) AS p",
        "CAST(p_size AS BIGINT) AS s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val distinctPts = pts.distinct
    val counts = pts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = distinctPts.filter { case (p0, s0) =>
      !distinctPts.exists { case (p1, s1) =>
        (p1, s1) != (p0, s0) && p1 <= p0 && s1 >= s0
      }
    }.sortBy(_._1).map { case (p, sz) => (p, sz, counts((p, sz))) }

    val got = AnalyticsOps.paretoFrontier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected.toSeq)
    assert(got.nonEmpty)
    // maximize-size frontier: size strictly INCREASES along rising price
    // (a later point with size <= an earlier one would be dominated)
    got.sliding(2).foreach {
      case Seq((p1, s1, _), (p2, s2, _)) => assert(p1 < p2 && s1 < s2)
      case _ =>
    }
  }
}
