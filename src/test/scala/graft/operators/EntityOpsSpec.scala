package graft.operators

import graft.{GraftSpec, Tables}

/** [[EntityOps]] — the banded fuzzy join must be LOSSLESS vs brute-force
  * all-pairs Levenshtein (the blocking is a pure optimization), and the
  * canonical clusters must be exactly the connected components of the
  * pair graph. */
class EntityOpsSpec extends GraftSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def pairsOf(names: Seq[String]): Set[(String, String, Int)] = {
    import spark.implicits._
    val df = names.toDF("name")
    EntityOps.fuzzyPairs(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2).toInt)).toSet
  }

  private def brute(names: Seq[String]): Set[(String, String, Int)] =
    (for {
      a <- names; b <- names
      if a < b
      d = lev(a, b)
      if d <= 2
    } yield (a, b, d)).toSet

  test("banded join is lossless vs brute force, incl. band-boundary lengths") {
    // lengths 1..9 straddle every band edge for band = len div 3; the
    // "ab"/"abcd" pair has len diff 2 with bands 0 vs 1 (the replication
    // case), "abc"/"abcde" bands 1 vs 1
    val dict = Seq("a", "ab", "abcd", "abc", "abcde", "abcdefg", "abcdefghi",
      "xy", "xz", "wxyz", "q")
    assert(pairsOf(dict) == brute(dict))
  }

  test("lossless on the sf0.001 part dictionary") {
    val names = Tables.part(spark, sfDir)
      .select("p_name").distinct().collect().map(_.getString(0)).toSeq
    assert(pairsOf(names) == brute(names))
  }

  test("exactly-once: no pair is emitted twice") {
    import spark.implicits._
    val dict = Seq("aaa", "aab", "aba", "abb", "bbb", "aaaa", "aaab")
    val rows = EntityOps.fuzzyPairs(dict.toDF("name")).collect()
    assert(rows.length == rows.map(r => (r.getString(0), r.getString(1))).distinct.length)
  }

  test("canonical clusters = connected components of the pair graph") {
    val rows = EntityOps.entityCanonical(spark, sfDir).collect()
    // every name appears in exactly one cluster
    val members = rows.flatMap(_.getString(2).split(","))
    assert(members.length == members.distinct.length)
    val all = Tables.part(spark, sfDir)
      .select("p_name").distinct().collect().map(_.getString(0)).toSet
    assert(members.toSet == all)
    rows.foreach { r =>
      val ms = r.getString(2).split(",").toSeq
      assert(r.getLong(1) == ms.length)
      assert(r.getString(0) == ms.min) // canonical = lexicographic min
      // each multi-member cluster is connected under dist<=2 edges:
      // reachability via union-find over the brute pair set
      if (ms.length > 1) {
        val parent = scala.collection.mutable.Map(ms.map(m => m -> m): _*)
        def find(x: String): String =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        for (a <- ms; b <- ms if a < b && lev(a, b) <= 2)
          parent(find(a)) = find(b)
        assert(ms.map(find).distinct.length == 1,
          s"cluster ${r.getString(0)} not connected")
      }
    }
  }
}
