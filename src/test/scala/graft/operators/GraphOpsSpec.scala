package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.DataFrame

/** [[GraphOps.triangleStats]] against graphs with known closed-form
  * answers, plus a randomized cross-check against brute-force triple
  * enumeration — the oriented-wedge algorithm must agree with O(n³)
  * truth on every sampled graph. */
class GraphOpsSpec extends GraftSpec {

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
  }

  private def stats(es: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val r = GraphOps.triangleStats(edgesDf(es)).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def bruteTriangles(es: Seq[(Long, Long)]): Long = {
    val e = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(a, b, c) =>
      e((a, b)) && e((b, c)) && e((a, c))
    }
  }

  test("K4: 4 triangles, clustering coefficient 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val (n, m, w, t, cm) = stats(k4)
    assert(n == 4 && m == 6)
    assert(w == 12) // 4 nodes of degree 3: 4 * C(3,2)
    assert(t == 4)
    assert(cm == 1000000L) // 3*4/12
  }

  test("C5 (5-cycle): 0 triangles") {
    val c5 = (0L to 4L).map(i => (i, (i + 1) % 5))
    val (n, m, w, t, cm) = stats(c5)
    assert(n == 5 && m == 5 && t == 0 && cm == 0L)
    assert(w == 5) // every node degree 2 -> one wedge each
  }

  test("triangle with a pendant edge") {
    // 0-1-2 triangle, 3 hangs off 0: T=1, wedges = C(3,2) + 2*C(2,2)... per node:
    // deg(0)=3 -> 3 wedges, deg(1)=deg(2)=2 -> 1 each, deg(3)=1 -> 0; W=5
    val (n, m, w, t, cm) = stats(Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)))
    assert(n == 4 && m == 4 && w == 5 && t == 1)
    assert(cm == 600000L) // 3*1/5
  }

  test("star graph: many wedges, zero triangles") {
    val star = (1L to 9L).map(i => (0L, i))
    val (_, _, w, t, _) = stats(star)
    assert(w == 36 && t == 0)
  }

  test("random graphs match brute-force triple enumeration") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val nNodes = 8 + trial * 3
      val es = (0 until nNodes * 2).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter(p => p._1 != p._2)
      val (_, _, _, t, _) = stats(es)
      assert(t == bruteTriangles(es), s"trial $trial: $es")
    }
  }

  test("query runs on the sf0.001 tables and finds triangles") {
    val r = GraphOps.graphTriangles(spark, sfDir).collect()(0)
    assert(r.getLong(0) > 0)   // nodes
    assert(r.getLong(3) > 0, "folded lineitem graph should contain triangles")
    assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
  }

  private def kcoreNodes(es: Seq[(Long, Long)], k: Int): Set[Long] = {
    import org.apache.spark.sql.functions._
    GraphOps.kcoreEdges(edgesDf(es), k)
      .select(explode(array(col("u"), col("v"))).as("n"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  test("k-core peeling on closed-form graphs") {
    // a path has no 2-core; a cycle IS its own 2-core
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(kcoreNodes(path, 2).isEmpty)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(kcoreNodes(cycle, 2) == Set(1L, 2L, 3L, 4L))
    // K4 with a pendant chain: the 3-core is exactly the K4 (the chain
    // peels away transitively — removing 6 lowers 5's degree)
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val withChain = k4 ++ Seq((3L, 5L), (5L, 6L))
    assert(kcoreNodes(withChain, 3) == Set(0L, 1L, 2L, 3L))
    assert(kcoreNodes(withChain, 5).isEmpty)
  }

  test("degree assortativity closed forms") {
    // a star is maximally disassortative: r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r1 = GraphOps.assortativityStats(edgesDf(star)).collect()(0)
    assert(r1.getLong(2) == -1000000L)
    // a regular graph (cycle) has zero degree variance: NULL, not NaN
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val r2 = GraphOps.assortativityStats(edgesDf(cycle)).collect()(0)
    assert(r2.isNullAt(2))
  }

  test("label propagation equals a scalar replay of the same rounds") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = GraphOps.graphLabelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    // scalar replay on the driver: same folded edges, same sync rounds,
    // same most-frequent-then-smallest tie rule
    val p = 997L
    val edges = graft.Tables.lineitem(spark, sf)
      .filter(col("l_linenumber") === 1)
      .select(expr(s"(l_orderkey div 100000000) * $p + (l_orderkey % $p)").as("a"),
        expr(s"(l_orderkey div 100000000) * $p + (l_partkey % $p)").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, xs) => (n, xs.map(_._2)) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.values.groupBy(identity).map { case (l, xs) => (l, xs.size.toLong) }
      .toSeq.sortBy { case (l, c) => (-c, l) }.take(50)
    assert(got == want, s"LPA diverged from the scalar replay")
  }
}
