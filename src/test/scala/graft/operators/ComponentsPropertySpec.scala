package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Property test: the distributed min-label propagation must equal a
  * driver-side union-find on seeded random graphs — including multi-hop
  * chains, cycles, singletons, and dense blobs that the fixture-derived
  * CC query never exercises.
  */
class ComponentsPropertySpec extends GraftSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min-id root (the operator's component label)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graphs match driver-side union-find (3 seeds)") {
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodesDf = (0 until n).map(_.toLong).toDF("doc_id")
      val edgesDf = edges.toDF("a", "b")
      val got = DedupOps.componentsFromEdges(nodesDf, edgesDf)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      assert(got === want, s"seed $seed diverged")
    }
  }

  test("long path graph (worst-case diameter) converges correctly") {
    val n = 24
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = DedupOps.componentsFromEdges(
      (0L until n).toDF("doc_id"), edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === (0L until n).map(_ -> 0L).toMap)
  }

  test("two-phase star rounds scale with log(diameter), not diameter") {
    val n = 64
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val (labels, rounds) = DedupOps.componentsWithRounds(
      (0L until n).toDF("doc_id"), edges.toDF("a", "b"))
    assert(labels.as[(Long, Long)].collect().toMap ===
      (0L until n).map(_ -> 0L).toMap)
    // plain min-label propagation needs ~n rounds on a path; the
    // alternating large-star/small-star contraction needs ~log2(n)
    assert(rounds <= 10, s"rounds=$rounds on a diameter-${n - 1} path")
  }

  test("empty edge set: every node is its own singleton component") {
    val nodesDf = (0L until 5L).toDF("doc_id")
    val edgesDf = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = DedupOps.componentsFromEdges(nodesDf, edgesDf)
      .as[(Long, Long)].collect().toMap
    assert(got === (0L until 5L).map(i => i -> i).toMap)
  }
}
