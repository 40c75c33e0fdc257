package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Ground-truth checks for the ranked-retrieval pack: the distributed
  * BM25 pipeline must reproduce a driver-side scalar computation of the
  * same formula, and the substring-span detector must recover a planted
  * duplicated span at its exact token length.
  */
class SearchOpsSpec extends GraftSpec {

  test("search_bm25 matches a scalar BM25 computation at sf0.001") {
    val got = SearchOps.searchBm25(spark, sfDir).collect()
    assert(got.nonEmpty)
    // scalar recomputation of the same corpus
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val bmQueries = Seq(
      0L -> Seq("hash", "join"),
      1L -> Seq("vector", "stream", "window"),
      2L -> Seq("customer", "filter"))
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val dfT: Map[String, Long] = bmQueries.flatMap(_._2).distinct
      .map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def score(qTerms: Seq[String], tk: Seq[String]): Long = {
      val dl = tk.length.toLong
      qTerms.map { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val idf = math.log(1.0 + (n - dfT(t) + 0.5) / (dfT(t) + 0.5))
          val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6
          math.round(c)
        }
      }.sum
    }
    val expected = bmQueries.flatMap { case (qid, terms) =>
      docs.map { case (id, tk) => (qid, id, score(terms, tk)) }
        .filter(_._3 != 0L)
        .sortBy { case (_, id, s) => (-s, id) }
        .take(10)
        .zipWithIndex
        .map { case ((q, id, s), i) => (q, id, s, (i + 1).toLong) }
    }
    val gotRows = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotRows === expected)
  }

  test("search_term_stats df/idf agree with the scalar count") {
    val got = SearchOps.searchTermStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("tk"))
      .collect().map(_.getSeq[String](0))
    val n = docs.length.toLong
    got.foreach { case (term, (df, idfMicro)) =>
      val expDf = docs.count(_.contains(term)).toLong
      assert(df === expDf, term)
      assert(idfMicro === math.round(math.log(1.0 + (n - expDf + 0.5) / (expDf + 0.5)) * 1e6), term)
    }
  }

  test("search_hybrid_rrf is the exact RRF fusion of its two legs") {
    val got = SearchOps.searchHybridRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    val sparse = SearchOps.searchBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val dense = SearchOps.denseTopK(spark, sfDir, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    def contrib(r: Option[Long]): Long =
      r.map(rk => math.round(1e6 / (60 + rk))).getOrElse(0L)
    val expected = (sparse.keySet ++ dense.keySet).toSeq
      .map { k => (k._1, k._2, contrib(sparse.get(k)) + contrib(dense.get(k))) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(10).zipWithIndex
          .map { case ((q, id, s), i) => (q, id, s, (i + 1).toLong) }
      }.sortBy(t => (t._1, t._4))
    assert(got === expected)
    // both legs are represented in the fused top-10 (fusion isn't
    // degenerating to a single retriever)
    val gotKeys = got.map(t => (t._1, t._2)).toSet
    assert(gotKeys.intersect(sparse.keySet).nonEmpty)
    assert(gotKeys.intersect(dense.keySet).nonEmpty)
  }

  test("dense leg top-1 for query 0 matches a scalar cosine scan") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val q = emb(0L)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      // same index-order left-fold float→double contract as the kernel
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val best = emb.toSeq
      .map { case (id, v) =>
        (id, BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.head
    val gotTop = SearchOps.denseTopK(spark, sfDir, 10).collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(3) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).head
    assert(gotTop === best)
  }

  test("substring spans recover a planted duplicated span exactly") {
    val shared10 = (1 to 10).map(i => s"s$i").mkString(" ")
    // doc ids chosen to dodge the %9 boilerplate plant; filler tokens
    // unique per doc so only the planted spans collide
    val dir = writeDocs(Seq(
      (1L, s"m1 m2 $shared10 m3", "en", "t", 0L),             // span at tokens 3..12
      (2L, s"$shared10 n1 n2 n3", "en", "t", 0L),             // span at tokens 1..10
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "t", 0L),      // no dup
      (4L, "q1 q2 q3", "en", "t", 0L)))                       // < 8 tokens: excluded
    val got = DedupOps.substringSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    // 10 shared tokens = 3 consecutive shared 8-windows = a 10-token span
    assert(got(1L) === ((6L, 3L, 3L, 10L)))  // 13 tokens → 6 windows
    assert(got(2L) === ((6L, 3L, 3L, 10L)))
    assert(got(3L) === ((2L, 0L, 0L, 0L)))   // 9 tokens → 2 windows, none shared
    assert(!got.contains(4L))
  }
}
