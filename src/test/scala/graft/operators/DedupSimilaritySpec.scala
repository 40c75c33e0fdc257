package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Behavioral checks for the near-dup and similarity operators using
  * constructed corpora where ground truth is known.
  */
class DedupSimilaritySpec extends GraftSpec {

  private def doc(id: Long, text: String) = (id, text, "en", "src0", text.length.toLong)

  test("exact dedup groups identical texts and keeps the min id") {
    val d = writeDocs(Seq(
      doc(1, "aa bb cc dd ee ff gg"), doc(2, "aa bb cc dd ee ff gg"),
      doc(3, "zz yy xx ww vv uu tt"), doc(4, "aa bb cc dd ee ff gg")))
    val rows = DedupOps.exactGroups(spark, d).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") == 3L)
    assert(rows.head.getAs[Long]("keep_id") == 1L)
  }

  test("connected components: transitive near-dup chain collapses to one " +
    "cluster, singletons self-label, planted pairs link") {
    // jaccard edges form the PATH 1–2–3 (1 and 3 share nothing directly:
    // convergence needs >1 propagation round); 4 is isolated; 0 gets a
    // planted exact-copy edge to 1000000000000
    val d = writeDocs(Seq(
      doc(0, "p q r s t u"),
      doc(1, "a b c d e f"),   // shingles abc bcd cde def
      doc(2, "c d e f g h"),   // ∩ doc1 = {cde, def} → jac 1/3
      doc(3, "e f g h i j"),   // ∩ doc2 = {efg, fgh} → jac 1/3; ∩ doc1 = ∅
      doc(4, "x y z w v u")))
    val got = DedupOps.connectedComponents(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      0L -> 0L, 1000000000000L -> 0L,
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L))
  }

  test("minhash: identical docs get estimate 1.0; disjoint docs are not candidates") {
    val d = writeDocs(Seq(
      doc(1, "one two three four five six seven eight nine ten"),
      doc(2, "one two three four five six seven eight nine ten"),
      doc(3, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val rows = DedupOps.minhashPairs(spark, d).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(rows.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("minhash: one-token edit of a long doc is found with high estimate") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w20", "zz")
    val d = writeDocs(Seq(doc(1, base), doc(2, edited),
      doc(3, "totally different content " + (1 to 20).map(i => s"x$i").mkString(" "))))
    val pairs = DedupOps.minhashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("portable minhash: identical docs estimate 1.0, disjoint not candidates") {
    val d = writeDocs(Seq(
      doc(1, "one two three four five six seven eight nine ten"),
      doc(2, "one two three four five six seven eight nine ten"),
      doc(3, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val rows = DedupOps.minhashPortable(spark, d).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(rows.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("portable simhash: identical docs hamming 0, disjoint not near") {
    val d = writeDocs(Seq(
      doc(1, "one two three four five six seven eight nine ten"),
      doc(2, "one two three four five six seven eight nine ten"),
      doc(3, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val rows = DedupOps.simhashPortable(spark, d).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      .get.getAs[Long]("hamming") == 0L)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: exact overlap ratio on known shingle sets") {
    // doc1: tokens a b c d  -> shingles {abc, bcd}; doc2: a b c e -> {abc, bce}
    // intersection 1, union 3 -> jaccard 0.3333
    val d = writeDocs(Seq(doc(1, "a b c d"), doc(2, "a b c e")))
    val rows = DedupOps.ngramJaccard(spark, d).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("inter") == 1L)
    assert(rows.head.getAs[Double]("jaccard") == 0.3333)
  }

  test("simhash: identical docs have hamming 0") {
    val t = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = writeDocs(Seq(doc(1, t), doc(2, t)))
    val rows = DedupOps.simhashPairs(spark, d).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
      == Set((1L, 2L, 0L)))
  }

  test("cosine: identical vectors similarity 1, orthogonal 0") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      SimilarityOps.cosine(col("a"), col("b")).as("same"),
      SimilarityOps.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("brute-force ANN: self excluded, ranks contiguous, cosine descending") {
    val rows = SimilarityOps.annBruteForce(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
      assert(!rs.exists(_.getAs[Long]("vec_id") == q))
      val cs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN: identical vector lands in the same bucket and ranks first") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => (math.sin(i + 1) / 2).toFloat)
    val w = Array.tabulate(64)(i => (math.cos(i * 2 + 1) / 3).toFloat)
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-").toString
    Seq((0L, v, 0), (10L, v, 0), (20L, w, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SimilarityOps.annLsh(spark, dir).collect()
    val q0 = rows.filter(_.getAs[Long]("q_id") == 0L).sortBy(_.getAs[Long]("rank"))
    assert(q0.nonEmpty && q0.head.getAs[Long]("vec_id") == 10L)
    assert(q0.head.getAs[Double]("cos") == 1.0)
  }
}
