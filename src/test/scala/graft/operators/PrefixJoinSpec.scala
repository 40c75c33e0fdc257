package graft.operators

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact prefix-filtered set-similarity ([[DedupOps.prefixJaccard]],
  * [[DedupOps.containment]]) and the JL random-projection recall audit
  * ([[SimilarityOps.annRpRecall]]).
  *
  * The prefix filter is an exactness claim — candidates generated from
  * each doc's rarest-token prefix must recover EVERY pair above the
  * threshold — so both specs compare against an unpruned all-pairs
  * reference computed over the very same token sets. */
class PrefixJoinSpec extends GraftSpec {

  private val sf = "/root/testdata/sf0.001"
  private val plantOff = 1000000000000L

  /** Unpruned reference: all pairs over the SAME distinct 3-gram
    * shingle sets the operator uses. */
  private def tokens(docs: DataFrame): DataFrame =
    DedupOps.shingleRows(docs).withColumnRenamed("shingle", "token")

  test("prefix filtering loses no pair above tau (exactness vs all-pairs)") {
    val docs0 = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val docs = docs0.unionByName(
      docs0.filter(col("doc_id") % 97 === 0)
        .withColumn("doc_id", col("doc_id") + plantOff))
    val t = tokens(docs)
    val sz = t.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val ref = t.as("a").join(t.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .filter(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")) >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = DedupOps.prefixJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ref.nonEmpty, "fixture must yield at least the planted pairs")
    assert(got == ref, s"prefix join diverged: missing=${ref -- got} extra=${got -- ref}")
    // every planted twin surfaces at jaccard exactly 1.0
    val planted = DedupOps.prefixJaccard(spark, sf)
      .filter(col("doc_b") === col("doc_a") + plantOff)
    // a doc with < 3 tokens has no shingles, hence no twin pair
    val nPlant = docs0.filter(col("doc_id") % 97 === 0 &&
      size(split(col("text"), " ")) >= 3).count()
    assert(planted.count() == nPlant)
    assert(planted.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("containment finds every planted half-doc quote at C = 1.0") {
    val res = DedupOps.containment(spark, sf)
    val docs0 = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val nPlant = docs0.filter(col("doc_id") % 97 === 0 &&
      size(split(col("text"), " ")) >= 6).count()
    assert(nPlant > 0, "fixture must plant at least one half-doc")
    // the planted (quote = id + off, source = id) edge exists for every
    // plant, at containment exactly 1.0 (half's word set is a subset)
    val plantedEdges = res.filter(col("quote_id") >= plantOff &&
      col("source_id") === col("quote_id") - plantOff)
    assert(plantedEdges.count() == nPlant)
    assert(plantedEdges.filter(col("containment") =!= 1.0).count() == 0)
    // asymmetry: containment is per-ordered-pair, quote side normalized —
    // no row may exceed 1.0, and every row meets the threshold
    assert(res.filter(col("containment") > 1.0 ||
      col("containment") < 0.8).count() == 0)
  }

  test("random projection preserves planted-twin recall (closed form)") {
    val rows = SimilarityOps.annRpRecall(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "rp16")
    assert(r.getLong(1) > 0, "fixture must plant at least one query")
    assert(r.getLong(2) == r.getLong(1),
      "every twin must be rank-1 in the reduced space")
  }

  test("MAD outlier screen: medians are stored elements, counts recount") {
    val res = AnalyticsOps.eventsMadOutliers(spark, sf).collect()
    assert(res.nonEmpty)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    res.foreach { r =>
      val tpe = r.getString(0)
      val vals = ev.filter(col("event_type") === tpe)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      assert(r.getLong(1) == vals.length)
      val med = vals((math.ceil(vals.length / 2.0) - 1).toInt)
      assert(r.getDouble(2) == math.rint(med * 10000) / 10000 ||
        math.abs(r.getDouble(2) - med) < 1e-4)
      val devs = vals.map(v => math.abs(v - med)).sorted
      val mad = devs((math.ceil(devs.length / 2.0) - 1).toInt)
      val expectOut = vals.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      assert(r.getLong(4) == expectOut, s"outlier recount mismatch for $tpe")
    }
  }

  test("ingest probe: exact vs brute batch x corpus; planted twins at J = 1.0") {
    val plantOff2 = 2000000000000L
    val got = DedupOps.ingestJaccardPrefix(spark, sf)
    // brute reference over the same ingest corpus/batch split
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") % 4 =!= 3).select(col("doc_id"), col("text"))
    val batch = Tables.documents(spark, sf)
      .filter(col("doc_id") % 4 === 3).select(col("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + plantOff2))
      .unionByName(corpus.filter(col("doc_id") % 50 === 25)
        .withColumn("doc_id", col("doc_id") + 3000000000000L)
        .withColumn("text", expr(
          "array_join(slice(split(text, ' '), 2, size(split(text, ' '))), ' ')")))
    val tb = tokens(batch)
    val tc = tokens(corpus)
    val szb = tb.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val szc = tc.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val ref = tb.as("b").join(tc.as("c"), col("b.token") === col("c.token"))
      .groupBy(col("b.doc_id").as("batch_id"), col("c.doc_id").as("corpus_id"))
      .agg(count(lit(1)).as("inter"))
      .join(szb.select(col("doc_id").as("batch_id"), col("sz").as("sz_b")), "batch_id")
      .join(szc.select(col("doc_id").as("corpus_id"), col("sz").as("sz_c")), "corpus_id")
      .filter(col("inter").cast("double") /
        (col("sz_b") + col("sz_c") - col("inter")) >= 0.6)
      .select(col("batch_id"), col("corpus_id"), col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotSet = got.select(col("batch_id"), col("corpus_id"), col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ref.nonEmpty)
    assert(gotSet == ref,
      s"ingest probe diverged: missing=${ref -- gotSet} extra=${gotSet -- ref}")
    // every planted exact twin (>= 1 shingle) matches its original at 1.0
    val nPlant = corpus.filter(col("doc_id") % 50 === 0 &&
      size(split(col("text"), " ")) >= 3).count()
    val twins = got.filter(col("batch_id") === col("corpus_id") + plantOff2)
    assert(twins.count() == nPlant)
    assert(twins.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("trigram paths: top-20 equals the windowed recount") {
    import org.apache.spark.sql.expressions.Window
    val got = AnalyticsOps.eventsTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.nonEmpty && got.length <= 20)
    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val all = ev.select(col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20)
    assert(got.toSeq == all.toSeq)
  }

  test("attribution conserves purchasing users and credits 'direct' pairs") {
    val res = AnalyticsOps.eventsAttribution(spark, sf)
    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    val nBuyers = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(res.agg(sum("n_users")).head().getLong(0) == nBuyers,
      "every purchasing user must be attributed exactly once")
    // 'direct' appears only as a (direct, direct) pair: a user with no
    // pre-purchase history has neither touch
    assert(res.filter((col("first_touch") === "direct") =!=
      (col("last_touch") === "direct")).count() == 0)
  }
}
