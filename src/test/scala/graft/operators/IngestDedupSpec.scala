package graft.operators

import graft.GraftSpec

/** Ground truth for the incremental ingest dedup pair: exact path
  * recomputed from scratch in Scala; near-dup path checked on the
  * planted overlap and on side purity (batch×corpus only).
  */
class IngestDedupSpec extends GraftSpec {

  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private val exactOff = 2000000000000L
  private val nearOff = 3000000000000L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("ingest_dedup_exact matches a from-scratch Scala recomputation") {
    val corpus = docs.filter { case (id, _) => id % 4 != 3 }
    val batch = docs.filter { case (id, _) => id % 4 == 3 } ++
      corpus.collect { case (id, t) if id % 50 == 0 => (id + exactOff) -> t } ++
      corpus.collect { case (id, t) if id % 50 == 25 =>
        (id + nearOff) -> t.split(" ", -1).drop(1).mkString(" ") }
    val index = corpus.groupBy { case (_, t) => md5hex(t) }
      .map { case (fp, ds) => fp -> ds.keys.min }
    val expected = batch.map { case (id, t) => id -> index.get(md5hex(t)) }
    val got = CurationOpsSpecHelpers.rows(DedupOps.ingestDedupExact(spark, sfDir))
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === expected)
    // planted exact copies are all detected against their origin
    corpus.keys.filter(_ % 50 == 0).foreach { id =>
      assert(got(id + exactOff).contains(index(md5hex(corpus(id)))))
    }
    // planted near-dups are NOT exact dups (first token dropped)
    corpus.keys.filter(_ % 50 == 25).foreach(id => assert(got(id + nearOff).isEmpty))
  }

  test("ingest_dedup_minhash finds the planted overlap, batch×corpus only") {
    val got = CurationOpsSpecHelpers.rows(DedupOps.ingestDedupMinhash(spark, sfDir))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val isBatch = (id: Long) => id % 4 == 3 || id >= exactOff
    assert(got.nonEmpty)
    got.foreach { case (b, c, est) =>
      assert(isBatch(b) && !isBatch(c) && est >= 0.5 && est <= 1.0)
    }
    val pairs = got.map(t => (t._1, t._2)).toSet
    val corpusIds = docs.keys.filter(_ % 4 != 3).toSeq
    // exact planted copies: identical shingle sets → est exactly 1.0
    corpusIds.filter(_ % 50 == 0).foreach { id =>
      val hit = got.find(t => t._1 == id + exactOff && t._2 == id)
      assert(hit.exists(_._3 == 1.0), s"missing planted exact pair for $id")
    }
    // near-dup planted copies (jaccard ≈ (n-1)/n) surface as candidates
    val nearIds = corpusIds.filter(_ % 50 == 25)
    val found = nearIds.count(id => pairs.contains((id + nearOff, id)))
    assert(found == nearIds.size,
      s"planted near-dups found $found of ${nearIds.size}")
  }
}

/** Tiny shared helper (kept out of GraftSpec to avoid touching every
  * suite): collect a DataFrame's rows as a Seq. */
object CurationOpsSpecHelpers {
  def rows(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] =
    df.collect().toSeq
}
