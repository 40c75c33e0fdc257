package graft.operators

import graft.GraftSpec

/** [[SearchOps.searchPostings]] / [[SearchOps.searchPhrase]] on planted
  * fixtures: posting order and truncation, positional adjacency semantics
  * (overlaps count; scattered terms don't), and null/empty robustness. */
class SearchIndexSpec extends GraftSpec {

  test("phrase match requires adjacency and counts overlaps") {
    val dir = writeDocs(Seq(
      (1L, "table hash join table hash", "en", "a", 25L), // "table hash" x2
      (2L, "hash table", "en", "a", 10L),                 // reversed: no match
      (3L, "table x hash", "en", "a", 12L),               // gap: no match
      (4L, "slow hash batch slow hash batch", "en", "a", 30L), // trigram x2
      (5L, "slow hash hash batch", "en", "a", 20L),       // broken trigram
      (6L, "", "en", "a", 0L),
      (7L, null, "en", "a", 0L),
      (8L, "customer join customer join customer", "en", "a", 40L)))
    val got = SearchOps.searchPhrase(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L, 2L), (1L, 8L, 2L), (2L, 4L, 2L)))
  }

  test("postings are impact-ordered, truncated at 20, df over the full list") {
    // 25 docs containing "hash" with tf = doc_id copies -> df 25, top-20
    // by tf desc are docs 25..6
    val docs = (1L to 25L).map(i =>
      (i, Seq.fill(i.toInt)("hash").mkString(" "), "en", "a", i))
    val dir = writeDocs(docs)
    val rows = SearchOps.searchPostings(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val (df, postings) = rows("hash")
    assert(df == 25L)
    val expected = (25L to 6L by -1).map(i => s"$i:$i").mkString(",")
    assert(postings == expected)
    // terms absent from the corpus produce no row (no empty postings)
    assert(!rows.contains("vector") || rows("vector")._1 > 0)
  }

  test("the postings index builds ONCE across the whole search family") {
    graft.CacheRegistry.clear(spark)
    val before = SearchOps.postingsBuilds.get()
    SearchOps.searchBm25(spark, sfDir).collect()
    SearchOps.searchTermStats(spark, sfDir).collect()
    SearchOps.searchPostings(spark, sfDir).collect()
    SearchOps.searchHybridRrf(spark, sfDir).collect()
    assert(SearchOps.postingsBuilds.get() - before == 1,
      "search family re-tokenized the corpus instead of sharing the index")
    // a pass boundary invalidates; the next query rebuilds exactly once
    graft.CacheRegistry.clear(spark)
    SearchOps.searchTermStats(spark, sfDir).collect()
    assert(SearchOps.postingsBuilds.get() - before == 2)
  }

  test("tf ties break by doc_id ascending in the posting order") {
    val dir = writeDocs(Seq(
      (10L, "join join", "en", "a", 9L),
      (3L, "join join", "en", "a", 9L),
      (7L, "join", "en", "a", 4L)))
    val rows = SearchOps.searchPostings(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(rows("join") == "3:2,10:2,7:1")
  }
}
