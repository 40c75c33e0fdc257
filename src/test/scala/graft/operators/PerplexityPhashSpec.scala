package graft.operators

import graft.GraftSpec

/** Closed-form endpoints for the two round-5 additions: the bigram-LM
  * NLL scorer (hand-computed smoothed model on a two-doc corpus) and the
  * perceptual-hash pairs (planted payload twins must meet at hamming 0).
  */
class PerplexityPhashSpec extends GraftSpec {

  test("bigram NLL matches the hand-computed smoothed model") {
    // corpus: two identical two-token docs. Model: c2("a b") = 2,
    // c1("a") = 2, V = 2 ⇒ per-bigram term = ln(3) − ln(4)
    val dir = writeDocs(Seq(
      (1L, "a b", "en", "t", 3L),
      (2L, "a b", "en", "t", 3L)))
    val got = TextOps.textPerplexity(spark, dir).collect()
    val expectedT = math.round((math.log(3) - math.log(4)) * 1e6)
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getLong(1) === 1L)           // n_bigrams
      assert(r.getLong(2) === -expectedT)   // nll_micro
      assert(r.getLong(3) === -expectedT)   // nll_per_bigram_micro
    }
  }

  test("bigram NLL ranks a corpus-repeated doc below a unique one") {
    // doc 3 repeats the corpus-dominant bigram pattern; doc 4 is the
    // lone novel doc — the LM must find doc 4 more surprising
    val common = (1L to 8L).map(i => (i, "the cat sat on the mat", "en", "t", 22L))
    val dir = writeDocs(common :+ (9L, "zq xv wk jh qp zz", "en", "t", 17L))
    val byDoc = TextOps.textPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byDoc(9L) > byDoc(1L))
  }

  test("pixel stats decode multi-byte UTF-8 per BYTE, not per character") {
    // "Aé✓" in UTF-8: 'A'=65, é=0xC3 0xA9 (195,169), ✓=0xE2 0x9C 0x93
    // (226,156,147) — six bytes, and the position-weighted checksum pins
    // their exact order
    val dir = writeDocs(Seq((5L, "A\u00e9\u2713", "en", "t", 3L)))
    val r = MultimodalOps.mediaPixels(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === 5L)
    assert(row.getLong(1) === 6L)      // n_px = bytes, not 3 characters
    assert(row.getLong(2) === 958L)    // 65+195+169+226+156+147
    assert(row.getLong(4) === 65L)     // min
    assert(row.getLong(5) === 226L)    // max
    assert(row.getLong(6) === 3528L)   // Σ i·v over the byte order
  }

  test("planted payload twins meet at hamming 0 in phash pairs") {
    val docs = (0L to 120L).map { i =>
      (i, s"document number $i with payload content ${i * 31} and tail ${i * 7}", "en", "t", 40L)
    }
    val dir = writeDocs(docs)
    val got = MultimodalOps.phashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // %97 plants: docs 0 and 97 get exact-copy twins under +1e12
    for (base <- Seq(0L, 97L)) {
      val hit = got.find(p => p._1 == base && p._2 == base + 1000000000000L)
      assert(hit.nonEmpty, s"missing planted twin pair for doc $base")
      assert(hit.get._3 === 0L)
    }
  }
}
