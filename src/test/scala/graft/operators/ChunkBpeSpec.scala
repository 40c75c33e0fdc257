package graft.operators

import graft.GraftSpec

/** [[TextOps.textChunkWindows]] / [[TextOps.textBpePairs]] on planted
  * fixtures: window boundaries, stride/overlap arithmetic, short-tail
  * windows, pair counting incl. multi-byte characters. */
class ChunkBpeSpec extends GraftSpec {

  test("chunk windows: stride 24, width 32, short tail, full coverage") {
    val tokens = (1 to 80).map(i => s"t$i") // 80 tokens -> starts 0,24,48,72
    val dir = writeDocs(Seq(
      (1L, tokens.mkString(" "), "en", "a", 100L),
      (2L, "solo", "en", "a", 4L),   // one 1-token chunk
      (3L, "", "en", "a", 0L),       // empty: no chunks
      (4L, null, "en", "a", 0L)))    // null: no chunks
    val got = TextOps.textChunkWindows(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq ==
      Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 8L))) // tail = 80-72
    // fingerprint of the first window is md5 of tokens 1..32
    val exp0 = java.security.MessageDigest.getInstance("MD5")
      .digest(tokens.take(32).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.find(_._2 == 0L).get._4 == exp0)
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq == Seq((0L, 1L)))
    assert(!got.exists(c => c._1 == 3L || c._1 == 4L))
    // every token covered: sum of stride-distinct coverage
    assert(d1.map(_._3).sum >= 80L)
  }

  test("bpe pairs: adjacent in-token pairs, multi-byte chars, top-k order") {
    val dir = writeDocs(Seq(
      (1L, "abab ab", "en", "a", 7L),   // "abab": ab,ba,ab; "ab": ab -> ab x3, ba x1
      (2L, "héé x", "en", "a", 5L),     // hé x1, éé x1; "x" too short
      (3L, "ab", "en", "a", 2L)))       // ab x1
    val got = TextOps.textBpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.head == ("ab", 4L))
    val m = got.toMap
    assert(m("ba") == 1L && m("hé") == 1L && m("éé") == 1L)
    assert(!m.contains("x"))
    // descending counts, lexicographic tie-break
    got.sliding(2).foreach {
      case Seq((p1, n1), (p2, n2)) =>
        assert(n1 > n2 || (n1 == n2 && p1 < p2))
      case _ =>
    }
  }
}
