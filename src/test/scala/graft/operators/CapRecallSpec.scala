package graft.operators

import graft.GraftSpec

/** Recall preservation under the skew caps — the invariant the cap
  * comments claim: the df ≤ 500 / hot-bucket > 500 bounds drop only
  * NON-DISCRIMINATIVE keys (boilerplate shingles, degenerate band
  * buckets), so a true near-dup pair whose documents carry rare
  * discriminating content is never lost.
  *
  * Each seeded corpus has two populations:
  *  - a CLONE block of `HotBucketCap + 20` identical boilerplate docs —
  *    every one of their shingles/band buckets exceeds the caps, so the
  *    caps demonstrably FIRE (the ~135k clone×clone pairs would dominate
  *    the output if they didn't; instead clone pairs must be absent);
  *  - a DIVERSE block of random-token docs, ten of which get an exact
  *    twin planted under doc_id + 1e6 — rare shingles, two-member band
  *    buckets, far under every cap.
  *
  * Required on every pipeline: all 10 planted pairs present (recall 1.0
  * under capping), zero clone×clone pairs (caps engaged).
  */
class CapRecallSpec extends GraftSpec {

  private val PlantOff = 1000000L

  private def corpus(seed: Int): (String, Set[(Long, Long)], Long => Boolean) = {
    val rnd = new scala.util.Random(seed)
    val boiler = Seq.fill(24)("boiler" + rnd.nextInt(40)).mkString(" ")
    val nClones = DedupOps.HotBucketCap + 20
    val clones = (1L to nClones.toLong).map(i => (i, boiler))
    val diverse = (10001L to 10040L).map { i =>
      (i, Seq.fill(30)("w" + rnd.nextInt(100000)).mkString(" "))
    }
    val twins = diverse.take(10).map { case (i, t) => (i + PlantOff, t) }
    val docs = (clones ++ diverse ++ twins).map { case (i, t) =>
      (i, t, "en", "capspec", t.length.toLong)
    }
    val planted = diverse.take(10).map { case (i, _) => (i, i + PlantOff) }.toSet
    (writeDocs(rnd.shuffle(docs)), planted, (id: Long) => id <= nClones)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val pipelines: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "ngram_jaccard" -> (DedupOps.ngramJaccard _),
    "minhash_pairs" -> (DedupOps.minhashPairs _),
    "simhash_pairs" -> (DedupOps.simhashPairs _),
    "minhash_portable" -> (DedupOps.minhashPortable _),
    "simhash_portable" -> (DedupOps.simhashPortable _),
    "phash_pairs" -> (MultimodalOps.phashPairs _),
  )

  for (seed <- Seq(41, 42)) {
    test(s"caps fire on the clone block yet keep every planted pair (seed $seed)") {
      val (dir, planted, isClone) = corpus(seed)
      for ((name, fn) <- pipelines) {
        val got = pairs(fn(spark, dir))
        val missing = planted -- got
        assert(missing.isEmpty, s"$name dropped planted pairs: $missing")
        val clonePairs = got.filter { case (a, b) => isClone(a) && isClone(b) }
        assert(clonePairs.isEmpty,
          s"$name emitted ${clonePairs.size} clone pairs — caps did not engage")
      }
    }
  }
}
