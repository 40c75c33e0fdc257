package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.Row

/** Ground-truth checks for the curation pack: every operator's result is
  * recomputed from the raw fixture with plain Scala collections (no
  * Spark, no SQL) and compared exactly — independent of the DuckDB
  * oracle, so an error shared by both SQL dialects would still be
  * caught here.
  */
class CurationOpsSpec extends GraftSpec {

  private lazy val docs: Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def ngrams(text: String, n: Int): Set[String] = {
    val tk = text.split(" ", -1)
    if (tk.length < n) Set.empty
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  private val canary = "eval canary alpha beta gamma"

  private def expectedDecontam: Map[Long, (Long, Long)] = {
    val bench = docs.filter(_._1 % 131 == 0).flatMap(d => ngrams(d._2, 5)).toSet + canary
    docs.filter(_._1 % 131 != 0).flatMap { case (id, text, _, _) =>
      val aug = if (id % 23 == 0) s"$text $canary" else text
      val shs = ngrams(aug, 5)
      val m = shs.count(bench.contains)
      if (m > 0) Some(id -> (shs.size.toLong, m.toLong)) else None
    }.toMap
  }

  test("decontam_exact matches a from-scratch Scala recomputation") {
    val got = CurationOps.decontamExact(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expectedDecontam)
    // the planted slice is fully detected (gate is not vacuous)
    val planted = docs.map(_._1).filter(id => id % 23 == 0 && id % 131 != 0)
    assert(planted.nonEmpty && planted.forall(got.contains))
  }

  test("textRepetition defines keep for 1-/2-token docs (no NULL fracs)") {
    val dir = writeDocs(Seq(
      (1L, "one", "en", "s", 3L),
      (2L, "two words", "en", "s", 9L),
      (3L, "now three tokens here", "en", "s", 20L)))
    val rows = CurationOps.textRepetition(spark, dir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dup2_frac")), r.toString)
      assert(!r.isNullAt(r.fieldIndex("dup3_frac")), r.toString)
      assert(!r.isNullAt(r.fieldIndex("keep")), r.toString)
    }
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // a doc too short to have n-grams has zero duplicate n-grams
    assert(byId(1L).getDouble(byId(1L).fieldIndex("dup2_frac")) === 0.0)
    assert(byId(1L).getDouble(byId(1L).fieldIndex("dup3_frac")) === 0.0)
    assert(byId(2L).getDouble(byId(2L).fieldIndex("dup3_frac")) === 0.0)
  }

  test("decontam_bloom is bit-identical to decontam_exact") {
    val exact = CurationOps.decontamExact(spark, sfDir).collect().toSeq
    val bloom = CurationOps.decontamBloom(spark, sfDir).collect().toSeq
    assert(bloom === exact)
  }

  test("pack_sequences manifest matches greedy start-offset binning") {
    val budget = 512L
    val expected = docs.groupBy(_._4).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, text, _, _) =>
        val nt = text.split(" ", -1).length.toLong
        val start = cum; cum += nt
        (src, start / budget, id, nt)
      }
    }.toSeq.groupBy(t => (t._1, t._2)).map { case ((src, pack), rows) =>
      (src, pack) -> (rows.size.toLong, rows.map(_._4).sum,
        rows.map(_._3).min, rows.map(_._3).max)
    }
    val got = CurationOps.packSequences(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expected)
    // packs are contiguous from 0 within each source
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.size))
    }
  }

  test("mixture_sample honors data-derived integer-rate gates exactly") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def gate(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val w = Map("en" -> 4L, "zh" -> 1L).withDefaultValue(2L)
    val n = docs.groupBy(_._3).map { case (l, ds) => l -> ds.size.toLong }
    val k = n.map { case (l, c) => c / w(l) }.min
    val expected = n.keys.toSeq.sorted.map { l =>
      val target = w(l) * k
      val kept = docs.filter(d => d._3 == l && gate(d._1) * n(l) < target * 1000000L)
      Row(l, n(l), w(l), target, kept.size.toLong,
        if (kept.isEmpty) null else kept.map(_._1).min)
    }
    val got = CurationOps.mixtureSample(spark, sfDir).collect().toSeq
    assert(got === expected)
    // every stratum honors its cap; the en stratum dominates by weight
    got.foreach(r => assert(r.getLong(4) <= r.getLong(1)))
    assert(got.map(_.getLong(4)).sum > 0)
  }

  test("curation_pipeline funnel matches stage-by-stage recomputation") {
    val md5i = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md5i.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val base = docs.filter(_._1 % 131 != 0)
    val all = base ++ base.filter(_._1 % 97 == 0)
      .map(d => (d._1 + 1000000000000L, d._2, d._3, d._4))
    val bench = docs.filter(_._1 % 131 == 0).flatMap(d => ngrams(d._2, 5)).toSet + canary
    val contaminated = base.filter { case (id, t, _, _) =>
      val aug = if (id % 23 == 0) s"$t $canary" else t
      ngrams(aug, 5).exists(bench.contains)
    }.map(_._1).toSet
    val survivor = all.groupBy(d => md5hex(d._2)).map { case (fp, ds) => fp -> ds.map(_._1).min }
    def gate(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100
    val perDoc = all.map { case (id, t, lang, src) =>
      val tk = t.split(" ", -1)
      val okQ = tk.length >= 5 && tk.length <= 10000 &&
        tk.distinct.length.toDouble / tk.length > 0.2
      val okC = !contaminated.contains(id)
      val okS = survivor(md5hex(t)) == id
      val rate = lang match { case "en" => 20; case "zh" => 10; case _ => 50 }
      val okG = gate(id) < rate
      (src, id, okQ, okC, okS, okG)
    }
    val expected = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val keep = ds.filter(d => d._3 && d._4 && d._5 && d._6)
      Row(src, ds.size.toLong, ds.count(_._3).toLong, ds.count(_._4).toLong,
        ds.count(_._5).toLong, ds.count(_._6).toLong, keep.size.toLong,
        if (keep.isEmpty) null else keep.map(_._2).min)
    }
    val got = CurationOps.curationPipeline(spark, sfDir).collect().toSeq
    assert(got === expected)
    // the funnel is non-vacuous: contamination and dup-survivorship each
    // reject at least one doc somewhere
    assert(got.map(r => r.getLong(1) - r.getLong(3)).sum > 0)
    assert(got.map(r => r.getLong(1) - r.getLong(4)).sum > 0)
  }

  test("text_repetition fractions match direct recomputation") {
    def fr(a: Long, b: Long): Double =
      BigDecimal(a.toDouble / b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.sortBy(_._1).map { case (id, text, _, _) =>
      val tk = text.split(" ", -1).toSeq
      val nt = tk.length.toLong
      val d2 = tk.sliding(2).map(_.mkString(" ")).toSet.size.toLong
      val d3 = tk.sliding(3).map(_.mkString(" ")).toSet.size.toLong
      val top = tk.groupBy(identity).values.map(_.size).max.toLong
      val (f2, f3, ft) = (fr(nt - 1 - d2, nt - 1), fr(nt - 2 - d3, nt - 2), fr(top, nt))
      Row(id, nt, f2, f3, ft, f2 <= 0.2 && f3 <= 0.15 && ft <= 0.3)
    }
    val got = CurationOps.textRepetition(spark, sfDir).collect().toSeq
    assert(got === expected)
  }
}
