package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the fused sketches on seeded random token
  * streams — driver-side, no Spark session needed (the expressions are
  * thin wrappers over these static helpers). The merge law is what makes
  * the source-level signatures of `dedup_source_overlap` correct.
  */
class SketchPropertySpec extends AnyFunSuite {

  private val P = 1000000007L

  private def randomDoc(rnd: scala.util.Random): String = {
    val n = 3 + rnd.nextInt(38)
    Seq.fill(n)({
      val len = 1 + rnd.nextInt(6)
      Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    }).mkString(" ")
  }

  private def sig(text: String, k: Int): Seq[Long] = {
    val a = SketchOps.portableSig(UTF8String.fromString(text), k, P)
    if (a == null) null else a.toLongArray().toSeq
  }

  private def shingles(t: String): Set[String] = {
    val toks = t.split(" ", -1)
    (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
  }

  test("MinHash merge law: min(sig A, sig B) = sig over the shingle union") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val (a, b) = (randomDoc(rnd), randomDoc(rnd))
      val merged = sig(a, 8).zip(sig(b, 8)).map { case (x, y) => math.min(x, y) }
      val expected = (0 until 8).map { k =>
        (shingles(a) ++ shingles(b)).map { sh =>
          val h0 = PolyHash.hash(UTF8String.fromString(sh))
          (h0 * (37 + 2 * k) + (1000 + k)) % P
        }.min
      }
      assert(merged === expected)
    }
  }

  test("SimHash set semantics: permutation- and duplication-invariant") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200) {
      val doc = randomDoc(rnd)
      val toks = doc.split(" ", -1)
      val shuffled = rnd.shuffle(toks.toList).mkString(" ")
      val doubled = (toks ++ toks).mkString(" ")
      val base = SketchOps.simhash64(UTF8String.fromString(doc))
      assert(SketchOps.simhash64(UTF8String.fromString(shuffled)) === base)
      assert(SketchOps.simhash64(UTF8String.fromString(doubled)) === base)
      assert(SketchOps.portableSimhash(UTF8String.fromString(shuffled), 60, P) ===
        SketchOps.portableSimhash(UTF8String.fromString(doc), 60, P))
    }
  }

  test("identical docs collide; disjoint-vocabulary docs differ") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val doc = randomDoc(rnd)
      assert(sig(doc, 8) === sig(doc, 8))
      // uppercase+suffix rewrite makes every shingle different; 8 mins
      // all colliding across disjoint sets is astronomically unlikely
      val other = doc.split(" ", -1).map(t => t.toUpperCase + "X").mkString(" ")
      assert(sig(doc, 8) !== sig(other, 8))
    }
  }
}
