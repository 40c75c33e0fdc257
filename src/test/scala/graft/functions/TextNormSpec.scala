package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Ground truth for the codegen NFC expression and the normalization
  * query: decomposed sequences must compose, already-normalized ASCII
  * must pass through untouched (the fast path), and NULL stays NULL. */
class TextNormSpec extends GraftSpec {

  test("graft_nfc composes decomposed forms and passes ASCII through") {
    import spark.implicits._
    TextNormExpressions.register(spark)
    val rows = Seq(
      ("ascii", "plain ascii text"),
      ("decomposed", "cafe\u0301"),          // e + COMBINING ACUTE
      ("composed", "caf\u00e9"),             // precomposed é
      ("angstrom", "\u212b"),                // ANGSTROM SIGN → NFC: Å (U+00C5)
      ("nullcase", null))
    val got = rows.toDF("k", "s")
      .select(col("k"), TextNormExpressions.nfc(col("s")).as("n"),
        length(TextNormExpressions.nfc(col("s"))).as("len"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(got("ascii") === ((Some("plain ascii text"), 16)))
    assert(got("decomposed") === ((Some("caf\u00e9"), 4)))
    assert(got("composed") === ((Some("caf\u00e9"), 4)))
    assert(got("angstrom") === ((Some("\u00c5"), 1)))
    assert(got("nullcase") === ((None, -1)))
  }

  test("text_normalize: planted decomposed rows shrink and are flagged changed") {
    val dir = writeDocs(Seq(
      (103L * 2, "Two  Spaces", "en", "t", 11L), // 206 % 103 == 0 → planted twin
      (7L, "ok", "en", "t", 2L)))
    val got = graft.operators.TextOps.textNormalize(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // base doc 206: "Two  Spaces" → "two spaces" (11 → 10 chars, changed)
    assert(got(206L) === ((11L, 10L, true)))
    // its planted twin: " cafe" + combining acute appended (6 more chars);
    // NFC composes the pair → one char shorter than raw
    assert(got(206L + 3000000000000L) === ((17L, 15L, true)))
    // untouched lowercase single-token doc: unchanged
    assert(got(7L) === ((2L, 2L, false)))
  }
}
