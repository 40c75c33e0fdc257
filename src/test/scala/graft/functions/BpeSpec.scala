package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** BPE codec: golden-fixture parity on the classic hand-computed
  * corpus, encode∘decode identity, merge-order determinism, and the
  * codegen expression surface. */
class BpeSpec extends GraftSpec {

  // the textbook corpus (Sennrich et al. shapes): word frequencies
  // low×5 lower×2 newest×6 widest×3. Hand-computed first four merges:
  //   pair counts round 1: es 9, st 9 (tie → lexicographic), lo 7, ow 7
  //   → "e s"; then "es t" (9); then "l o" (7, tie with "o w"); "lo w"
  private val sample: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("golden fixture: merge table matches the hand computation") {
    val merges = BpeCodec.train(sample.mkString(" ") :: Nil, 4)
    assert(merges == Seq("e s", "es t", "l o", "lo w"))
    // training is deterministic: same sample, same table, any split
    assert(BpeCodec.train(sample, 4) == merges)
  }

  test("golden fixture: encode applies merges in rank order") {
    val merges = BpeCodec.train(sample, 4)
    val vocab = "deilnorstw".map(String.valueOf(_)) ++
      Seq("es", "est", "lo", "low")
    val codec = new BpeCodec(merges.toArray, vocab.toArray)
    def toks(s: String): Seq[String] = {
      val ids = codec.encode(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until ids.numElements).map(i => vocab(ids.getInt(i)))
    }
    // lowest = l o w e s t → es → est → lo → low → [low, est]
    assert(toks("lowest") == Seq("low", "est"))
    assert(toks("newest") == Seq("n", "e", "w", "est"))
    assert(toks("low") == Seq("low"))
    assert(toks("wide") == Seq("w", "i", "d", "e"))
    // out-of-vocab char: id -1, decodes to the replacement char
    val ids = codec.encode(org.apache.spark.unsafe.types.UTF8String.fromString("x"))
    assert(ids.getInt(0) == -1)
    assert(codec.decode(ids).toString == "�")
  }

  test("property: decode-encode identity under a covering vocab") {
    val merges = BpeCodec.train(sample, 8)
    val rnd = new scala.util.Random(421631)
    // atoms, not chars: a 🙂 stays a paired surrogate (Spark strings
    // are UTF-8 — they never carry a LONE half, so the generator
    // shouldn't either)
    val atoms = "lowestnewidr éß日本語 \t".map(String.valueOf(_)) :+ "🙂"
    val cases: Seq[String] =
      Seq("", " ", "lowest", "l", "日本語テスト", "a🙂b🙂🙂", "éé́é",
        "low " * 30) ++
        (1 to 200).map(_ => (0 until rnd.nextInt(120))
          .map(_ => atoms(rnd.nextInt(atoms.length))).mkString)
    cases.foreach { s =>
      // base alphabet at CODE-POINT granularity — the codec's contract
      // (a lone surrogate half is not even valid UTF-8)
      val chars = s.codePoints().toArray.toSeq
        .map(cp => new String(Character.toChars(cp))).distinct
      val mergeToks = merges.map { m =>
        val sp = m.indexOf(' '); m.substring(0, sp) + m.substring(sp + 1) }
      val vocab = (chars ++ mergeToks).distinct
      val codec = new BpeCodec(merges.toArray, vocab.toArray)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val once = codec.encode(u)
      // identity at the UTF8String level — what Spark stores
      // (surrogate halves concatenate back exactly)
      assert(codec.decode(once).toString == u.toString,
        s"roundtrip failed on '$s'")
      // determinism
      val twice = codec.encode(u)
      assert((0 until once.numElements).forall(i =>
        once.getInt(i) == twice.getInt(i)))
    }
  }

  test("expression surface: codegen encode/decode over a DataFrame") {
    import spark.implicits._
    BpeExpressions.register(spark)
    val merges = BpeCodec.train(sample, 4)
    val vocab = ("deilnorstw".map(String.valueOf(_)) ++
      Seq("es", "est", "lo", "low", " ")).toSeq
    val m = typedLit(merges)
    val v = typedLit(vocab)
    val df = Seq((1L, "lowest low"), (2L, "newest"), (3L, ""))
      .toDF("id", "t")
      .select(col("id"), col("t"),
        BpeExpressions.bpe_encode(col("t"), m, v).as("ids"))
      .select(col("id"), col("t"), col("ids"),
        BpeExpressions.bpe_decode(col("ids"), v).as("back"))
    val rows = df.orderBy("id").collect()
    assert(rows.forall(r => r.getString(1) == r.getString(3)),
      "decode(encode(x)) must equal x")
    // "lowest low" → es → est → lo → low: [low, est, ' ', low]
    val got = rows(0).getSeq[Int](2).map(vocab(_))
    assert(got == Seq("low", "est", " ", "low"))
    assert(rows(2).getSeq[Int](2).isEmpty) // empty text → zero tokens
    // NULL text → NULL ids (null-safe expression)
    val n = Seq((4L, null: String)).toDF("id", "t")
      .select(BpeExpressions.bpe_encode(col("t"), m, v).as("ids")).head()
    assert(n.isNullAt(0))
  }

  test("re-based token budget: cumulative REAL ids per source") {
    import spark.implicits._
    BpeExpressions.register(spark)
    val merges = BpeCodec.train(sample, 4)
    val vocab = ("deilnorstw ".map(String.valueOf(_)) ++
      Seq("es", "est", "lo", "low")).toSeq
    val m = typedLit(merges)
    val v = typedLit(vocab)
    val docs = Seq((1L, "s1", "lowest"), (2L, "s1", "newest newest"),
      (3L, "s1", "low"), (4L, "s2", "widest")).toDF("doc_id", "source", "t")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = docs
      .select(col("source"), col("doc_id"),
        size(BpeExpressions.bpe_encode(col("t"), m, v)).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .filter(col("cum") <= 12)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("cum")).as("tokens_used"))
      .orderBy(col("source")).collect()
    // s1: lowest=2 (low,est), newest×2 = (n,e,w,est,' ',n,e,w,est)=9 →
    // cum 11; low=1 → cum 12 — all three fit exactly;
    // s2: widest = w,i,d,est = 4
    assert(budget.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("s1", 3L, 12L), ("s2", 1L, 4L)))
  }

  test("declared queries: token ids + roundtrip audit on the sf corpus") {
    val ids = graft.operators.TextOps.textTokenIds(spark, sfDir)
    val rows = ids.limit(20).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0))
    val audit = graft.operators.TextOps.textBpeRoundtrip(spark, sfDir).head()
    assert(audit.getLong(0) > 0 && audit.getLong(0) == audit.getLong(1),
      s"roundtrip identity failed: ${audit.getLong(1)}/${audit.getLong(0)}")
    // compression sanity: real ids never exceed the character count
    val over = graft.operators.TextOps.textTokenIds(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir), "doc_id")
      .filter(col("n_tokens") > char_length(coalesce(col("text"), lit(""))))
      .count()
    assert(over == 0, "token count exceeded character count somewhere")
  }

  test("astral text: surrogate halves are in-vocab, roundtrip exact") {
    // the corpus alphabet is collected per CODE POINT (split(text,''))
    // but the codec encodes per UTF-16 UNIT — non-BMP chars (emoji)
    // must land in the vocab as BOTH surrogate halves, or encode
    // yields -1 and decode U+FFFD
    val dir = writeDocs(Seq(
      (1L, "hello 😀 world", "en", "s", 13L),
      (2L, "🚀🚀 lift off 🚀x", "en", "s", 15L),
      (3L, "plain ascii only", "en", "s", 16L)))
    val audit = graft.operators.TextOps.textBpeRoundtrip(spark, dir).head()
    assert(audit.getLong(0) == 3L && audit.getLong(1) == 3L,
      s"astral roundtrip: ${audit.getLong(1)}/${audit.getLong(0)} exact")
    // and no out-of-vocab id reaches the declared ids query
    val heads = graft.operators.TextOps.textTokenIds(spark, dir)
      .collect().map(_.getString(2))
    assert(heads.forall(h => !h.split(",").contains("-1")),
      s"out-of-vocab id in ${heads.mkString("; ")}")
  }
}
