package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table — the training-data-pipeline
  * operators (language ID, quality scoring, token counting, document
  * fingerprinting). All hot-path logic is codegen'd higher-order
  * `functions._` over token arrays; no UDFs, so whole-stage codegen spans
  * the scan→project pipeline and each op is embarrassingly parallel
  * (scales linearly with input splits at 100 TB — no shuffle at all except
  * where an aggregation is the point).
  */
object TextOps extends QueryPack {

  private def toks: Column = split(col("text"), " ")

  // Stopword tables for the n-gram-free language-ID heuristic. Scoring =
  // number of tokens that hit each language's function-word list.
  private val enStops = Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for")
  private val esStops = Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "los")
  private val deStops = Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "nicht")
  private val frStops = Seq("le", "la", "de", "et", "les", "des", "en", "une", "du", "dans")

  private def hitCount(stops: Seq[String]): Column = {
    val set = stops.map(w => s"'$w'").mkString(", ")
    expr(s"CAST(size(filter(split(text, ' '), t -> t IN ($set))) AS BIGINT)")
  }

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (ceil(chars/4) is the standard bytes-per-token heuristic). */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        ceil(length(col("text")) / 4.0).cast("long").as("n_bpe_est"))
      .orderBy(col("doc_id"))

  /** Quality scoring: uniq-token ratio, mean token length, stopword ratio.
    * All ratios are int/int divisions → bit-identical across engines. */
  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("tk"), length(col("text")).as("nc"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_uniq"),
        round(size(array_distinct(col("tk"))).cast("double") / size(col("tk")), 4).as("uniq_ratio"),
        round((col("nc") - (size(col("tk")) - 1)).cast("double") / size(col("tk")), 4).as("avg_tok_len"))
      .orderBy(col("doc_id"))

  /** Language ID: stopword-hit scoring with a deterministic argmax order
    * (en > es > de > fr on ties). Emits the per-language scores so the
    * oracle checks the full evidence, not just the argmax. */
  def textLangId(s: SparkSession, d: String): DataFrame = {
    val (se, ss, sd, sf) = (hitCount(enStops), hitCount(esStops), hitCount(deStops), hitCount(frStops))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("tagged_lang"),
        se.as("s_en"), ss.as("s_es"), sd.as("s_de"), sf.as("s_fr"))
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))
      .orderBy(col("doc_id"))
  }

  /** Content-defined fingerprint: md5 over the sorted token multiset —
    * invariant to token order, the canonical "bag of words" fingerprint. */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(array_join(array_sort(split(lower(col("text")), " ")), " ")).as("fp"))
      .orderBy(col("doc_id"))

  /** Rolling polynomial hash over the token stream (order-sensitive, the
    * Rabin-Karp-style fingerprint). Per-token 32-bit code = first 8 hex
    * chars of md5 — a hash family BOTH engines implement identically, so
    * (unlike xxhash64) the full fold is oracle-checkable. Folded through a
    * 31-multiplier chain mod a 57-bit prime: acc*31 + code stays < 2^63,
    * so the fold never overflows (ANSI mode makes overflow an error).
    * Pure codegen'd expressions, no UDF. */
  def textRollingHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("aggregate(split(text, ' '), CAST(1125899906842597 AS BIGINT), " +
          "(acc, t) -> pmod(acc * 31 + CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT), " +
          "144115188075855859))")
          .as("rolling_fp"))
      .orderBy(col("doc_id"))

  // PII patterns restricted to the regex subset Java (Spark) and RE2
  // (DuckDB) treat identically: character classes + bounded repetition,
  // no backrefs/lookaround.
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII redaction — the scrubbing pass every training-data pipeline runs
    * before the corpus ships. The fixture text contains no PII (the gate
    * would be vacuous), so deterministic addresses are PLANTED per doc_id
    * — identically in the oracle — then detected (`regexp_extract_all`
    * count) and redacted (`regexp_replace` → placeholder tokens); the
    * md5 of the redacted text proves byte-exact replacement semantics.
    * Shuffle-free projection: scales linearly with input splits. */
  def textPiiRedact(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".17")))
        .otherwise(lit("")))
    Tables.documents(s, d)
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(ipPat), lit(0))).cast("long").as("n_ips"),
        md5(regexp_replace(regexp_replace(col("aug"), emailPat, "<EMAIL>"),
          ipPat, "<IP>")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** HTML boilerplate stripping — the main-content extraction pass web
    * corpora run before anything else (the trafilatura/jusText job, in
    * its regex-pipeline shape): drop <script>/<style> WITH their
    * contents, drop every remaining tag, collapse whitespace. The
    * corpus is plain text, so a deterministic page wrapper (title/nav/
    * footer chrome around the document body) is PLANTED per doc —
    * identically in the oracle — and the md5 of the cleaned text proves
    * byte-exact extraction, while the boilerplate ratio is the
    * chrome-share diagnostic a crawl-quality dashboard tracks.
    * Shuffle-free projection; scales linearly with input splits. */
  def textHtmlStrip(s: SparkSession, d: String): DataFrame = {
    val page = concat(
      lit("<html><head><title>doc "), col("doc_id").cast("string"),
      lit("</title><script>var nav = 1;</script><style>p{color:red}" +
        "</style></head><body><div class=\"nav\">Home | About | Login" +
        "</div><p>"),
      col("text"),
      lit("</p><footer>(c) 2024 example.org</footer></body></html>"))
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), page.as("page"))
      .select(col("doc_id"),
        octet_length(col("page")).cast("long").as("n_bytes_raw"),
        trim(regexp_replace(regexp_replace(regexp_replace(col("page"),
          "<(script|style)[^>]*>.*?</(script|style)>", " "),
          "<[^>]+>", " "),
          "\\s+", " ")).as("clean"))
      .select(col("doc_id"), col("n_bytes_raw"),
        octet_length(col("clean")).cast("long").as("n_bytes_clean"),
        md5(col("clean")).as("clean_md5"),
        // exact integer basis points — a double ratio can land exactly
        // on a .00005 rounding tie (observed: 1 - 166/320) where the
        // engines' round() disagree by one ulp
        ((col("n_bytes_raw") - col("n_bytes_clean")) * 10000L /
          col("n_bytes_raw")).cast("long").as("boiler_bp"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary heavy hitters: global top-50 tokens by frequency
    * (count desc, token asc tiebreak). explode → map-side partial count →
    * one keyed shuffle → TakeOrdered: the canonical heavy-hitters shape
    * that never materializes the full vocabulary anywhere. */
  def textVocabTopK(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  /** ZIPF-law fit over the top-100 vocabulary: OLS of ln(frequency) on
    * ln(rank) — natural language sits near slope −1, so the fitted
    * slope is the corpus-statistics smoke test for degenerate or
    * machine-generated text (boilerplate floods flatten it, random
    * token soup steepens the tail). Counts and ranks are exact
    * integers (count-desc, token-asc tie-break — deterministic in both
    * engines); the ONLY float step is the final ln/OLS arithmetic over
    * ≤100 rows, rounded at 4 dp. One token explode → keyed count →
    * top-100 (TakeOrdered) → single 100-row projection. */
  def textZipfFit(s: SparkSession, d: String): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)
    val ranked = top.select(col("n"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))).cast("long").as("r"))
    val m = ranked.select(log(col("r").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
    val kD = "CAST(k AS DOUBLE)"
    val den = s"($kD * sxx - sx * sx)"
    val num = s"($kD * sxy - sx * sy)"
    m.select(col("k").as("n_vocab"),
        expr(s"CASE WHEN $den > 0 THEN round($num / $den, 4) END")
          .as("zipf_slope_4"),
        expr(s"CASE WHEN $den > 0 THEN round((sy - $num / $den * sx) / $kD, 4) END")
          .as("zipf_icept_4"))
      .filter(col("n_vocab") > 0)
  }

  /** Gopher-style composite quality filter: each rule a boolean column,
    * `keep` their conjunction — the downstream pipeline filters on `keep`
    * and audits the per-rule columns. Pure int arithmetic + anchored
    * regex (identical across engines); shuffle-free. */
  def textQualityFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("tk"), length(col("text")).as("nc"))
      .select(col("doc_id"),
        (size(col("tk")) >= 5 && size(col("tk")) <= 10000).as("ok_len"),
        ((col("nc") - (size(col("tk")) - 1)).cast("double") / size(col("tk")) >= 2.0 &&
          (col("nc") - (size(col("tk")) - 1)).cast("double") / size(col("tk")) <= 12.0)
          .as("ok_tok_len"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")) > 0.2)
          .as("ok_uniq"),
        (expr("size(filter(tk, t -> t RLIKE '^[0-9]+$'))").cast("double") /
          size(col("tk")) < 0.5).as("ok_numeric"))
      .withColumn("keep",
        col("ok_len") && col("ok_tok_len") && col("ok_uniq") && col("ok_numeric"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling — the data-mixing primitive: each
    * language stratum keeps a different fraction, gated by a PORTABLE
    * per-doc hash (first 8 md5 hex chars of the doc_id → int % 100), so
    * the same rows are kept on every engine, every run, at any
    * parallelism — unlike `rand()`/`sampleBy`, which are seed- and
    * partitioning-dependent. Shuffle only for the audit aggregation. */
  def textSampleStratified(s: SparkSession, d: String): DataFrame = {
    val gate = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
    val rate = when(col("lang") === "en", 20)
      .when(col("lang") === "zh", 10)
      .otherwise(50)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), gate.as("h"), rate.as("rate"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("h") < col("rate"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("h") < col("rate"), col("doc_id"))).as("first_kept"))
      .orderBy(col("lang"))
  }

  /** Token-budget selection — corpus curation under a token cap: per
    * source, docs are taken in doc_id order until the running token sum
    * exceeds the budget. One window pass (cumsum), no self-join; the
    * window key is the stratum so state is per-source, not global. */
  def textTokenBudget(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), size(toks).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .filter(col("cum") <= 400)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("cum")).as("tokens_used"))
      .orderBy(col("source"))
  }

  /** Model-based quality scoring — the fastText/CCNet-style linear
    * classifier over hashed token features, the filtering step quality
    * pipelines run after the rule-based gates: each token hashes into one
    * of 64 weight buckets (codegen [[graft.functions.PolyHash]], the
    * portable base-31 fold), the bucket's INTEGER weight in [-50, 50]
    * accumulates exactly (order-independent across any partitioning), and
    * the doc's score is the mean weight — `z_micro` fixed-point, `keep`
    * iff the raw integer sum is positive. The deterministic weight
    * formula stands in for a broadcast trained-weight array; swapping it
    * in changes no plan shape. One explode + one partial-agged groupBy:
    * the same scale budget as token counting. */
  def textQualityModel(s: SparkSession, d: String): DataFrame = {
    graft.functions.HashExpressions.register(s)
    val wt = (graft.functions.HashExpressions.poly_hash(col("tok")) % 64) * 37 % 101 - 50
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), wt.cast("long").as("wt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("z_sum"))
      .select(col("doc_id"), col("n_tokens"), col("z_sum"),
        round(col("z_sum") * lit(10000.0) / col("n_tokens"), 0).cast("long").as("z_micro"),
        (col("z_sum") > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Token-distribution Shannon entropy per doc — the information-theoretic
    * repetition signal (low entropy = repetitive/templated text):
    * H = ln(n) − (Σ c·ln c)/n over the token histogram. Each (doc, token)
    * term is rounded to integer micro-units BEFORE the sum, so the
    * aggregate is exact and order-independent; the one remaining double
    * op (ln(n)·1e6 − m/n) is a deterministic function of exact integers,
    * identical in the oracle. Explode → two partial-agged groupBys. */
  /** Bigram-LM negative log-likelihood scoring — the CCNet/Gopher-style
    * perplexity quality signal: train an add-one-smoothed bigram model ON
    * the corpus (counts + vocab size), score every document by
    * Σ −ln((c₂+1)/(c₁+V)) over its bigrams. High NLL-per-bigram = text
    * the corpus LM finds surprising (boilerplate scores low, gibberish
    * high) — the standard filter for web-scale pretraining data.
    *
    * Floating arithmetic is confined to single `ln`s OF INTEGERS, rounded
    * to fixed-point micro-units per bigram TYPE before any summation
    * (the [[textEntropy]] idiom) — order-independent integer sums both
    * engines reproduce bit-for-bit. Scale shape: the bigram/context
    * count tables are one partial-aggregated shuffle each over corpus
    * tokens; scoring joins are keyed on bigram/context against
    * one-row-per-key count tables (no blowup on hot n-grams); V rides a
    * broadcast one-row frame — work is linear in corpus tokens, the
    * same shape as the inverted-index pipelines. */
  def textPerplexity(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), toks.as("tk"))
    // (doc_id, left token, bigram) — one row per ADJACENT pair; feeds the
    // two model aggregates and the per-doc scoring, so materialize once
    val pairs = base.select(col("doc_id"),
        explode(zip_with(
          expr("slice(tk, 1, size(tk) - 1)"),
          expr("slice(tk, 2, size(tk) - 1)"),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("doc_id"), col("p.l").as("l"),
        concat(col("p.l"), lit(" "), col("p.r")).as("bg"))
      .localCheckpoint(true)
    val c2 = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy(col("l")).agg(count(lit(1)).as("c1"))
    val vocab = base.select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val dbc = pairs.groupBy(col("doc_id"), col("bg"), col("l"))
      .agg(count(lit(1)).as("n"))
    val term = round((log(col("c2") + 1) - log(col("c1") + col("v"))) * 1e6, 0)
      .cast("long")
    dbc.join(c2, "bg").join(c1, "l").crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n"), term.as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), (-sum(col("n") * col("t"))).as("nll_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_micro"),
        round(col("nll_micro") / col("n_bigrams").cast("double"), 0)
          .cast("long").as("nll_per_bigram_micro"))
      .orderBy(col("doc_id"))
  }

  def textEntropy(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(round(col("c") * log(col("c")) * lit(1e6), 0).cast("long")).as("m"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens")) * lit(1e6) - col("m") / col("n_tokens").cast("double"), 0)
          .cast("long").as("entropy_micro"))
      .orderBy(col("doc_id"))
  }

  /** Canonical text normalization — the first stage of every training
    * corpus pipeline: Unicode NFC composition (via the codegen
    * `graft_nfc` expression — ASCII fast-path, stays in whole-stage
    * codegen), lowercase, whitespace collapse, trim. Output audits the
    * rewrite per document: char counts before/after, whether anything
    * changed, and the md5 of the normalized text (so the oracle checks
    * the exact normalized BYTES, not just lengths). Every 103rd doc is
    * re-entered with a decomposed-form suffix ("cafe" + COMBINING ACUTE)
    * so NFC does real composition work on the otherwise-ASCII corpus —
    * both engines must agree the combining pair became one code point.
    *
    * Shape: a pure scalar projection — shuffle-free, scales with input
    * splits like every other text scorer here. */
  def textNormalize(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextNormExpressions.register(s)
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val docs = base.unionByName(base
        .filter(col("doc_id") % 103 === 0 && col("text").isNotNull)
        .select((col("doc_id") + 3000000000000L).as("doc_id"),
          concat(col("text"), lit(" cafe\u0301")).as("text")))
      .filter(col("text").isNotNull)
    val norm = trim(regexp_replace(
      lower(graft.functions.TextNormExpressions.nfc(col("text"))),
      "[ \\t\\n\\r]+", " "))
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(norm).cast("long").as("n_chars_norm"),
        (norm =!= col("text")).as("changed"),
        md5(norm).as("norm_md5"))
      .orderBy(col("doc_id"))
  }

  /** Count-min-sketch heavy hitters: token frequencies estimated from a
    * FIXED-SIZE mergeable sketch — depth 4 × width 1024 integer cells —
    * reported, for the exact top-50 tokens, next to the exact count. The
    * estimate is min over the token's 4 cells; the row hashes are
    * portable md5-derived integers, so BOTH engines build bit-identical
    * sketches and the estimate itself (including its collision noise) is
    * oracle-checked, not just the exact counts.
    *
    * Why this matters at 100 TB: the sketch is 4096 cells no matter the
    * corpus — map-side partial aggregation collapses every partition to
    * ≤4096 rows before the ONE tiny shuffle, and sketches merge by cell
    * addition, so the frequency-estimation cost is O(tokens) map work +
    * a constant-size reduce, where the exact vocab aggregate's shuffle
    * grows with the live vocabulary. The CMS one-sided error
    * (estimate ≥ truth, always) is asserted in the spec. */
  def textCmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val depth = 4
    val width = 1024
    // portable row hashes: ONE md5 per token, its 32 hex chars sliced
    // into 4 disjoint 8-char windows — four independent 32-bit hashes
    // for the price of one digest (the hashing dominates the sketch
    // build, so this is the 4x constant that matters at 10x data).
    // Non-negative, so % == pmod in both engines.
    val bucket: Column =
      expr(s"CAST(conv(substring(h, 1 + 8 * CAST(r AS INT), 8), 16, 10) " +
        s"AS BIGINT) % $width")
    val rs = array((0 until depth).map(lit): _*)
    val tokens = Tables.documents(s, d).select(explode(toks).as("token"))
    val sketch = tokens
      .select(md5(col("token")).as("h"), explode(rs).as("r"))
      .select(col("r"), bucket.as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cell"))
    val top = tokens.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(50)
    top
      .select(col("token"), col("n_exact"), md5(col("token")).as("h"),
        explode(rs).as("r"))
      .withColumn("bucket", bucket)
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cell")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** PRODUCTION count-min sketch — the [[textCmsHeavyHitters]] twin with
    * the hash family swapped from portable md5 (one digest + four hex
    * slices, string-allocation-bound) to four seeded `xxhash64` calls —
    * codegen'd long arithmetic, no string materialization, the hash a
    * 100 TB sketch build would actually use. Same 4×1024 mergeable
    * integer sketch, same probe shape; only the row-hash family (and so
    * the collision noise) differs, which is exactly why this path is
    * gated by [[textCmsRecall]] instead of a value-replay oracle — the
    * dedup_minhash_pairs / dedup_sketch_recall convention. */
  def textCmsProduction(s: SparkSession, d: String): DataFrame = {
    val depth = 4
    val width = 1024
    def rowBuckets(t: Column): Column = array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(t, lit(r)), lit(width)).as("bucket"))): _*)
    val tokens = Tables.documents(s, d).select(explode(toks).as("token"))
    val sketch = tokens
      .select(explode(rowBuckets(col("token"))).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cell"))
    val top = tokens.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(50)
    top
      .select(col("token"), col("n_exact"),
        explode(rowBuckets(col("token"))).as("rb"))
      .select(col("token"), col("n_exact"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cell")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Oracle gate for the production CMS: over the top-50 exact tokens,
    * every estimate must respect the CMS one-sided error (`n_cms >=
    * n_exact` — a single underestimate means the sketch is broken) and
    * sit within 8× the expected collision mass (`(n_cms - n_exact) *
    * width <= 8 * (n_total - n_exact)`; Markov per row ⇒ a min over 4
    * independent rows exceeds 8× with probability < 8⁻⁴, and the seeded
    * hash makes the realization deterministic per corpus). The audit row
    * also carries the exact top-50 mass, which ties the production
    * pipeline's exact leg to the DuckDB-recomputed truth. */
  def textCmsRecall(s: SparkSession, d: String): DataFrame = {
    val width = 1024
    val est = textCmsProduction(s, d)
    val nTotal = Tables.documents(s, d).select(explode(toks).as("token"))
      .agg(count(lit(1)).as("n_total"))
    est.crossJoin(broadcast(nTotal))
      .agg(
        count(lit(1)).as("n_top"),
        sum(when(col("n_cms") >= col("n_exact"), 1L).otherwise(0L)).as("n_lb_ok"),
        sum(when((col("n_cms") - col("n_exact")) * width <=
          lit(8L) * (col("n_total") - col("n_exact")), 1L).otherwise(0L)).as("n_ub_ok"),
        sum(col("n_exact")).as("exact_top_mass"))
      // zero-row-corpus contract: no tokens, no audit row
      .filter(col("n_top") > 0)
  }

  /** Token-distribution divergence between corpus sources: KL(P‖Q) for
    * every ordered source pair, with add-one smoothing over the shared
    * vocabulary — the drift/mixing-QA signal that catches one source
    * going off-distribution (scraper breakage, template flooding)
    * before training does.
    *
    * Fixed-point discipline: each token's contribution
    * `p·ln(p/q)` is computed from exact BIGINT counts through an
    * identical double expression tree in both engines and rounded to
    * NANO units per TERM — the sum of longs is order-independent, so
    * the result is bit-stable at any parallelism (the
    * [[textPerplexity]] convention).
    *
    * Shape: one (source, token) count shuffle; totals are |sources| rows
    * and vocab ONE row (both broadcast); the per-term relation is
    * vocab × pairs rows built MAP-SIDE (token-map × broadcast pair
    * table — no shuffle), then one tiny keyed agg. Sources are a
    * bounded catalog dimension (tens, not millions) — the S² pair fan
    * rides on that bound, while the corpus itself is touched once. */
  def textSourceDivergence(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .filter(col("source").isNotNull)
      .select(col("source"), explode(toks).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vocab = counts.agg(countDistinct(col("token")).as("v"))
    val pairs = totals.as("a").crossJoin(totals.as("b"))
      .filter(col("a.source") =!= col("b.source"))
      .select(col("a.source").as("s1"), col("a.n").as("n1"),
        col("b.source").as("s2"), col("b.n").as("n2"))
      .crossJoin(vocab)
    // per-token source→count map: every vocab token once, smoothed
    // against EVERY pair on the map side (tokens absent from both
    // sides still carry the constant smoothing term, as the closed
    // form requires)
    val tmap = counts.groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("source"), col("c")))).as("m"))
    val p = "((c1 + 1) / CAST(n1 + v AS DOUBLE))"
    val q = "((c2 + 1) / CAST(n2 + v AS DOUBLE))"
    tmap.crossJoin(broadcast(pairs))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("v"),
        coalesce(expr("m[s1]"), lit(0L)).as("c1"),
        coalesce(expr("m[s2]"), lit(0L)).as("c2"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("v"),
        expr(s"CAST(round($p * ln($p / $q) * 1000000000.0) AS BIGINT)").as("t"))
      .groupBy(col("s1"), col("s2"), col("n1"), col("n2"), col("v"))
      .agg(sum(col("t")).as("kl_nano"))
      .orderBy(col("s1"), col("s2"))
  }

  /** RAG-style chunking: overlapping token windows of [[ChunkW]] tokens
    * at stride [[ChunkS]] (8-token overlap) — the retrieval-index unit a
    * training/RAG pipeline materializes from every document. Emits one
    * row per chunk with its token count and a content fingerprint
    * (md5 of the joined window), NOT the chunk text — the fingerprint is
    * what chunk-level dedup and index-build stages key on, and it keeps
    * the output row width constant.
    *
    * Shape: pure per-document codegen projection (split → sequence of
    * starts → explode → slice) — NO shuffle except the output sort;
    * embarrassingly parallel at 100 TB. Chunk starts are 0, S, 2S, …
    * while start < n_tokens, so the final window may be short but every
    * token is covered. */
  def textChunkWindows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(tk) - 1, $ChunkS)")).as("start"),
        col("tk"))
      .select(col("doc_id"), (col("start") / ChunkS).cast("long").as("chunk_idx"),
        expr(s"slice(tk, start + 1, $ChunkW)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ")).as("fingerprint"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val ChunkW = 32
  private val ChunkS = 24

  /** Adjacent character-pair frequencies within tokens — the merge-
    * candidate statistic a BPE tokenizer trainer computes each round
    * (the most frequent pair becomes the next merge). Top-50 pairs by
    * count, pair-lexicographic tie-break.
    *
    * Shape: token explode → per-token pair explode (codegen `transform`
    * over a character sequence — character-based substring, so multi-byte
    * UTF-8 pairs count correctly) → ONE partial-aggregated count shuffle
    * → TakeOrderedAndProject top-50. Never a full sort. */
  def textBpePairs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(char_length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(t) - 1), i -> substring(t, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(50)

  /** Memoized BPE table per corpus: merges trained IN MEMORY on a
    * bounded deterministic sample (first 256 docs by id, 1024 chars
    * each — the industry norm: tokenizers train on a sample, never the
    * 100 TB corpus), base vocab = the corpus's FULL distinct character
    * alphabet (one tiny distinct shuffle), so decode∘encode is the
    * identity on EVERY document — the property `text_bpe_roundtrip`
    * audits against the oracle. Invalidated by
    * [[graft.CacheRegistry.clear]] at pass boundaries. */
  private val bpeCache =
    new graft.CacheRegistry.VersionedMemo[(Seq[String], Seq[String])]()
  private[operators] def bpeTable(s: SparkSession, d: String): (Seq[String], Seq[String]) =
    bpeCache.getOrBuild(s, s"$d/documents.parquet") {
      val sample = Tables.documents(s, d).filter(col("text").isNotNull)
        .orderBy(col("doc_id")).limit(256)
        .select(substring(col("text"), 1, 1024).as("t"))
        .collect().map(_.getString(0)).toSeq
      val merges = graft.functions.BpeCodec.train(sample, 64)
      // split("") yields CODE POINTS (surrogate pairs whole) — exactly
      // the codec's base granularity, so astral chars (emoji, CJK-ext)
      // are in-vocab as whole code points and encode∘decode stays the
      // identity (a lone surrogate half could not even survive the
      // UTF8String vocab literal)
      val chars = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .distinct().orderBy(col("ch")).collect().map(_.getString(0)).toSeq
      val mergeToks = merges.map { m =>
        val sp = m.indexOf(' '); m.substring(0, sp) + m.substring(sp + 1) }
      (merges, (chars ++ mergeToks).distinct)
    }

  /** REAL BPE token ids per document — the encoder a pretraining
    * pipeline runs, applying the learned merge-rank table through the
    * codegen [[graft.functions.BpeEncode]] expression (the table rides
    * the expression to executors; one scan, zero joins, zero UDFs).
    * Rows-only declared (no SQL engine can replay an iterative merge);
    * its correctness rides the oracle-green `text_bpe_roundtrip` twin
    * plus `BpeSpec`'s golden/property pins — the ann_ivf/recall
    * pairing convention. */
  def textTokenIds(s: SparkSession, d: String): DataFrame = {
    val (merges, vocab) = bpeTable(s, d)
    graft.functions.BpeExpressions.register(s)
    val m = typedLit(merges)
    val v = typedLit(vocab)
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.BpeExpressions.bpe_encode(col("text"), m, v)
          .as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
        concat_ws(",",
          expr("transform(slice(ids, 1, 8), x -> CAST(x AS STRING))"))
          .as("head_ids"))
      .orderBy(col("doc_id"))
  }

  /** The encoder's correctness audit, oracle-green: decode(encode(x))
    * must equal x for EVERY document (vocab covers the full corpus
    * alphabet by construction), so `n_exact` = `n_docs` — which the
    * oracle states as two equal counts. A single dropped/duplicated/
    * reordered token anywhere in the corpus flips the hash. */
  def textBpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val (merges, vocab) = bpeTable(s, d)
    graft.functions.BpeExpressions.register(s)
    val m = typedLit(merges)
    val v = typedLit(vocab)
    val enc = graft.functions.BpeExpressions.bpe_encode(col("text"), m, v)
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select((graft.functions.BpeExpressions.bpe_decode(enc, v)
        === col("text")).as("exact"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"))
      .filter(col("n_docs") > 0) // zero-row corpus: zero audit rows
  }

  /** Memoized BYTE-level merge table per corpus — trained on the same
    * bounded deterministic sample as [[bpeTable]], but at the
    * production granularity (UTF-8 bytes, GPT-2/tiktoken shape): the
    * base alphabet is ALL 256 bytes implicitly, so no corpus alphabet
    * pass is needed and NOTHING is ever out-of-vocab. */
  private val bpeByteCache =
    new graft.CacheRegistry.VersionedMemo[Seq[Long]]()
  private[operators] def bpeByteTable(s: SparkSession, d: String): Seq[Long] =
    bpeByteCache.getOrBuild(s, s"$d/documents.parquet") {
      val sample = Tables.documents(s, d).filter(col("text").isNotNull)
        .orderBy(col("doc_id")).limit(256)
        .select(substring(col("text"), 1, 1024).as("t"))
        .collect().map(_.getString(0)).toSeq
      graft.functions.BpeByteCodec.train(sample, 64)
    }

  /** BYTE-level BPE token ids per document — the production-tokenizer
    * granularity next to [[textTokenIds]]'s code-point variant: base
    * ids 0..255 are the UTF-8 bytes, merge rank r mints id 256+r, so
    * every document is in-vocab by construction. Rows-only declared
    * (no SQL engine replays an iterative merge); correctness rides the
    * oracle-green `text_bpe_bytes_roundtrip` twin. Same plan shape as
    * the code-point encoder: one scan, the codegen expression in the
    * projection, zero joins. */
  def textTokenIdsBytes(s: SparkSession, d: String): DataFrame = {
    val merges = bpeByteTable(s, d)
    graft.functions.BpeExpressions.register(s)
    val m = typedLit(merges)
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.BpeExpressions.bpe_encode_bytes(col("text"), m)
          .as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
        concat_ws(",",
          expr("transform(slice(ids, 1, 8), x -> CAST(x AS STRING))"))
          .as("head_ids"))
      .orderBy(col("doc_id"))
  }

  /** The byte-level encoder's identity audit, oracle-green:
    * decode(encode(x)) must equal x for EVERY document — at byte
    * granularity this holds UNCONDITIONALLY (all 256 bytes are base
    * tokens), so `n_exact` = `n_docs` with no alphabet-coverage
    * caveat; any merge-loop or expansion bug flips the hash. */
  def textBpeBytesRoundtrip(s: SparkSession, d: String): DataFrame = {
    val merges = bpeByteTable(s, d)
    graft.functions.BpeExpressions.register(s)
    val m = typedLit(merges)
    val enc = graft.functions.BpeExpressions.bpe_encode_bytes(col("text"), m)
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select((graft.functions.BpeExpressions.bpe_decode_bytes(enc, m)
        === col("text")).as("exact"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"))
      .filter(col("n_docs") > 0) // zero-row corpus: zero audit rows
  }

  /** Laplace-smoothed bigram language model — the top-50 adjacent token
    * pairs with their add-one conditional probability
    * `p(w2|w1) = (c(w1w2)+1) / (c(w1·)+V)`, the estimator a classic
    * n-gram LM trains and a data-quality pass uses to spot boilerplate
    * (high-probability chains) vs noise (uniformly improbable ones).
    * `c(w1·)` is the context total (occurrences of `w1` with a
    * successor), `V` the corpus-wide distinct-token vocabulary; the
    * probability is exact integer micro-units — no float division.
    *
    * Shape: one posexplode, bigrams via a per-document lead window
    * (position sort is per-doc and parallel; never a corpus sort), ONE
    * partial-aggregated (w1,w2) count shuffle bounded by the bigram
    * vocabulary, context totals derived from that same tiny relation,
    * the scalar V broadcast, and TakeOrderedAndProject for the top-50. */
  def textBigramLm(s: SparkSession, d: String): DataFrame = {
    val ex = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "w")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val bi = ex.withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .groupBy(col("w").as("w1"), col("w2"))
      .agg(count(lit(1)).as("n_bigram"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_context"))
    val vocab = ex.agg(countDistinct(col("w")).as("v"))
    bi.join(ctx, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), col("n_bigram"), col("n_context"),
        expr("((n_bigram + 1) * 1000000) div (n_context + v)")
          .as("p_laplace_micro"))
      .orderBy(col("n_bigram").desc, col("w1"), col("w2")).limit(50)
  }

  /** Per-document TF-IDF keyword extraction: the top-3 terms of every
    * document by `tf · ln(N/df)` — the classic summarizer/tagger
    * primitive. Scores follow the BM25 fixed-point convention (the ONE
    * float log rounded to micro-units per (doc, term) before any
    * comparison), ranking ties broken by term.
    *
    * Shape: one token explode → (doc, term, tf) partial-agg shuffle
    * (postings volume); df/N derive from that same relation (tiny term
    * table joins KEYED — the vocabulary is corpus-sized at 100 TB, never
    * broadcast); the top-3 is a rank-limited window per doc
    * (WindowGroupLimit — each doc buffers 3 rows, no global sort). */
  def textTfidfKeywords(s: SparkSession, d: String): DataFrame = {
    val postings = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = Tables.documents(s, d).filter(col("text").isNotNull)
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    postings.join(dfT, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") /
          col("df").cast("double")) * lit(1e6), 0).cast("long")
          .as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3 && col("score_micro") > 0)
      .select(col("doc_id"), col("rank"), col("term"), col("score_micro"))
      .orderBy(col("doc_id"), col("rank"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf_keywords" -> textTfidfKeywords,
    "text_bigram_lm" -> textBigramLm,
    "text_chunk_windows" -> textChunkWindows,
    "text_bpe_pairs" -> textBpePairs,
    "text_token_ids" -> textTokenIds,
    "text_bpe_roundtrip" -> textBpeRoundtrip,
    "text_token_ids_bytes" -> textTokenIdsBytes,
    "text_bpe_bytes_roundtrip" -> textBpeBytesRoundtrip,
    "text_source_divergence" -> textSourceDivergence,
    "text_cms_heavyhitters" -> textCmsHeavyHitters,
    "text_cms_production" -> textCmsProduction,
    "text_cms_recall" -> textCmsRecall,
    "text_normalize" -> textNormalize,
    "text_entropy" -> textEntropy,
    "text_perplexity" -> textPerplexity,
    "text_quality_model" -> textQualityModel,
    "text_sample_stratified" -> textSampleStratified,
    "text_token_budget" -> textTokenBudget,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangId,
    "text_fingerprint" -> textFingerprint,
    "text_rolling_hash" -> textRollingHash,
    "text_pii_redact" -> textPiiRedact,
    "text_html_strip" -> textHtmlStrip,
    "text_vocab_topk" -> textVocabTopK,
    "text_zipf_fit" -> textZipfFit,
    "text_quality_filter" -> textQualityFilter,
  )

  private def sqlHits(stops: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${stops.map(w => s"'$w'").mkString(", ")})))"

  override val oracle: Map[String, String] = Map(
    "text_tfidf_keywords" ->
      """WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM p GROUP BY 1, 2),
        |dfT AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
        |  WHERE text IS NOT NULL),
        |sc AS (SELECT tf.doc_id, tf.term,
        |    CAST(round(tf.tf * ln(CAST(n.n_docs AS DOUBLE)
        |      / CAST(dfT.df AS DOUBLE)) * 1e6) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfT USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score_micro,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_micro DESC, term) AS rank
        |  FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_micro
        |FROM r WHERE rank <= 3 AND score_micro > 0
        |ORDER BY doc_id, rank""".stripMargin,
    "text_bigram_lm" ->
      """WITH ex AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    generate_subscripts(string_split(text, ' '), 1) AS p
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id
        |    ORDER BY p) AS w2 FROM ex),
        |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_bigram
        |  FROM b WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_context
        |  FROM bi GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM ex)
        |SELECT bi.w1, bi.w2, bi.n_bigram, ctx.n_context,
        |  CAST(((bi.n_bigram + 1) * 1000000) // (ctx.n_context + v.v)
        |    AS BIGINT) AS p_laplace_micro
        |FROM bi JOIN ctx USING (w1) CROSS JOIN v
        |ORDER BY bi.n_bigram DESC, bi.w1, bi.w2 LIMIT 50""".stripMargin,
    "text_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
         |  WHERE text IS NOT NULL AND length(text) > 0),
         |c AS (SELECT doc_id, i // $ChunkS AS chunk_idx,
         |  tk[i + 1 : i + $ChunkW] AS chunk
         |  FROM t, unnest(generate_series(0, len(tk) - 1, $ChunkS)) AS u(i))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(len(chunk) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(chunk, ' ')) AS fingerprint
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // encode∘decode identity in closed form: exact iff every doc
    // round-trips (the vocab covers the corpus alphabet by
    // construction, so both counts are the non-null doc count)
    "text_bpe_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_exact
        |FROM documents WHERE text IS NOT NULL
        |HAVING count(*) > 0""".stripMargin,
    // the byte-level identity holds UNCONDITIONALLY (all 256 bytes
    // are base tokens) — same closed form
    "text_bpe_bytes_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_exact
        |FROM documents WHERE text IS NOT NULL
        |HAVING count(*) > 0""".stripMargin,
    "text_bpe_pairs" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |pr AS (SELECT t[i : i + 1] AS pair FROM tok,
        |  unnest(generate_series(1, length(t) - 1)) AS u(i)
        |  WHERE length(t) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pr
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "text_source_divergence" ->
      """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE source IS NOT NULL),
        |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY source, token),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source),
        |voc AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
        |vt AS (SELECT DISTINCT token FROM c),
        |pairs AS (SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |  FROM tot a, tot b WHERE a.source <> b.source),
        |terms AS (SELECT p.s1, p.s2, p.n1, p.n2, voc.v,
        |    coalesce(c1.c, 0) AS c1, coalesce(c2.c, 0) AS c2
        |  FROM vt CROSS JOIN pairs p CROSS JOIN voc
        |  LEFT JOIN c c1 ON c1.source = p.s1 AND c1.token = vt.token
        |  LEFT JOIN c c2 ON c2.source = p.s2 AND c2.token = vt.token)
        |SELECT s1, s2, n1, n2, v,
        |  CAST(sum(CAST(round(((c1 + 1) / CAST(n1 + v AS DOUBLE))
        |    * ln(((c1 + 1) / CAST(n1 + v AS DOUBLE))
        |         / ((c2 + 1) / CAST(n2 + v AS DOUBLE)))
        |    * 1000000000.0) AS BIGINT)) AS BIGINT) AS kl_nano
        |FROM terms GROUP BY s1, s2, n1, n2, v ORDER BY s1, s2""".stripMargin,
    "text_normalize" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 3000000000000 AS doc_id,
        |    text || ' cafe' || chr(769) AS text
        |  FROM documents WHERE doc_id % 103 = 0 AND text IS NOT NULL),
        |n AS (SELECT doc_id, text,
        |    trim(regexp_replace(lower(nfc_normalize(text)),
        |      '[ \t\n\r]+', ' ', 'g')) AS norm
        |  FROM docs)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(norm) AS BIGINT) AS n_chars_norm,
        |  (norm <> text) AS changed, md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    // the production CMS estimates are xxhash64-family-dependent (not
    // replayable in DuckDB), so the oracle checks the AUDIT: every
    // top-50 estimate obeys the one-sided error and the 8x collision
    // bound (expected counts are the top size itself), and the exact
    // top-50 mass matches the recomputed truth
    "text_cms_recall" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |top AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact
        |        FROM t GROUP BY token ORDER BY n_exact DESC, token LIMIT 50)
        |SELECT CAST(count(*) AS BIGINT) AS n_top,
        |       CAST(count(*) AS BIGINT) AS n_lb_ok,
        |       CAST(count(*) AS BIGINT) AS n_ub_ok,
        |       CAST(sum(n_exact) AS BIGINT) AS exact_top_mass
        |FROM top HAVING count(*) > 0""".stripMargin,
    "text_cms_heavyhitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |r AS (SELECT unnest(range(0, 4)) AS r),
        |cells AS (
        |  SELECT r.r,
        |    CAST(('0x' || substring(md5(t.token),
        |      1 + 8 * CAST(r.r AS INT), 8)) AS BIGINT) % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cell
        |  FROM t, r GROUP BY 1, 2),
        |top AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact
        |        FROM t GROUP BY token ORDER BY n_exact DESC, token LIMIT 50),
        |probe AS (
        |  SELECT top.token, top.n_exact, r.r,
        |    CAST(('0x' || substring(md5(top.token),
        |      1 + 8 * CAST(r.r AS INT), 8)) AS BIGINT) % 1024 AS bucket
        |  FROM top, r)
        |SELECT p.token, p.n_exact, CAST(min(c.cell) AS BIGINT) AS n_cms
        |FROM probe p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
        |GROUP BY p.token, p.n_exact
        |ORDER BY n_exact DESC, token""".stripMargin,
    "text_perplexity" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |big AS (SELECT doc_id, tk[i] AS l, tk[i] || ' ' || tk[i+1] AS bg
        |  FROM tk, unnest(range(1, len(tk))) AS u(i)),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY bg),
        |c1 AS (SELECT l, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY l),
        |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
        |dbc AS (SELECT doc_id, bg, l, CAST(count(*) AS BIGINT) AS n
        |  FROM big GROUP BY doc_id, bg, l),
        |terms AS (SELECT doc_id, n,
        |  CAST(round((ln(c2.c2 + 1) - ln(c1.c1 + v.v)) * 1000000.0) AS BIGINT) AS t
        |  FROM dbc JOIN c2 USING(bg) JOIN c1 USING(l) CROSS JOIN v)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        | CAST(-sum(n * t) AS BIGINT) AS nll_micro,
        | CAST(round(-sum(n * t) / CAST(sum(n) AS DOUBLE)) AS BIGINT) AS nll_per_bigram_micro
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cnt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY doc_id, tok),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CAST(round(c * ln(c) * 1000000.0) AS BIGINT)) AS BIGINT) AS m
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        | CAST(round(ln(n_tokens) * 1000000.0 - m / CAST(n_tokens AS DOUBLE))
        |   AS BIGINT) AS entropy_micro
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_quality_model" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(tok, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS ph FROM tok),
        |w AS (SELECT doc_id, (ph % 64) * 37 % 101 - 50 AS wt FROM h),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(wt) AS BIGINT) AS z_sum FROM w GROUP BY doc_id)
        |SELECT doc_id, n_tokens, z_sum,
        | CAST(round(z_sum * 10000.0 / n_tokens) AS BIGINT) AS z_micro,
        | z_sum > 0 AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_sample_stratified" ->
      """WITH g AS (SELECT doc_id, lang,
        |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS h,
        |  (CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 10 ELSE 50 END) AS rate
        |  FROM documents)
        |SELECT lang, count(*) AS n_total,
        | CAST(sum(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | min(CASE WHEN h < rate THEN doc_id END) AS first_kept
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(string_split(text, ' ')) AS nt FROM documents),
        |c AS (SELECT source, doc_id, nt,
        |  CAST(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t)
        |SELECT source, count(*) AS n_docs, max(cum) AS tokens_used
        |FROM c WHERE cum <= 400 GROUP BY source ORDER BY source""".stripMargin,
    // the SAME planted page wrapper, the SAME three-stage regex pipe
    // (script/style with contents, remaining tags, whitespace collapse),
    // g-flagged since DuckDB's regexp_replace is first-match by default;
    // the clean md5 proves byte-exact extraction
    "text_html_strip" ->
      """WITH p AS (SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><script>var nav = 1;</script><style>p{color:red}' ||
        |    '</style></head><body><div class="nav">Home | About | Login' ||
        |    '</div><p>' || text ||
        |    '</p><footer>(c) 2024 example.org</footer></body></html>'
        |      AS page
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, CAST(strlen(page) AS BIGINT) AS n_bytes_raw,
        |    trim(regexp_replace(regexp_replace(regexp_replace(page,
        |      '<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM p)
        |SELECT doc_id, n_bytes_raw,
        |  CAST(strlen(clean) AS BIGINT) AS n_bytes_clean,
        |  md5(clean) AS clean_md5,
        |  CAST((n_bytes_raw - strlen(clean)) * 10000 // n_bytes_raw
        |    AS BIGINT) AS boiler_bp
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id, text ||
         |  (CASE WHEN doc_id % 3 = 0
         |    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |    ELSE '' END) ||
         |  (CASE WHEN doc_id % 5 = 0
         |    THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
         |    ELSE '' END) AS aug
         |  FROM documents)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(aug, '$emailPat')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(aug, '$ipPat')) AS BIGINT) AS n_ips,
         | md5(regexp_replace(regexp_replace(aug, '$emailPat', '<EMAIL>', 'g'),
         |   '$ipPat', '<IP>', 'g')) AS redacted_md5
         |FROM aug ORDER BY doc_id""".stripMargin,
    "text_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
        |SELECT token, n FROM c ORDER BY n DESC, token LIMIT 50""".stripMargin,
    // identical rank/count derivation and OLS expression tree, ln only
    // at the end, 4 dp
    "text_zipf_fit" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM t
        |  WHERE token <> '' GROUP BY token),
        |top AS (SELECT n, CAST(row_number() OVER (ORDER BY n DESC, token)
        |    AS BIGINT) AS r
        |  FROM c ORDER BY n DESC, token LIMIT 100),
        |xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
        |  FROM top),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM xy)
        |SELECT k AS n_vocab,
        |  CASE WHEN (CAST(k AS DOUBLE) * sxx - sx * sx) > 0
        |    THEN round((CAST(k AS DOUBLE) * sxy - sx * sy) /
        |      (CAST(k AS DOUBLE) * sxx - sx * sx), 4) END AS zipf_slope_4,
        |  CASE WHEN (CAST(k AS DOUBLE) * sxx - sx * sx) > 0
        |    THEN round((sy - (CAST(k AS DOUBLE) * sxy - sx * sy) /
        |      (CAST(k AS DOUBLE) * sxx - sx * sx) * sx) / CAST(k AS DOUBLE), 4)
        |    END AS zipf_icept_4
        |FROM m WHERE k > 0""".stripMargin,
    "text_quality_filter" ->
      """WITH q AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS nt,
        |  len(list_distinct(string_split(text, ' '))) AS nu,
        |  length(text) AS nc,
        |  len(list_filter(string_split(text, ' '),
        |    t -> regexp_matches(t, '^[0-9]+$'))) AS nnum
        |  FROM documents)
        |SELECT doc_id,
        | (nt >= 5 AND nt <= 10000) AS ok_len,
        | (CAST(nc - (nt - 1) AS DOUBLE) / nt >= 2.0 AND
        |  CAST(nc - (nt - 1) AS DOUBLE) / nt <= 12.0) AS ok_tok_len,
        | (CAST(nu AS DOUBLE) / nt > 0.2) AS ok_uniq,
        | (CAST(nnum AS DOUBLE) / nt < 0.5) AS ok_numeric,
        | ((nt >= 5 AND nt <= 10000) AND
        |  (CAST(nc - (nt - 1) AS DOUBLE) / nt >= 2.0 AND
        |   CAST(nc - (nt - 1) AS DOUBLE) / nt <= 12.0) AND
        |  (CAST(nu AS DOUBLE) / nt > 0.2) AND
        |  (CAST(nnum AS DOUBLE) / nt < 0.5)) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        | length(text) AS n_chars_calc,
        | CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(list_distinct(string_split(text, ' '))) AS n_uniq,
        | round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |       / len(string_split(text, ' ')), 4) AS uniq_ratio,
        | round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |       / len(string_split(text, ' ')), 4) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang AS tagged_lang,
         | ${sqlHits(enStops)} AS s_en, ${sqlHits(esStops)} AS s_es,
         | ${sqlHits(deStops)} AS s_de, ${sqlHits(frStops)} AS s_fr,
         | CASE
         |  WHEN ${sqlHits(enStops)} >= ${sqlHits(esStops)} AND ${sqlHits(enStops)} >= ${sqlHits(deStops)} AND ${sqlHits(enStops)} >= ${sqlHits(frStops)} THEN 'en'
         |  WHEN ${sqlHits(esStops)} >= ${sqlHits(deStops)} AND ${sqlHits(esStops)} >= ${sqlHits(frStops)} THEN 'es'
         |  WHEN ${sqlHits(deStops)} >= ${sqlHits(frStops)} THEN 'de'
         |  ELSE 'fr' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(1125899906842597 AS BIGINT),
        |     list_transform(string_split(text, ' '),
        |       t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT))),
        |   (acc, c) -> (acc * 31 + c) % 144115188075855859) AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
