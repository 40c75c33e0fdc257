package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available to any session (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * The same registrations are applied idempotently per-session by
  * [[VectorExpressions.register]] for library callers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(cls: Class[_], name: String, usage: String) =
    // the full (non-deprecated) constructor: usage kept, the doc-site
    // fields (arguments/examples/note/group/since/deprecated/source)
    // empty — "built-in" is the only accepted source label
    new ExpressionInfo(cls.getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSimilarity], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_float_dot"),
      info(classOf[FloatDotProduct], "graft_float_dot",
        "graft_float_dot(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info(classOf[PolyHash], "graft_poly_hash",
        "graft_poly_hash(s) - base-31 code-point polynomial hash mod 1e9+7"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_nearest_centroid"),
      info(classOf[NearestCentroid], "graft_nearest_centroid",
        "graft_nearest_centroid(emb, flat_cents) - max-cosine centroid id"),
      (exprs: Seq[Expression]) => NearestCentroid(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_probe_centroids"),
      info(classOf[ProbeCentroids], "graft_probe_centroids",
        "graft_probe_centroids(emb, flat_cents, k) - top-k centroid ids"),
      (exprs: Seq[Expression]) => ProbeCentroids(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_ngram_distinct_count"),
      info(classOf[NgramDistinctCount], "graft_ngram_distinct_count",
        "graft_ngram_distinct_count(text, n) - number of distinct word n-grams"),
      (exprs: Seq[Expression]) => NgramDistinctCount(exprs(0),
        LitArgs.int("graft_ngram_distinct_count", "n", exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_ngram_rows"),
      info(classOf[NgramRows], "graft_ngram_rows",
        "graft_ngram_rows(text, n) - one row per distinct word n-gram, with the distinct count"),
      (exprs: Seq[Expression]) => NgramRows(exprs(0),
        LitArgs.int("graft_ngram_rows", "n", exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_ngram_windows"),
      info(classOf[NgramWindowRows], "graft_ngram_windows",
        "graft_ngram_windows(text, n) - one row per overlapping word n-window with its position"),
      (exprs: Seq[Expression]) => NgramWindowRows(exprs(0),
        LitArgs.int("graft_ngram_windows", "n", exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("graft_portable_simhash"),
      info(classOf[PortableSimHash], "graft_portable_simhash",
        "graft_portable_simhash(text, sb, p) - fused SB-bit portable SimHash"),
      (exprs: Seq[Expression]) => PortableSimHash(exprs(0),
        LitArgs.int("graft_portable_simhash", "sb", exprs(1)),
        LitArgs.long("graft_portable_simhash", "p", exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("graft_portable_minhash_sig"),
      info(classOf[PortableMinHashSignature], "graft_portable_minhash_sig",
        "graft_portable_minhash_sig(text, kp, p) - fused portable MinHash signature"),
      (exprs: Seq[Expression]) => PortableMinHashSignature(exprs(0),
        LitArgs.int("graft_portable_minhash_sig", "kp", exprs(1)),
        LitArgs.long("graft_portable_minhash_sig", "p", exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info(classOf[SimHash64], "graft_simhash64",
        "graft_simhash64(text) - fused 64-bit SimHash over distinct tokens"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info(classOf[MinHashSignature], "graft_minhash_sig",
        "graft_minhash_sig(text, k) - fused K-column MinHash signature over 3-gram shingles"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0),
        LitArgs.int("graft_minhash_sig", "k", exprs(1)))))
    // the custom whole-operator surface: a conf-loaded session plans
    // AsofJoinPlan nodes without any library-side register() call
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // manifest catalog statistics for SQL-doorway snapshot reads
    e.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.GraftManifestStatsRule)
    // SQL-level lakehouse administration: GRAFT RESTORE / CLONE / VACUUM
    // parse to LeafRunnableCommands; everything else falls through to
    // Spark's parser untouched
    e.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(delegate, Option(session)))
  }
}
