package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution over a string dictionary — the record-linkage half
  * of data curation: find near-identical name variants (typos, OCR
  * noise, vendor spelling drift) and collapse them to one canonical
  * entity. The reference has no analog (its closest string op is the
  * grep mapper's exact containment); this pack adds the standard
  * dictionary-level fuzzy-match pipeline.
  *
  * 100 TB design — the corpus NEVER self-joins:
  *  1. `distinct()` first: the pair search runs over the VALUE DICTIONARY
  *     (vocabulary-bounded — 64 names here, maybe 10⁷ at web scale), not
  *     the corpus. The corpus is touched by exactly one aggregate.
  *  2. Length-band blocking with one-sided replication: a candidate pair
  *     within edit distance k satisfies |len(a) − len(b)| ≤ k, so banding
  *     names by `len div (k+1)` and replicating ONE side to bands
  *     {b−1, b, b+1} covers every qualifying pair EXACTLY ONCE (the
  *     unreplicated side's band is unique — no post-join dedup) while
  *     the join stays a hash equi-join on the band key. Replication
  *     factor is a constant 3. For 10⁷+-row dictionaries the same
  *     skeleton takes a q-gram or PassJoin segment key instead of the
  *     length band; the join shape is unchanged.
  *  3. Early-abandon distance: Spark's 3-arg `levenshtein(l, r, k)`
  *     bails out of the DP the moment the band minimum exceeds k
  *     (returns −1), so the per-candidate cost is O(k·len), not O(len²).
  *  4. Clustering reuses the large-star/small-star connected-components
  *     core ([[DedupOps.componentsFromEdges]]) — O(log diameter) rounds
  *     over the (tiny) pair graph; canonical = lexicographic-min member,
  *     which needs no id assignment (string ordering IS the tie-break).
  */
object EntityOps extends QueryPack {

  private val K = 2 // edit-distance threshold

  private def dictionary(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(col("p_name").as("name")).distinct()

  /** All unordered dictionary pairs within edit distance [[K]], found by
    * the banded join described in the object doc. Output
    * `(name_a, name_b, dist)`, `name_a < name_b`, ordered. */
  def fuzzyPairs(names: DataFrame): DataFrame = {
    val band = (c: String) => (length(col(c)) / (K + 1)).cast("int")
    val left = names.select(col("name").as("name_a"))
      .withColumn("blk", explode(array(
        band("name_a") - 1, band("name_a"), band("name_a") + 1)))
    val right = names.select(col("name").as("name_b"), band("name_b").as("blk"))
    left.join(right, "blk")
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= K)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), K))
      .filter(col("dist") >= 0) // −1 = early-abandoned (distance > K)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
  }

  def entityFuzzyPairs(s: SparkSession, d: String): DataFrame =
    fuzzyPairs(dictionary(s, d)).orderBy(col("name_a"), col("name_b"))

  /** Canonical entity clusters: connected components over the fuzzy-pair
    * graph, one row per cluster —
    * `(entity, n_members, members)` with `entity` = lexicographic-min
    * member and `members` the comma-joined sorted list. Singletons are
    * their own entity (a dictionary canonicalization must map EVERY
    * value). */
  def entityCanonical(s: SparkSession, d: String): DataFrame = {
    val names = dictionary(s, d)
    val labels = DedupOps.componentsFromEdges(
      names.select(col("name").as("doc_id")),
      fuzzyPairs(names).select(col("name_a").as("a"), col("name_b").as("b")))
    labels.groupBy(col("component").as("entity"))
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("members"))
      .orderBy(col("entity"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "entity_fuzzy_pairs" -> entityFuzzyPairs,
    "entity_canonical" -> entityCanonical,
  )

  def oracle: Map[String, String] = Map(
    // the oracle searches ALL pairs (no blocking) — agreement proves the
    // banded join is lossless, not just self-consistent
    "entity_fuzzy_pairs" ->
      """WITH d AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       levenshtein(a.name, b.name) AS dist
        |FROM d a JOIN d b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    // transitive closure by recursive CTE, component = min reachable name
    "entity_canonical" ->
      """WITH RECURSIVE d AS (SELECT DISTINCT p_name AS name FROM part),
        |p AS (
        |  SELECT a.name AS x, b.name AS y FROM d a JOIN d b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) <= 2),
        |e AS (SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p),
        |reach AS (
        |  SELECT name AS src, name AS dst FROM d
        |  UNION
        |  SELECT r.src, e.y AS dst FROM reach r JOIN e ON r.dst = e.x),
        |lbl AS (SELECT src AS name, min(dst) AS entity FROM reach GROUP BY src)
        |SELECT entity, count(*) AS n_members,
        |       string_agg(name, ',' ORDER BY name) AS members
        |FROM lbl GROUP BY entity
        |ORDER BY entity""".stripMargin,
  )
}
