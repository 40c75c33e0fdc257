package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack's queries + DuckDB oracle SQL. Each pack
  * covers one slice of SURVEY.md §2's inventory:
  *  - [[operators.Relational]]  — scans/filters/joins/aggs/windows/sorts/setops/functions
  *  - [[operators.TextOps]]     — text analysis over `documents`
  *  - [[operators.DedupOps]]    — exact + near-dup detection
  *  - [[operators.SimilarityOps]] — embedding ANN
  *  - [[operators.MultimodalOps]] — opaque-binary column plumbing
  *  - [[operators.PipeOps]]     — reference-parity exec-pipe MapReduce jobs
  */
object SparkEntry {
  private val packs: Seq[QueryPack] =
    Seq(Relational, AdvancedOps, TextOps, DedupOps, SimilarityOps,
      MultimodalOps, PipeOps, NativeOps, CurationOps, SearchOps,
      LayoutOps, AnalyticsOps, GraphOps, EntityOps, QualityOps,
      graft.streaming.StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
