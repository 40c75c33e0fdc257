package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-contract enforcement — the validation layer a 100 TB platform
  * runs on every ingest (the Great-Expectations/dbt-test shape, as
  * engine-native queries). The reference has no validation surface; its
  * closest analog is the job server rejecting malformed submissions.
  *
  * Both audits are scan-bound:
  *  - [[contractAudit]] folds ALL of a table's rule predicates into ONE
  *    pass (a single aggregate of conditional sums per table — adding a
  *    rule adds a column, not a scan), then unpivots to one row per rule.
  *  - [[refIntegrity]] counts orphaned foreign keys with LEFT ANTI
  *    equi-joins — keyed shuffles, never broadcast-forced (a dimension
  *    side may be O(corpus) at scale), never quadratic.
  */
object QualityOps extends QueryPack {

  /** Rule-by-rule violation counts. Each rule is
    * `(table, rule_name, violation predicate SQL)` evaluated in its
    * table's single aggregate pass; `n_rows` carries the denominator. */
  def contractAudit(s: SparkSession, d: String): DataFrame = {
    val docRules = Seq(
      ("text_not_null", "text IS NULL"),
      ("n_chars_matches_text", "text IS NOT NULL AND n_chars <> length(text)"),
      ("lang_known", "lang IS NULL OR lang NOT IN ('en', 'es', 'de', 'fr')"),
      ("doc_id_positive", "doc_id IS NULL OR doc_id < 0"))
    val evRules = Seq(
      ("ts_in_range",
        "ts IS NULL OR ts < TIMESTAMP '2020-01-01 00:00:00' " +
          "OR ts >= TIMESTAMP '2030-01-01 00:00:00'"),
      ("value_finite", "value IS NULL OR isnan(value) OR abs(value) = " +
        "CAST('Infinity' AS DOUBLE)"),
      ("event_type_nonempty", "event_type IS NULL OR event_type = ''"))
    def audit(table: String, df: DataFrame, rules: Seq[(String, String)]) = {
      val sums = rules.map { case (n, p) =>
        sum(expr(s"CASE WHEN $p THEN 1 ELSE 0 END")).cast("long").as(n)
      } :+ count(lit(1)).as("__n")
      val stack = rules.map { case (n, _) => s"'$n', $n" }
        .mkString(s"stack(${rules.size}, ", ", ", ") AS (rule, n_violations)")
      df.agg(sums.head, sums.tail: _*)
        .selectExpr(s"'$table' AS table_name", stack, "__n AS n_rows")
    }
    audit("documents", Tables.documents(s, d), docRules)
      .unionByName(audit("events", Tables.events(s, d), evRules))
      .filter(col("n_rows") > 0) // zero-row corpus: nothing to audit
      .orderBy(col("table_name"), col("rule"))
  }

  /** Orphaned-foreign-key counts for the star schema's edges. */
  def refIntegrity(s: SparkSession, d: String): DataFrame = {
    def orphans(fk: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val o = child.select(col(key).as("k")).filter(col("k").isNotNull)
        .join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(o))
        .select(lit(fk).as("fk"), coalesce(col("n_orphans"), lit(0L)).as("n_orphans"),
          col("n_rows"))
    }
    orphans("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
      .unionByName(orphans("lineitem.l_partkey->part", Tables.lineitem(s, d),
        "l_partkey", Tables.part(s, d), "p_partkey"))
      .unionByName(orphans("lineitem.l_suppkey->supplier", Tables.lineitem(s, d),
        "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
      .unionByName(orphans("orders.o_custkey->customer", Tables.orders(s, d),
        "o_custkey", Tables.customer(s, d), "c_custkey"))
      .filter(col("n_rows") > 0)
      .orderBy(col("fk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_contract_audit" -> contractAudit,
    "quality_ref_integrity" -> refIntegrity,
  )

  def oracle: Map[String, String] = Map(
    "quality_contract_audit" ->
      """WITH doc AS (
        |  SELECT 'documents' AS table_name, rule, n_violations,
        |    CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows
        |  FROM (
        |    SELECT 'text_not_null' AS rule, CAST(sum(CASE WHEN text IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM documents
        |    UNION ALL
        |    SELECT 'n_chars_matches_text', CAST(sum(CASE WHEN text IS NOT NULL
        |      AND n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
        |      FROM documents
        |    UNION ALL
        |    SELECT 'lang_known', CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN
        |      ('en', 'es', 'de', 'fr') THEN 1 ELSE 0 END) AS BIGINT)
        |      FROM documents
        |    UNION ALL
        |    SELECT 'doc_id_positive', CAST(sum(CASE WHEN doc_id IS NULL OR
        |      doc_id < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM documents)),
        |ev AS (
        |  SELECT 'events' AS table_name, rule, n_violations,
        |    CAST((SELECT count(*) FROM events) AS BIGINT) AS n_rows
        |  FROM (
        |    SELECT 'ts_in_range' AS rule, CAST(sum(CASE WHEN ts IS NULL OR
        |      CAST(ts AS TIMESTAMP) < TIMESTAMP '2020-01-01 00:00:00' OR
        |      CAST(ts AS TIMESTAMP) >= TIMESTAMP '2030-01-01 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM events
        |    UNION ALL
        |    SELECT 'value_finite', CAST(sum(CASE WHEN value IS NULL OR
        |      NOT isfinite(value) THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |    UNION ALL
        |    SELECT 'event_type_nonempty', CAST(sum(CASE WHEN event_type IS NULL
        |      OR event_type = '' THEN 1 ELSE 0 END) AS BIGINT) FROM events))
        |SELECT table_name, rule, n_violations, n_rows
        |FROM (SELECT * FROM doc UNION ALL SELECT * FROM ev)
        |WHERE n_rows > 0
        |ORDER BY table_name, rule""".stripMargin,
    "quality_ref_integrity" ->
      """SELECT fk, n_orphans, n_rows FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS fk,
        |    CAST((SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        |      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |      AS BIGINT) AS n_orphans,
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |    CAST((SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL
        |      AND l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT),
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    CAST((SELECT count(*) FROM lineitem WHERE l_suppkey IS NOT NULL
        |      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) AS BIGINT),
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    CAST((SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
        |      AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
        |    CAST((SELECT count(*) FROM orders) AS BIGINT))
        |WHERE n_rows > 0 ORDER BY fk""".stripMargin,
  )
}
