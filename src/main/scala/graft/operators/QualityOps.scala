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

  /** Cross-table AGGREGATE reconciliation — the TPC-H consistency
    * check: recompute each order's total from its lines
    * (`Σ round(extprice·(1−disc)·(1+tax)·100)` — per-line cent rounding,
    * the fixed-point convention) and reconcile against the order
    * header's `o_totalprice`, reported per order status as exact-match /
    * within-a-dollar / lineless counts plus the worst absolute
    * deviation. FK audits catch missing rows; THIS catches rows that
    * exist but disagree.
    *
    * Shape: one keyed per-order aggregate of lineitem + one keyed
    * left join onto orders (both shuffles on the order key, partials
    * map-side) + a |statuses|-row rollup. Nothing broadcast-forced,
    * nothing quadratic. */
  def priceReconcile(s: SparkSession, d: String): DataFrame = {
    val lines = Tables.lineitem(s, d)
      .filter(col("l_orderkey").isNotNull && col("l_extendedprice").isNotNull &&
        col("l_discount").isNotNull && col("l_tax").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * " +
        "(1 + l_tax) * 100) AS BIGINT)")).as("recomputed_cents"),
        count(lit(1)).as("n_lines"))
    Tables.orders(s, d)
      .filter(col("o_orderkey").isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("header_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("recomputed_cents").isNull, 1L).otherwise(0L))
          .as("n_lineless"),
        sum(when(col("header_cents") === col("recomputed_cents"), 1L)
          .otherwise(0L)).as("n_exact"),
        sum(when(abs(col("header_cents") - col("recomputed_cents")) <= 100, 1L)
          .otherwise(0L)).as("n_within_dollar"),
        max(abs(col("header_cents") - col("recomputed_cents")))
          .as("max_abs_dev_cents"))
      .orderBy(col("o_orderstatus"))
  }

  /** Distribution drift between two corpus epochs — the population
    * stability index (PSI) every production data platform monitors:
    * split the events feed at its calendar midpoint (exact integer
    * day arithmetic, derived identically in both engines), compare
    * each event type's share of epoch A vs epoch B, and report the
    * type's PSI term `(p_B − p_A) · ln(p_B / p_A)`. Types absent from
    * either epoch are excluded (the standard smoothing-free
    * formulation); the NULL type is a first-class group.
    *
    * Shape: ONE scan → one partial-aggregated groupBy(type) with
    * conditional epoch sums → a broadcast 1-row totals join — two tiny
    * jobs regardless of corpus size, the drift monitor you can afford
    * to run on every ingest at 100 TB. */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"))
    val bounds = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .head()
    if (bounds.isNullAt(0))
      return ev.filter(lit(false))
        .select(col("event_type"), lit(0L).as("n_a"), lit(0L).as("n_b"),
          lit(0.0).as("psi_6"))
    val lo = bounds.getDate(0).toLocalDate
    val hi = bounds.getDate(1).toLocalDate
    val mid = lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2)
    val isA = col("day") <= lit(java.sql.Date.valueOf(mid))
    val perType = ev.groupBy(col("event_type")).agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("n_b"))
    val totals = ev.agg(
      sum(when(isA, 1L).otherwise(0L)).as("t_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("t_b"))
    val pA = col("n_a").cast("double") / col("t_a")
    val pB = col("n_b").cast("double") / col("t_b")
    perType.crossJoin(broadcast(totals))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round((pB - pA) * log(pB / pA), 6).as("psi_6"))
      .orderBy(col("event_type"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov test between the click and
    * view value distributions: D = sup|F₁ − F₂| over the empirical
    * CDFs, plus the asymptotic statistic λ = D·√(n₁n₂/(n₁+n₂)) — the
    * distribution-drift test with an actual significance scale, next
    * to the binned PSI monitor.
    *
    * The sup needs GLOBAL cumulative counts in value order — the naive
    * unpartitioned window is a single-task sort. Scale shape instead
    * (the `layout_global_index` pattern): collapse to the distinct-
    * value relation FIRST (one keyed agg), range-partition it, local
    * cumsums per partition, then add broadcast per-partition offsets —
    * every stage is distributed and the offset table is one row per
    * partition. All counts are exact integers; the only floats are the
    * two final divisions, identical in any engine reading the same
    * rows. */
  def qualityKsTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).filter(col("value").isNotNull &&
      col("event_type").isin("click", "view"))
    val pts = ev.groupBy(col("value")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
    // width = max(16, defaultParallelism) — scales with the cluster
    val parted = pts.repartitionByRange(SkewUtils.rankWidth(s), col("value"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val offs = parted.groupBy(col("pid"))
      .agg(sum(col("c1")).as("s1"), sum(col("c2")).as("s2"))
      .withColumn("o1", coalesce(sum(col("s1")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("o2", coalesce(sum(col("s2")).over(
        Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("o1"), col("o2"))
    val w = Window.partitionBy(col("pid")).orderBy(col("value"))
    val cum = parted
      .withColumn("l1", sum(col("c1")).over(w))
      .withColumn("l2", sum(col("c2")).over(w))
      .join(broadcast(offs), "pid")
      .select((col("l1") + col("o1")).as("cum1"),
        (col("l2") + col("o2")).as("cum2"))
    val totals = pts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val dmax = cum.crossJoin(broadcast(totals))
      .select(abs(col("cum1").cast("double") / col("n1") -
        col("cum2").cast("double") / col("n2")).as("dd"))
      .agg(max(col("dd")).as("dm"))
    dmax.crossJoin(broadcast(totals))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("n1"), col("n2"),
        round(col("dm"), 6).as("d_stat"),
        round(col("dm") * sqrt(col("n1").cast("double") * col("n2") /
          (col("n1") + col("n2"))), 4).as("ks_lambda"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_ks_test" -> qualityKsTest,
    "quality_contract_audit" -> contractAudit,
    "quality_ref_integrity" -> refIntegrity,
    "quality_price_reconcile" -> priceReconcile,
    "quality_psi_drift" -> psiDrift,
  )

  def oracle: Map[String, String] = Map(
    // exact integer cumulative counts; the two divisions and the max are
    // deterministic IEEE over identical inputs in both engines
    "quality_ks_test" ->
      """WITH e AS (SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |p AS (SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM e GROUP BY value),
        |c AS (SELECT
        |    sum(c1) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    sum(c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM p),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM p),
        |dm AS (SELECT max(abs(CAST(cum1 AS DOUBLE) / t.n1 -
        |    CAST(cum2 AS DOUBLE) / t.n2)) AS dm FROM c, t)
        |SELECT t.n1, t.n2, round(dm.dm, 6) AS d_stat,
        |  round(dm.dm * sqrt(CAST(t.n1 AS DOUBLE) * t.n2 / (t.n1 + t.n2)), 4)
        |    AS ks_lambda
        |FROM dm, t WHERE t.n1 > 0 AND t.n2 > 0""".stripMargin,
    // epoch split at the calendar midpoint, PSI per surviving type —
    // the same exact integer day arithmetic and 6 dp rounding
    "quality_psi_drift" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT min(day) + CAST(floor(date_diff('day', min(day),
        |         max(day)) / 2) AS INT) AS mid FROM e),
        |t AS (SELECT event_type,
        |    sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN day > mid THEN 1 ELSE 0 END) AS n_b
        |  FROM e, m GROUP BY event_type),
        |tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM t)
        |SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b,
        |  round((n_b / CAST(t_b AS DOUBLE) - n_a / CAST(t_a AS DOUBLE)) *
        |    ln((n_b / CAST(t_b AS DOUBLE)) / (n_a / CAST(t_a AS DOUBLE))), 6)
        |    AS psi_6
        |FROM t, tot WHERE n_a > 0 AND n_b > 0
        |ORDER BY event_type""".stripMargin,
    "quality_price_reconcile" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) *
        |      (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS recomputed_cents,
        |    CAST(count(*) AS BIGINT) AS n_lines
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
        |  GROUP BY l_orderkey),
        |o AS (SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS header_cents
        |  FROM orders WHERE o_orderkey IS NOT NULL)
        |SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN l.recomputed_cents IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_lineless,
        |  CAST(sum(CASE WHEN o.header_cents = l.recomputed_cents
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN abs(o.header_cents - l.recomputed_cents) <= 100
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dollar,
        |  CAST(max(abs(o.header_cents - l.recomputed_cents)) AS BIGINT)
        |    AS max_abs_dev_cents
        |FROM o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin,
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
