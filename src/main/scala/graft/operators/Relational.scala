package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface: scans, projections/filters, the join
  * families (broadcast / shuffle / semi / anti / range), hash and
  * sort-based aggregation incl. rollup/cube/distinct, window functions,
  * sorts/limits/top-k, set operations, and scalar function coverage.
  *
  * The reference (`/root/reference`, see SURVEY.md §2.3) has none of these
  * as first-class operators — they live inside user map/reduce executables
  * (e.g. the grep mapper `tests/testdata/exec/grep_map.py:27-28` is a
  * filter; the wc mapper `tests/testdata/exec/wc_map.sh:12` is a
  * projection+explode). Here each category is a declarative Catalyst plan
  * so pushdown/pruning/join-selection are automatic.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`region`, `nation`, filtered `part`) are explicitly
  *    `broadcast()` — no shuffle of the fact side for those.
  *  - fact-fact joins (orders⋈lineitem) are equi-joins on the natural key:
  *    sort-merge with both sides shuffled once on the join key; AQE can
  *    convert to broadcast when a side is small after filtering.
  *  - every aggregate is a partial (map-side) + final hash aggregate —
  *    no driver-side collect anywhere.
  *  - all double-valued outputs are rounded so the DuckDB oracle's
  *    FP-noise stays below the hash-compare resolution.
  */
object Relational extends QueryPack {
  import Tables._

  private def tsLit(s: String): Column = lit(s).cast("timestamp")

  // Q1: TPC-H Q1-shaped pricing summary — wide partial agg, tiny result.
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= tsLit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // Q2: projection + selective filter — both must reach the parquet scan
  // (PushedFilters / pruned ReadSchema).
  def q2FilterPushdown(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("2000-01-01") && col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q3: TPC-H Q3-shaped — dim-filtered customer side joined to fact chain,
  // top-10 by computed revenue (deterministic tiebreak on the key).
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = tsLit("1998-01-01")
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < cut)
    val l = lineitem(s, d).filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // Q4: EXISTS — left-semi join, correlated-predicate shape.
  def q4OrderPrioritySemi(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val l = lineitem(s, d)
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  // Q5: five-way join through the star schema; dims broadcast.
  def q5NationRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = nation(s, d).join(
      broadcast(region(s, d).filter(col("r_name") === "ASIA")),
      col("n_regionkey") === col("r_regionkey"))
    val o = orders(s, d).filter(
      col("o_orderdate") >= tsLit("1996-01-01") && col("o_orderdate") < tsLit("1998-01-01"))
    lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("n_name"))
  }

  // Q6: fully-pushed-down selective scan + single-row agg.
  def q6RevenueFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") && col("l_shipdate") < tsLit("1998-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_rows"))

  // Q7: NOT EXISTS — left-anti join.
  def q7CustomerNoOpenOrders(s: SparkSession, d: String): DataFrame = {
    val open = orders(s, d).filter(col("o_orderstatus") === "O")
    customer(s, d)
      .join(open, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  // Q8: explicit broadcast of the snowflaked dim chain into the fact.
  def q8BroadcastDims(s: SparkSession, d: String): DataFrame = {
    val dim = nation(s, d).join(region(s, d), col("n_regionkey") === col("r_regionkey"))
    customer(s, d)
      .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("c_acctbal")), 6).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // Q9: range (interval) self-join — equi on user_id plus a time band.
  // Equi component keeps it a sort-merge join, never a cartesian.
  def q9EventRangeJoin(s: SparkSession, d: String): DataFrame = {
    val e1 = events(s, d).select(col("user_id"), col("ts").as("ts1"))
    val e2 = events(s, d).select(col("user_id").as("u2"), col("ts").as("ts2"))
    e1.join(e2, col("user_id") === col("u2")
        && col("ts2") > col("ts1")
        && col("ts2") <= col("ts1") + expr("INTERVAL 60 SECONDS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("pairs_60s"))
      .orderBy(col("user_id"))
  }

  // Q10: global top-k — TakeOrderedAndProject, no full sort at scale.
  def q10TopOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("total"), col("o_orderdate"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .limit(15)

  // Q11: ROLLUP hierarchy totals (NULL group keys coalesced so Spark/DuckDB
  // NULL-ordering differences can't matter).
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  // Q12: CUBE over two order dims.
  def q12Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 6).as("avg_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"), col("avg_price"))
      .orderBy(col("st"), col("pri"))

  // Q13: distinct aggregates (expand-based plan in Spark).
  def q13DistinctAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  // Q14: windowed top-k per group (row_number partition prune).
  def q14TopPartsPerBrand(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("raw_rev"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("raw_rev").desc, col("l_partkey"))
    rev.join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"), round(col("raw_rev"), 4).as("revenue"))
      .orderBy(col("p_brand"), col("rk"))
  }

  // Q15: running total — frame ROWS UNBOUNDED PRECEDING..CURRENT ROW.
  def q15RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("run_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // Q16: lag/lead deltas over an event stream.
  def q16EventDeltas(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
        round(col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)), 2).as("delta"),
        lead(col("event_type"), 1, "none").over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // Q17/Q18: set operations (set semantics, not bag).
  def q17SetIntersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
      .orderBy(col("nationkey"))

  def q18SetExcept(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
      .except(supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct())
      .orderBy(col("nationkey"))

  // Q19: string scalar-function coverage (codegen'd built-ins, no UDFs).
  def q19StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        substring(col("p_name"), 1, 8).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), "A", "@").as("ty"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_type")).as("rev"))
      .orderBy(col("p_partkey"))

  // Q20: date/time scalar functions.
  def q20DateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
      .orderBy(col("o_orderkey"))

  // Q21: math scalar functions — everything cast to double explicitly so
  // Spark (ceil→long) and DuckDB (ceil→double) schemas line up; transcendental
  // results rounded below cross-libm noise.
  def q21MathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("adev"),
        ceil(col("l_quantity") / 3).cast("double").as("c3"),
        floor(col("l_quantity") / 3).cast("double").as("f3"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        round(pow(col("l_tax") + 1, 2), 6).as("p2"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        (col("l_orderkey") % 7).cast("long").as("m7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // Q22: JSON extraction from the events props column.
  def q22JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  // Q23: tumbling-window (1h) aggregation over the event stream — the
  // batch twin of the Structured Streaming window agg in graft.streaming.
  def q23EventsTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"),
        // avg derived from the ROUNDED sum: a raw avg(value) rounded at
        // 6dp can straddle a half-ulp between engines once groups are
        // large enough that summation order shifts the last digit
        // (observed at sf0.1); round(sum,2)/n divides identical doubles
        // in both engines, so the 6dp round is deterministic
        round(round(sum(col("value")), 2) / count(lit(1)), 6).as("avg_value"))
      .orderBy(col("hour"), col("event_type"))

  // Q24: sessionization — 30-min inactivity gap splits sessions. Classic
  // lag→flag→cumulative-sum; integer outputs so the oracle compare is exact.
  def q24Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // gaps compared in exact integer microseconds: seconds-truncation would
    // disagree with the oracle whenever a gap straddles the 30-min boundary.
    val flagged = events(s, d)
      .withColumn("gap", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"))
      .agg(max(col("sess_id")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  // Q25: UNION ALL across heterogeneous sources (bag semantics).
  def q25UnionAll(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(lit("cust").as("kind"), col("c_nationkey").as("nationkey"))
      .unionByName(supplier(s, d).select(lit("supp").as("kind"), col("s_nationkey").as("nationkey")))
      .groupBy(col("kind"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"), col("nationkey"))

  // Q31: array scalar functions over tokenized text.
  def q31ArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        array_contains(col("tk"), "spark").as("has_spark"),
        element_at(col("tk"), 1).as("first_tok"),
        element_at(col("tk"), -1).as("last_tok"),
        element_at(array_sort(col("tk")), 1).as("min_tok"),
        array_join(slice(col("tk"), 1, 3), "_").as("first3"))
      .orderBy(col("doc_id"))

  // Q32: regexp scalar functions (patterns restricted to the syntax subset
  // where Java regex and RE2 agree).
  def q32RegexpFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        col("text").rlike("spark|batch").as("has_kw"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("novowel_len"))
      .orderBy(col("doc_id"))

  // Q33: bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep duplicates).
  def q33BagSetOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nationkey"))
    val su = supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val inter = c.intersectAll(su).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val exc = c.exceptAll(su).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    inter.unionByName(exc).select(col("op"), col("nationkey"), col("n"))
      .orderBy(col("op"), col("nationkey"))
  }

  // Q34: UNPIVOT via the stack() generator (UDTF-shaped: 1 row -> 3 rows).
  def q34Unpivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") < 30)
      .selectExpr("l_orderkey", "l_linenumber",
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice, 'disc', l_discount) AS (metric, v)")
      .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
        round(col("v"), 2).as("val"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  // Q35: intentional cartesian over a tiny dim — the one place a cross
  // join is the right plan (5x5), requested explicitly via crossJoin().
  def q35CrossJoin(s: SparkSession, d: String): DataFrame = {
    val a = region(s, d).select(col("r_name").as("r1"))
    val b = region(s, d).select(col("r_name").as("r2"))
    a.crossJoin(b).orderBy(col("r1"), col("r2"))
  }

  // Q36: boolean aggregates.
  def q36BoolAggs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(expr("bool_and(o_totalprice > 1000)").as("all_big"),
        expr("bool_or(o_totalprice > 400000)").as("any_huge"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  // Q37: argmax/argmin + ordered string aggregation.
  def q37ArgMax(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(expr("max_by(n_name, n_nationkey)").as("last_nation"),
        expr("min_by(n_name, n_nationkey)").as("first_nation"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("all_nations"))
      .orderBy(col("n_regionkey"))

  // Q38: scalar + correlated scalar subqueries through the SQL surface —
  // Catalyst rewrites the uncorrelated one to a single-row broadcast and
  // DECORRELATES the per-customer one into an aggregate + join (no
  // per-row re-execution), which is exactly what survives at scale.
  def q38ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT o.o_orderpriority AS pri, count(*) AS n_above,
        |       round(avg(o.o_totalprice), 2) AS avg_above
        |FROM graft_orders_sq o
        |WHERE o.o_totalprice > (SELECT avg(o_totalprice) FROM graft_orders_sq)
        |  AND o.o_totalprice > (SELECT avg(o2.o_totalprice)
        |                        FROM graft_orders_sq o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o.o_orderpriority
        |ORDER BY pri""".stripMargin)
  }

  /** Time-series resample + forward fill (gap fill): each user's event
    * stream is bucketed to hours, a per-user dense hourly spine is
    * generated with `sequence()` (distributed — one array per user row,
    * exploded; no driver-side calendar loop), observed buckets left-join
    * onto it, and empty buckets carry the last observed hourly average
    * forward via `last(..., ignoreNulls)` over a running frame. The
    * standard resample/`LOCF` shape (pandas `resample().ffill()`,
    * InfluxDB `fill(previous)`) that warehouse pipelines need for
    * equal-spaced model features. One keyed shuffle + one window pass. */
  def q39GapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 10)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"), col("value"))
    val buckets = ev.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_obs"), round(avg(col("value")), 4).as("avg_value"))
    val spine = buckets.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(buckets, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("filled_avg"),
        col("n_obs").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** FULL OUTER join — the one join family the rest of the suite doesn't
    * exercise: per-segment customer counts against a fixed quota table
    * where one quota segment has no customers and two real segments have
    * no quota, so BOTH null-padded sides materialize. Full outer cannot
    * build a broadcast side (every unmatched build row must be emitted,
    * which a replicated build cannot dedup), so Spark correctly plans a
    * shuffle join on the key; `Seq`-key join coalesces like SQL USING. */
  def q40FullOuter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val actual = customer(s, d).groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
    val quota = Seq(("AUTOMOBILE", 120L), ("BUILDING", 150L), ("ORBITAL", 50L))
      .toDF("c_mktsegment", "quota")
    actual.join(quota, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"), col("n_cust"), col("quota"),
        when(col("n_cust").isNull, "quota_only")
          .when(col("quota").isNull, "actual_only")
          .otherwise("both").as("status"))
      .orderBy(col("c_mktsegment"))
  }

  /** The distribution-rank window family the suite didn't yet exercise:
    * ntile (equi-depth bucketing), percent_rank, cume_dist — one keyed
    * window pass with a total order (value, event_id) so ties are
    * deterministic. percent_rank/cume_dist are exact rationals of row
    * counts; rounded at 6dp identically in the oracle. */
  def q41RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(s, d).filter(col("user_id") < 5)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("ntile4", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** MapType + higher-order map functions — the complex-type surface:
    * per-user event-type counts assembled into a MAP (map_from_entries
    * over collected structs), then consumed with map_keys / map_filter /
    * map_values / element access / aggregate. Output is rendered to
    * SORTED strings so the map's nondeterministic iteration order never
    * reaches the result; the oracle computes the same strings
    * relationally (DuckDB string_agg ORDER BY). */
  def q42MapFuncs(s: SparkSession, d: String): DataFrame = {
    val g = Tables.events(s, d).filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
    g.groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
      .select(col("user_id"),
        size(map_keys(col("m"))).cast("long").as("n_types"),
        expr("array_join(transform(array_sort(map_keys(m)), " +
          "k -> concat(k, '=', CAST(m[k] AS STRING))), ',')").as("type_counts"),
        expr("array_join(array_sort(map_keys(map_filter(m, (k, v) -> v >= 25))), ',')")
          .as("heavy_types"),
        expr("aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Salted skew join, oracle-checked: half the event stream is funneled
    * onto ONE hot key, then joined to a small dimension through
    * [[SkewUtils.saltedJoin]] (deterministic row salt × replicated dim).
    * The result must equal the plain relational join — salting spreads
    * the hot key over 8 tasks WITHOUT changing semantics, and the DuckDB
    * oracle (which has no salting) proves it. Values aggregate in exact
    * integer cents so the comparison is FP-noise-free. */
  def q43SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(when(col("user_id") < 50, 0L).otherwise(col("user_id")).as("k"),
        col("value"))
    val dim = ev.select(col("k")).distinct()
      .withColumn("label", concat(lit("seg_"), (col("k") % 7).cast("string")))
    SkewUtils.saltedJoin(ev, dim, "k", 8)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .orderBy(col("label"))
  }

  /** SHUFFLED-HASH join — the third join strategy next to broadcast (q3/
    * q5/q8) and sort-merge (q4/q5): both sides shuffle on the key but the
    * smaller PARTITIONED side builds an in-memory hash table instead of
    * both sides sorting. The right pick when the build side is too big to
    * broadcast yet far smaller than the probe side — it skips both sort
    * passes of SMJ. Forced here via the SHUFFLE_HASH hint on orders
    * (Spark only auto-selects SHJ under size conditions
    * `spark.sql.join.preferSortMergeJoin=false` rarely met at test scale);
    * the hint is the documented production mechanism. */
  def q45ShuffleHashJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_shuffle_hash" -> q45ShuffleHashJoin,
    "q38_scalar_subquery" -> q38ScalarSubquery,
    "q39_gap_fill" -> q39GapFill,
    "q40_full_outer" -> q40FullOuter,
    "q41_rank_family" -> q41RankFamily,
    "q42_map_funcs" -> q42MapFuncs,
    "q43_salted_join" -> q43SaltedJoin,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_filter_pushdown" -> q2FilterPushdown,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q4_order_priority_semi" -> q4OrderPrioritySemi,
    "q5_nation_revenue" -> q5NationRevenue,
    "q6_revenue_filter" -> q6RevenueFilter,
    "q7_customer_anti" -> q7CustomerNoOpenOrders,
    "q8_broadcast_dims" -> q8BroadcastDims,
    "q9_event_range_join" -> q9EventRangeJoin,
    "q10_top_orders" -> q10TopOrders,
    "q11_rollup" -> q11Rollup,
    "q12_cube" -> q12Cube,
    "q13_distinct_agg" -> q13DistinctAgg,
    "q14_top_parts_per_brand" -> q14TopPartsPerBrand,
    "q15_running_total" -> q15RunningTotal,
    "q16_event_deltas" -> q16EventDeltas,
    "q17_set_intersect" -> q17SetIntersect,
    "q18_set_except" -> q18SetExcept,
    "q19_string_funcs" -> q19StringFuncs,
    "q20_date_funcs" -> q20DateFuncs,
    "q21_math_funcs" -> q21MathFuncs,
    "q22_json_extract" -> q22JsonExtract,
    "q23_events_tumbling" -> q23EventsTumbling,
    "q24_sessionize" -> q24Sessionize,
    "q25_union_all" -> q25UnionAll,
    "q31_array_funcs" -> q31ArrayFuncs,
    "q32_regexp_funcs" -> q32RegexpFuncs,
    "q33_bag_setops" -> q33BagSetOps,
    "q34_unpivot" -> q34Unpivot,
    "q35_cross_join" -> q35CrossJoin,
    "q36_bool_aggs" -> q36BoolAggs,
    "q37_argmax" -> q37ArgMax,
  )

  override val oracle: Map[String, String] = Map(
    "q45_shuffle_hash" ->
      """SELECT o.o_orderstatus, count(*) AS n_lines,
        |  round(sum(l.l_extendedprice), 2) AS total_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin,
    "q43_salted_join" ->
      """WITH ev AS (SELECT CASE WHEN user_id < 50 THEN 0 ELSE user_id END AS k,
        |  value FROM events),
        |dim AS (SELECT DISTINCT k FROM ev),
        |dim2 AS (SELECT k, 'seg_' || CAST(k % 7 AS VARCHAR) AS label FROM dim)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM ev JOIN dim2 USING (k) GROUP BY label ORDER BY label""".stripMargin,
    "q42_map_funcs" ->
      """WITH g AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
        | string_agg(event_type || '=' || CAST(n AS VARCHAR), ','
        |   ORDER BY event_type) AS type_counts,
        | COALESCE(string_agg(CASE WHEN n >= 25 THEN event_type END, ','
        |   ORDER BY event_type), '') AS heavy_types,
        | CAST(sum(n) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q41_rank_family" ->
      """SELECT event_id, event_type, value,
        | CAST(ntile(4) OVER w AS BIGINT) AS ntile4,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM events WHERE user_id < 5
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin,
    "q40_full_outer" ->
      """WITH actual AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust
        |  FROM customer GROUP BY 1),
        |quota(c_mktsegment, quota) AS (VALUES
        |  ('AUTOMOBILE', CAST(120 AS BIGINT)), ('BUILDING', CAST(150 AS BIGINT)),
        |  ('ORBITAL', CAST(50 AS BIGINT)))
        |SELECT COALESCE(a.c_mktsegment, q.c_mktsegment) AS c_mktsegment,
        | a.n_cust, q.quota,
        | CASE WHEN a.n_cust IS NULL THEN 'quota_only'
        |      WHEN q.quota IS NULL THEN 'actual_only'
        |      ELSE 'both' END AS status
        |FROM actual a FULL JOIN quota q ON a.c_mktsegment = q.c_mktsegment
        |ORDER BY 1""".stripMargin,
    "q39_gap_fill" ->
      """WITH ev AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  value FROM events WHERE user_id < 10),
        |b AS (SELECT user_id, hour, CAST(count(*) AS BIGINT) AS n_obs,
        |  round(avg(value), 4) AS avg_value FROM ev GROUP BY 1, 2),
        |r AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM b GROUP BY 1),
        |spine AS (SELECT user_id,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM r)
        |SELECT s.user_id, s.hour, COALESCE(b.n_obs, 0) AS n_obs,
        | last_value(b.avg_value IGNORE NULLS) OVER (PARTITION BY s.user_id
        |   ORDER BY s.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg,
        | b.n_obs IS NULL AS is_gap
        |FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.hour = b.hour
        |ORDER BY s.user_id, s.hour""".stripMargin,
    "q38_scalar_subquery" ->
      """SELECT o.o_orderpriority AS pri, count(*) AS n_above,
        |       round(avg(o.o_totalprice), 2) AS avg_above
        |FROM orders o
        |WHERE o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |  AND o.o_totalprice > (SELECT avg(o2.o_totalprice)
        |                        FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o.o_orderpriority
        |ORDER BY pri""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice,2) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q6_revenue_filter" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_customer_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q8_broadcast_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(avg(c_acctbal),6) AS avg_bal
        |FROM customer, nation, region
        |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q9_event_range_join" ->
      """SELECT e1.user_id AS user_id, count(*) AS pairs_60s
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e1
        |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin,
    "q10_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS total, o_orderdate
        |FROM orders ORDER BY total DESC, o_orderkey LIMIT 15""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q12_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pri,
        | count(*) AS n, round(avg(o_totalprice),6) AS avg_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_top_parts_per_brand" ->
      """WITH rev AS (
        |  SELECT l_partkey, sum(l_extendedprice*(1-l_discount)) AS raw_rev
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand, rk, p_partkey, revenue FROM (
        |  SELECT p_brand, p_partkey, round(raw_rev,4) AS revenue,
        |   row_number() OVER (PARTITION BY p_brand ORDER BY raw_rev DESC, l_partkey) AS rk
        |  FROM rev JOIN part ON l_partkey = p_partkey) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q15_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q16_event_deltas" ->
      """SELECT user_id, event_id,
        | round(value - coalesce(lag(value,1) OVER w, 0.0),2) AS delta,
        | coalesce(lead(event_type,1) OVER w, 'none') AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q17_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q18_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q19_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS ub, substring(p_name,1,8) AS prefix,
        | length(p_name) AS name_len, regexp_replace(p_type,'A','@','g') AS ty,
        | concat_ws('-', p_brand, p_type) AS bt, lpad(p_brand,12,'*') AS padded,
        | reverse(p_type) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q20_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
        | CAST(month(o_orderdate) AS INT) AS m,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | date_trunc('month', o_orderdate) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q21_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(abs(l_discount - 0.05),4) AS adev,
        | CAST(ceil(l_quantity/3) AS DOUBLE) AS c3,
        | CAST(floor(l_quantity/3) AS DOUBLE) AS f3,
        | round(sqrt(l_quantity),6) AS sq,
        | round(pow(l_tax+1,2),6) AS p2,
        | round(ln(l_extendedprice),6) AS ln_price,
        | CAST(l_orderkey % 7 AS BIGINT) AS m7
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q22_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q23_events_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, count(*) AS n,
        | round(sum(value),2) AS sum_value,
        | round(round(sum(value),2) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q24_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP),1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |f AS (
        |  SELECT user_id,
        |   sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g)
        |SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q25_union_all" ->
      """SELECT kind, nationkey, count(*) AS n FROM (
        |  SELECT 'cust' AS kind, c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS kind, s_nationkey AS nationkey FROM supplier) u
        |GROUP BY kind, nationkey ORDER BY kind, nationkey""".stripMargin,
    "q31_array_funcs" ->
      """SELECT doc_id, len(string_split(text,' ')) AS n,
        | list_contains(string_split(text,' '), 'spark') AS has_spark,
        | string_split(text,' ')[1] AS first_tok,
        | string_split(text,' ')[-1] AS last_tok,
        | list_sort(string_split(text,' '))[1] AS min_tok,
        | array_to_string(list_slice(string_split(text,' '), 1, 3), '_') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_regexp_funcs" ->
      """SELECT doc_id, regexp_extract(text, '([a-z]+)', 1) AS first_word,
        | regexp_matches(text, 'spark|batch') AS has_kw,
        | length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_bag_setops" ->
      """WITH i AS (
        |  SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY 2),
        |e AS (
        |  SELECT 'except_all' AS op, nationkey, count(*) AS n FROM (
        |    SELECT c_nationkey AS nationkey FROM customer
        |    EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY 2)
        |SELECT op, nationkey, n FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
        |ORDER BY op, nationkey""".stripMargin,
    "q34_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS metric, round(v,2) AS val FROM (
        |  SELECT l_orderkey, l_linenumber, 'qty' AS m, l_quantity AS v
        |  FROM lineitem WHERE l_orderkey < 30
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 30
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'disc', l_discount
        |  FROM lineitem WHERE l_orderkey < 30)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q35_cross_join" ->
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b ORDER BY r1, r2""".stripMargin,
    "q36_bool_aggs" ->
      """SELECT o_orderstatus, bool_and(o_totalprice > 1000) AS all_big,
        | bool_or(o_totalprice > 400000) AS any_huge, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_argmax" ->
      """SELECT n_regionkey, arg_max(n_name, n_nationkey) AS last_nation,
        | arg_min(n_name, n_nationkey) AS first_nation,
        | array_to_string(list_sort(list(n_name)), ',') AS all_nations
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
