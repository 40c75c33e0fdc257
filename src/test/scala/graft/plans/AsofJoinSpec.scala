package graft.plans

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Ground-truth + plan-shape tests for the native as-of join operator
  * (custom LogicalPlan → Strategy → SparkPlan). Cross-checked against the
  * union+window composition on real data; the DuckDB ASOF oracle covers
  * it independently via q26b_asof_native.
  */
class AsofJoinSpec extends GraftSpec {
  import spark.implicits._

  private def trades = Seq(
    // (id, key, time)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 15L), (4L, "c", 5L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (key, time, px)
    ("a", 5L, 1.0), ("a", 10L, 2.0), ("a", 19L, 3.0),
    ("b", 16L, 9.0), // after the only b trade — no match
    ("c", 5L, 7.0)   // exact tie with the c trade — matches (>= semantics)
  ).toDF("q_sym", "q_t", "px")

  test("asof picks latest right row at or before left time, inner semantics") {
    val out = AsofJoin.asof(trades, quotes, "sym", "q_sym", "t", "q_t")
      .select($"trade_id", $"px").as[(Long, Double)].collect().toMap
    // trade 1 (a,10) → quote (a,10) 2.0 (tie inclusive, latest wins)
    // trade 2 (a,20) → quote (a,19) 3.0
    // trade 3 (b,15) → no quote at/before 15 → dropped (inner)
    // trade 4 (c,5)  → quote (c,5) 7.0
    assert(out === Map(1L -> 2.0, 2L -> 3.0, 4L -> 7.0))
  }

  test("key/time names resolve case-insensitively, like Spark's resolver") {
    val out = AsofJoin.asof(trades, quotes, "SYM", "Q_SYM", "T", "Q_T")
      .select($"trade_id", $"px").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 2.0, 2L -> 3.0, 4L -> 7.0))
  }

  test("null times: left nulls drop, right nulls never match or block") {
    val l = Seq((1L, "a", Some(10L)), (2L, "a", None: Option[Long]))
      .toDF("id", "k", "t")
    val r = Seq(("a", None: Option[Long], 0.5), ("a", Some(4L), 1.5))
      .toDF("rk", "rt", "v")
    val out = AsofJoin.asof(l, r, "k", "rk", "t", "rt")
      .select($"id", $"v").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 1.5))
  }

  test("null keys never match (null != null, SQL equi-join semantics)") {
    val l = Seq((1L, Some("a"), 10L), (2L, None: Option[String], 10L))
      .toDF("id", "k", "t")
    val r = Seq((Some("a"), 5L, 1.0), (None: Option[String], 5L, 9.0))
      .toDF("rk", "rt", "v")
    val inner = AsofJoin.asof(l, r, "k", "rk", "t", "rt")
      .select($"id", $"v").as[(Long, Double)].collect().toMap
    assert(inner === Map(1L -> 1.0)) // null-key left row joins nothing
    val outer = AsofJoin.asofOuter(l, r, "k", "rk", "t", "rt")
      .select($"id", $"v".isNull).as[(Long, Boolean)].collect().toMap
    assert(outer === Map(1L -> false, 2L -> true)) // kept, null-padded
  }

  test("outer keeps unmatched left rows with nulls (ASOF LEFT JOIN)") {
    val out = AsofJoin.asofOuter(trades, quotes, "sym", "q_sym", "t", "q_t")
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // trade 3 (b,15) has no quote at/before 15 → kept with null px
    assert(out === Map(1L -> Some(2.0), 2L -> Some(3.0),
      3L -> None, 4L -> Some(7.0)))
  }

  test("clashing right-side names are auto-renamed with _r suffix") {
    val l = Seq((1L, "a", 10L, "L")).toDF("id", "k", "t", "tag")
    val r = Seq(("a", 5L, "R")).toDF("k", "t", "tag")
    val out = AsofJoin.asof(l, r, "k", "k", "t", "t")
    assert(out.columns.toSeq ===
      Seq("id", "k", "t", "tag", "k_r", "t_r", "tag_r"))
    val row = out.collect().head
    assert(row.getAs[String]("tag") === "L" && row.getAs[String]("tag_r") === "R")
  }

  test("mixed-width key types are rejected (int vs bigint would silently never match)") {
    val l = Seq((1, 10L)).toDF("k", "t")           // k: int
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v") // rk: bigint
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("match exactly"))
  }

  test("float/double keys are rejected (-0.0/NaN equality diverges from SQL)") {
    val l = Seq((1.0, 10L)).toDF("k", "t")
    val r = Seq((1.0, 5L, 1.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("non-floating"))
  }

  test("clash rename is case-insensitive (left Tag vs right tag)") {
    val l = Seq((1L, "a", 10L, "L")).toDF("id", "k", "t", "Tag")
    val r = Seq(("a", 5L, "R")).toDF("rk", "rt", "tag")
    val out = AsofJoin.asof(l, r, "k", "rk", "t", "rt")
    assert(out.columns.toSeq === Seq("id", "k", "t", "Tag", "rk", "rt", "tag_r"))
  }

  test("non-atomic key types are rejected at construction") {
    val l = Seq((1L, Array(1, 2), 10L)).toDF("id", "k", "t")
    val r = Seq((Array(1, 2), 5L, 1.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("atomic"))
  }

  test("plan uses the custom AsofJoin exec (strategy engaged)") {
    val df = AsofJoin.asof(trades, quotes, "sym", "q_sym", "t", "q_t")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("AsofJoin"))
    // co-clustered via hash shuffles like a sort-merge join (AQE wraps the
    // executed plan, so count exchanges in the formatted explain)
    assert("hashpartitioning\\(".r.findAllIn(plan).size === 2)
    assert(plan.contains("Sort "))
  }

  test("native result matches the union+window composition on sf0.001") {
    val viaNative = graft.operators.AdvancedOps.q26AsofNative(spark, sfDir).collect()
    val viaWindow = graft.operators.AdvancedOps.q26AsofJoin(spark, sfDir).collect()
    assert(viaNative.length > 0)
    assert(viaNative.map(_.toSeq).toSeq === viaWindow.map(_.toSeq).toSeq)
  }
}
