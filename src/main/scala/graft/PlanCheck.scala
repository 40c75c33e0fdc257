package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection main: prints `explain(formatted)` excerpts for
  * key queries and greps for the plan traits the 100 TB design requires —
  * filters/projections reaching the parquet scan, dimension joins planned
  * as broadcast, fact joins as sort-merge/shuffled-hash, global top-k as
  * TakeOrderedAndProject, and whole-stage codegen spans. Run:
  *
  *   sbt "runMain graft.PlanCheck /root/testdata/sf0.01"
  */
object PlanCheck {
  private case class Check(query: String, mustContain: Seq[String], mustNot: Seq[String] = Nil)

  private val checks = Seq(
    Check("q2_filter_pushdown",
      mustContain = Seq("PushedFilters: [", "Batched: true")),
    Check("q6_revenue_filter",
      mustContain = Seq("PushedFilters: [IsNotNull(l_shipdate)", "Batched: true")),
    Check("q3_shipping_priority",
      mustContain = Seq("BroadcastHashJoin", "Batched: true")),
    Check("q5_nation_revenue",
      mustContain = Seq("BroadcastHashJoin")),
    Check("q8_broadcast_dims",
      mustContain = Seq("BroadcastHashJoin")),
    Check("q4_order_priority_semi",
      mustContain = Seq("LeftSemi"), mustNot = Seq("CartesianProduct")),
    Check("q7_customer_anti",
      mustContain = Seq("LeftAnti"), mustNot = Seq("CartesianProduct")),
    Check("q9_event_range_join", mustContain = Nil,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("q10_top_orders",
      mustContain = Seq("TakeOrderedAndProject")),
    Check("q1_pricing_summary",
      mustContain = Seq("HashAggregate", "ReadSchema: struct<l_quantity:double")),
    Check("dedup_ngram_jaccard", mustContain = Nil,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("dedup_minhash_pairs", mustContain = Nil,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("dedup_simhash_pairs", mustContain = Nil,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Check("ann_lsh_topk", mustContain = Nil,
      mustNot = Seq("CartesianProduct")),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    checks.foreach { c =>
      val df = SparkEntry.queries(c.query)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val missing = c.mustContain.filterNot(plan.contains)
      val present = c.mustNot.filter(plan.contains)
      if (missing.isEmpty && present.isEmpty) {
        println(s"OK   ${c.query}")
      } else {
        failed += 1
        println(s"FAIL ${c.query} missing=$missing forbidden=$present")
        println(plan.linesIterator.take(40).mkString("\n"))
      }
    }
    println(s"\nplan checks: ${checks.size - failed}/${checks.size} ok")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
