package graft.operators

import graft.{GraftSpec, SparkEntry}

/** Smoke + invariant checks for every declared query at sf0.001.
  * Exact value parity vs DuckDB is the driver's gate (graft.Verify);
  * these specs assert structural invariants cheaply per operator.
  */
class OperatorSmokeSpec extends GraftSpec {

  test("every declared query runs and most return rows at sf0.001") {
    // dedup_exact_groups / dedup_embedding_pairs plant deterministic
    // duplicates and must now be NONEMPTY at every scale factor
    val mayBeEmpty = Set("dedup_minhash_pairs",
      "dedup_simhash_pairs", "dedup_ngram_jaccard",
      "mr_grep_pipe")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      withClue(s"$name: ") { assert(mayBeEmpty.contains(name) || n > 0) }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 groups by the 3x2 flag/status domain") {
    val rows = Relational.q1PricingSummary(spark, sfDir).collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val n = rows.map(_.getAs[Long]("count_order")).sum
    assert(n > 1000)
  }

  test("top-k respects k and ordering") {
    val rows = Relational.q10TopOrders(spark, sfDir).collect()
    assert(rows.length == 15)
    val totals = rows.map(_.getAs[Double]("total"))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
  }

  test("rollup emits the grand-total row") {
    val rows = Relational.q11Rollup(spark, sfDir).collect()
    val all = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(all.length == 1)
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(all.head.getAs[Long]("n") == leaves.map(_.getAs[Long]("n")).sum)
  }

  test("sessionize: session and event counts are consistent") {
    val rows = Relational.q24Sessionize(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }
}
