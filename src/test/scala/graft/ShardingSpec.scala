package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation

/** The conditional corpus reshard (Tables.sharded): an under-split scan
  * (the tiny-fixture shape) must be repartitioned so interpreted
  * projections parallelize, while a many-split scan — the production
  * shape — must plan with NO added Exchange.
  */
class ShardingSpec extends GraftSpec {

  private def hasReshard(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: RepartitionOperation => r
    }.nonEmpty

  test("under-split scan is resharded (fixture shape)") {
    val dir = writeDocs(Seq(
      (1L, "a b c", "en", "s", 5L), (2L, "d e f", "en", "s", 5L)))
    val df = Tables.documents(spark, dir)
    assert(df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    assert(hasReshard(Tables.sharded(df, "doc_id")))
  }

  test("many-split scan plans with no added Exchange (production shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-").toString
    Tables.documents(spark, sfDir).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    // tiny files → one scan split per file (openCost-dominated packing)
    assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    val sharded = Tables.sharded(df, "doc_id")
    assert(!hasReshard(sharded))
    assert(!sharded.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("spark.graft.reshard conf overrides the split-count heuristic") {
    val dir = writeDocs(Seq((1L, "a b c", "en", "s", 5L)))
    val df = Tables.documents(spark, dir)
    spark.conf.set("spark.graft.reshard", "never")
    try assert(!hasReshard(Tables.sharded(df, "doc_id")))
    finally spark.conf.unset("spark.graft.reshard")
    spark.conf.set("spark.graft.reshard", "always")
    try assert(hasReshard(Tables.sharded(df, "doc_id")))
    finally spark.conf.unset("spark.graft.reshard")
  }
}
