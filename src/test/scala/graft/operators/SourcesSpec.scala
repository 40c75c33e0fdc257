package graft.operators

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

/** Source/sink connector coverage: the reference reads/writes only
  * line-text directories (SURVEY.md §2.3 "scans/sources/sinks"); the new
  * engine inherits Spark's format matrix. Round-trips the `documents`
  * table through each format and checks exact equality.
  */
class SourcesSpec extends GraftSpec {

  private def roundTrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val src = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$fmt-").toString + "/out"
    src.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts).format(fmt)
      .schema(src.schema) // stable schema: no inference drift
      .load(dir)
    val a = src.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b, s"$fmt round-trip mismatch")
  }

  test("csv round-trip")  { roundTrip("csv", Map("header" -> "true", "quote" -> "\"", "escape" -> "\"")) }
  test("json round-trip") { roundTrip("json") }
  test("orc round-trip")  { roundTrip("orc") }
  test("parquet round-trip") { roundTrip("parquet") }

  test("text source + sink (reference's native format)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-").toString + "/out"
    Tables.documents(spark, sfDir).select(col("text")).write.text(dir)
    val back = spark.read.text(dir)
    assert(back.count() == Tables.documents(spark, sfDir).count())
  }

  test("parquet schema evolution: mergeSchema unions columns across generations") {
    // generation 1 writes (doc_id, text); generation 2 adds a `score`
    // column — the append-only evolution every long-lived lake table
    // goes through. mergeSchema must union the schemas and null-fill the
    // column where a file generation lacks it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve-").toString + "/out"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(dir)
    Seq((3L, "gamma", 0.75)).toDF("doc_id", "text", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "score", "text"))
    val rows = merged.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("text")),
        if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getDouble(r.fieldIndex("score")))))
    assert(rows.toSeq === Seq((1L, "alpha", None), (2L, "beta", None),
      (3L, "gamma", Some(0.75))))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part-").toString + "/out"
    Tables.documents(spark, sfDir).write.partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    // partition pruning: the filter appears as a PartitionFilter on the
    // scan (inputFiles reflects the unpruned relation, so look at the plan)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan.take(800))
    assert(one.count() ==
      Tables.documents(spark, sfDir).filter(col("lang") === "en").count())
  }
}
