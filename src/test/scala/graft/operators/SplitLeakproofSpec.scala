package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** [[CurationOps.curationSplitLeakproof]]: content-keyed splits keep
  * exact duplicates together; the id-keyed audit counts the leak. */
class SplitLeakproofSpec extends GraftSpec {

  test("duplicates never straddle under content keying; audit counts id-keyed leaks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sp-").toString
    // 400 distinct docs + one duplicated text planted under MANY ids —
    // with ≥40 ids sharing one text, the id-keyed gate (80/10/10) is
    // overwhelmingly likely to scatter the group across splits, while
    // the content-keyed gate cannot by construction.
    val distinctDocs = (1L to 400L).map(i => (i, s"unique document body $i", 10L + i))
    val dupDocs = (1001L to 1060L).map(i => (i, "the shared duplicated body", 25L))
    (distinctDocs ++ dupDocs)
      .toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = CurationOps.curationSplitLeakproof(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == 460L)
    // every row carries the same global audit pair
    assert(rows.forall(_.getAs[Long]("leaky_groups_content") == 0L))
    assert(rows.forall(_.getAs[Long]("leaky_groups_id") == 1L))
    // the 60 duplicate members all landed in ONE split under content keying
    val dupCounts = rows.map(r =>
      r.getAs[String]("split") -> r.getAs[Long]("n_dup_docs")).toMap
    assert(dupCounts.values.sum == 60L)
    assert(dupCounts.values.count(_ > 0L) == 1)
  }
}
