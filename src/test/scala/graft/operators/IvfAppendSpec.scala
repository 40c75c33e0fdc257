package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Incremental IVF append ([[SimilarityOps.IvfIndex.append]] /
  * [[SimilarityOps.appendToIvfIndex]]): O(batch) assignment against the
  * already-trained centroids must serve planted queries exactly as a
  * full rebuild over the union would, and the saved-index append must
  * land as a new snapshot-table version whose loaded search is
  * bit-identical to the in-memory appended index. */
class IvfAppendSpec extends GraftSpec {

  private val Off = 1000000000000L

  private def corpus() = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))
    .filter(col("embedding").isNotNull && size(col("embedding")) === 64)

  private def twins(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id") % 101 === 0 &&
        SimilarityOps.cosine(col("embedding"), col("embedding")).isNotNull)
      .withColumn("vec_id", col("vec_id") + Off)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("append+search equals rebuild-over-union for planted queries") {
    val emb = corpus()
    val batch = twins(emb)
    val nQ = batch.count()
    assert(nQ > 0)
    val baseIdx = SimilarityOps.buildIvfIndex(emb)
    val appended = baseIdx.append(batch)
    val viaAppend = appended.search(col("vec_id") >= Off, 5)
    val rebuilt = SimilarityOps.buildIvfIndex(emb.unionByName(batch))
    val viaRebuild = rebuilt.search(col("vec_id") >= Off, 5)
    def top1(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("rank") === 1).select("q_id", "vec_id", "cos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a1 = top1(viaAppend)
    val r1 = top1(viaRebuild)
    // the retrained-rebuild and the appended index agree on every
    // planted query: the twin's original at cos exactly 1.0
    assert(a1 == r1)
    assert(a1.size.toLong == nQ)
    a1.foreach { case (q, v, c) =>
      assert(v == q - Off, s"query $q retrieved $v, not its original")
      assert(c == 1.0)
    }
    rebuilt.close(); appended.close(); baseIdx.close()
  }

  test("saved-index append: new snapshot version, loaded search bit-identical") {
    val emb = corpus()
    val batch = twins(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp-").toString
    val path = s"$dir/idx"
    val baseIdx = SimilarityOps.buildIvfIndex(emb)
    baseIdx.save(path)
    val v = SimilarityOps.appendToIvfIndex(spark, path, batch)
    assert(v == 2)
    assert(graft.sources.SnapshotTable.versions(spark, s"$path/corpus") == Seq(1, 2))
    // time travel: the pre-append index version holds no twins
    assert(graft.sources.SnapshotTable.readAsOf(spark, s"$path/corpus", 1)
      .filter(col("vec_id") >= Off).count() == 0)
    val appended = baseIdx.append(batch)
    val loaded = SimilarityOps.loadIvfIndex(spark, path)
    val want = rows(appended.search(col("vec_id") >= Off, 5))
    val got = rows(loaded.search(col("vec_id") >= Off, 5))
    assert(got == want, "loaded appended index diverged from in-memory append")
    // a second append keeps versioning (and search keeps working)
    val batch2 = batch.withColumn("vec_id", col("vec_id") + Off)
    assert(SimilarityOps.appendToIvfIndex(spark, path, batch2) == 3)
    val loaded2 = SimilarityOps.loadIvfIndex(spark, path)
    assert(loaded2.search(col("vec_id") >= lit(2L * Off), 5)
      .filter(col("rank") === 1).count() == batch.count())
    loaded2.close(); loaded.close(); appended.close(); baseIdx.close()
  }
}
