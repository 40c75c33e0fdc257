package graft.operators

import graft.GraftSpec
import org.apache.spark.sql.functions._

/** Scalar recomputation of the round-8 curation additions: the balanced
  * shard manifest (portable-hash assignment + partitioned-write
  * agreement) and the source-pair KL divergence (per-term fixed-point
  * arithmetic replayed in plain Scala). */
class ShardDivergenceSpec extends GraftSpec {

  private def h32(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("shard manifest matches a scalar replay of every assignment") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 7 == 0) null else s"tok$i word", "en", "web", i * 2))
    val dir = writeDocs(docs)
    val got = CurationOps.curationShardManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = docs.groupBy { case (id, _, _, _, _) => h32(id.toString) % 16 }
      .map { case (sh, ds) =>
        sh -> ((ds.size.toLong, ds.map(_._5).sum,
          ds.map(d => if (d._2 == null) 0L else d._2.split(" ", -1).length.toLong).sum))
      }
    assert(got === want)
    assert(got.keys.forall(sh => sh >= 0 && sh < 16))
  }

  test("partitionBy on the same shard column agrees with the manifest") {
    val dir = writeDocs((1L to 40L).map(i => (i, s"d$i", "en", "web", i)))
    val manifest = CurationOps.curationShardManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    graft.Tables.documents(spark, dir)
      .withColumn("shard",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 16"))
      .write.partitionBy("shard").mode("overwrite").parquet(out)
    // partition discovery re-infers the dir-encoded shard value as int
    val back = spark.read.parquet(out)
      .groupBy(col("shard").cast("long").as("shard")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === manifest)
  }

  test("KL divergence: per-term fixed-point replay on a two-source fixture") {
    val dir = writeDocs(Seq(
      (1L, "x x y", "en", "a", 5L),
      (2L, "x y z", "en", "b", 5L)))
    val got = TextOps.textSourceDivergence(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def term(c1: Long, n1: Long, c2: Long, n2: Long, v: Long): Long = {
      val p = (c1 + 1).toDouble / (n1 + v).toDouble
      val q = (c2 + 1).toDouble / (n2 + v).toDouble
      // Spark round(x, 0) is HALF_UP on doubles — mirror it exactly
      BigDecimal(p * math.log(p / q) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // vocab {x,y,z}; a: x->2,y->1 (N=3); b: x->1,y->1,z->1 (N=3)
    val ab = term(2, 3, 1, 3, 3) + term(1, 3, 1, 3, 3) + term(0, 3, 1, 3, 3)
    val ba = term(1, 3, 2, 3, 3) + term(1, 3, 1, 3, 3) + term(1, 3, 0, 3, 3)
    assert(got(("a", "b")) === ((3L, 3L, 3L, ab)))
    assert(got(("b", "a")) === ((3L, 3L, 3L, ba)))
    assert(ab > 0 && ba > 0, "distinct distributions must diverge")
  }

  test("KL divergence of identical distributions is exactly zero") {
    val dir = writeDocs(Seq(
      (1L, "p q q r", "en", "a", 7L),
      (2L, "p q q r", "en", "b", 7L)))
    val got = TextOps.textSourceDivergence(spark, dir).collect()
    assert(got.length === 2)
    got.foreach(r => assert(r.getLong(5) === 0L))
  }
}
