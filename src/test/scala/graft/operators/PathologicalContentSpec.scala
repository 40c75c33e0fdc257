package graft.operators

import graft.{GraftSpec, SparkEntry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Every documents/embeddings-driven query must survive PATHOLOGICAL
  * content — the rows a 100 TB crawl corpus is guaranteed to contain:
  * null/empty/whitespace-only text, null metadata, multi-byte UTF-8,
  * single giant tokens, highly repetitive long documents, embedded
  * newlines/tabs, zero vectors, null/empty/truncated/NaN embeddings.
  *
  * The fixture is the REAL sf0.001 corpus plus a planted pathological
  * tail, so every query keeps its normal data shape and additionally
  * digests the hostile rows. Contract checked per query:
  *
  *   1. it completes (no NPE, no ANSI divide/overflow error, no codegen
  *      crash) — including the multimodal pixel family on multi-byte
  *      UTF-8 (its oracle samples the payload per BYTE via
  *      hex(encode(text)) slicing, so no ASCII restriction), and
  *   2. no floating-point column in its result carries NaN/Infinity —
  *      the silent-poison case: NaN sorts ABOVE every real value in a
  *      descending top-k, so one corrupt embedding would otherwise
  *      hijack every neighbor list it touches.
  */
class PathologicalContentSpec extends GraftSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("label", IntegerType, nullable = false)))

  private def doc(id: Long, text: String, lang: String = "en",
      source: String = "src_path"): Row =
    Row(id, text, lang, source,
      if (text == null) null else text.length.toLong)

  private lazy val pathoDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-patho-").toString
    val repeated = Array.fill(5000)("dup").mkString(" ") // 5k-token one-word doc
    val docs = Seq(
      doc(9000001L, ""),                              // empty text
      doc(9000002L, "tok"),                           // single token
      doc(9000003L, " \t \n  "),                      // whitespace only
      Row(9000004L, null, null, null, null),          // all-null row
      doc(9000005L, "héllo wörld 北京 🚀 café naïve résumé 東京 データ", "zh"),
      doc(9000006L, repeated),                        // long + degenerate-repetitive
      doc(9000007L, repeated),                        // exact dup of the above
      doc(9000008L, "x" * 20000),                     // one 20k-char token
      doc(9000009L, "line one\nline two\tand a tab"), // embedded newline/tab
    )
    val zeros = Array.fill(64)(0.0f)
    val nans = Array.tabulate(64)(i => if (i == 7) Float.NaN else 0.1f)
    val infs = Array.tabulate(64)(i =>
      if (i == 3) Float.PositiveInfinity else 0.2f)
    val embs = Seq(
      Row(9000001L, zeros, 0),                        // zero vector -> 0/0
      Row(9000002L, null, 1),                         // null embedding
      Row(9000003L, Array.empty[Float], 2),           // empty array
      Row(9000004L, Array(1.0f, 2.0f), 3),            // truncated (dim 2, not 64)
      Row(9000005L, nans, 4),                         // NaN component
      Row(9000006L, infs, 0),                         // Inf component -> Inf norm
      // SECOND off-dim vector, different length: two truncated vectors
      // colliding in one IVF cluster would crash the typed vector-sum
      // aggregator were they not excluded by the index's fixed-dim rule
      Row(9000007L, Array(1.0f, 2.0f, 3.0f, 4.0f), 1),
    )
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    base.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(docs), docSchema))
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val baseE = spark.read.parquet(s"$sfDir/embeddings.parquet")
    baseE.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(embs), embSchema))
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** documents/embeddings-driven query families (the TPC-H q* and the
    * events-driven stream_* families never see the planted rows). */
  private val sweptPrefixes = Seq("ann_", "cdc_", "curation_", "decontam_",
    "dedup_", "embedding_", "ingest_", "mixture_", "mr_", "multimodal_",
    "native_", "pack_", "profile_", "sample_", "search_", "text_")


  private def floatCols(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.schema.fields.zipWithIndex.collect {
      case (StructField(_, DoubleType | FloatType, _, _), i) => i
    }.toIndexedSeq

  test("documents/embeddings queries survive pathological content, no NaN/Inf leaks") {
    graft.CacheRegistry.clear(spark)
    val swept = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => sweptPrefixes.exists(n.startsWith) }
    assert(swept.size >= 40, s"sweep lost coverage: only ${swept.size} queries matched")
    val failures = swept.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, pathoDir)
        val fc = floatCols(df)
        val rows = df.collect()
        val poisoned = rows.iterator.flatMap { r =>
          fc.iterator.filter(i => !r.isNullAt(i)).flatMap { i =>
            val v = r.get(i) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float  => f.doubleValue()
            }
            if (v.isNaN || v.isInfinite)
              Some(s"$name: ${df.schema(i).name}=$v in row $r") else None
          }
        }.take(1).toSeq
        poisoned.headOption
      } catch {
        case e: Throwable =>
          val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${chain.take(200)}")
      }
    }
    graft.CacheRegistry.clear(spark)
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("degenerate vectors are never retrieved as neighbors") {
    // zero (9000001), null (9000002), empty (9000003), NaN (9000005),
    // Inf (9000006) have UNDEFINED similarity → excluded from every
    // top-k; the truncated vectors (9000004/9000007) keep the documented
    // common-prefix semantics under brute force and MAY legitimately rank
    // there (the fixed-dim LSH/IVF indexes exclude them)
    val excluded = Set(9000001L, 9000002L, 9000003L, 9000005L, 9000006L)
    for (q <- Seq("ann_brute_topk", "ann_lsh_topk", "ann_lsh_portable", "ann_ivf_topk")) {
      val neighbors = SparkEntry.queries(q)(spark, pathoDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(neighbors.intersect(excluded).isEmpty,
        s"$q retrieved a degenerate vector: ${neighbors.intersect(excluded)}")
    }
    graft.CacheRegistry.clear(spark)
  }

  test("the planted repetitive dup pair is recovered by substring spans") {
    val spans = DedupOps.substringSpans(spark, pathoDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 9000006L &&
        org.apache.spark.sql.functions.col("doc_id") <= 9000007L)
      .collect()
    assert(spans.length == 2)
    spans.foreach { r =>
      // every window of the 5000-token one-word doc is shared with its twin
      assert(r.getAs[Double]("dup_frac") == 1.0, r.toString)
      assert(r.getAs[Long]("longest_dup_tokens") == 5000L, r.toString)
    }
  }
}
