package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim).
  *
  *  - brute-force cosine top-k: the exactness baseline. The query set is
  *    broadcast; the corpus is scanned once, fully parallel, and top-k is
  *    a windowed rank per query — no driver-side collect, no cross-shuffle.
  *  - hyperplane-LSH ANN: the 100 TB path. Vectors are bucketed by the
  *    sign pattern of `nPlanes` fixed random hyperplanes (seeded, so the
  *    plan is deterministic); search is an equi-join on the bucket id, so
  *    cost scales with bucket occupancy, not corpus size × query count.
  *
  * Dot products are `zip_with`/`aggregate` higher-order expressions in
  * double precision — built-in, codegen-adjacent, no UDF serialization.
  */
object SimilarityOps extends QueryPack {

  /** cosine(a, b) over array<float> columns — a custom codegen'd Catalyst
    * expression (one fused primitive loop; see
    * [[graft.functions.CosineSimilarity]]). Bit-identical to the
    * higher-order-function formulation it replaced, ~2 orders of magnitude
    * less per-pair overhead on candidate-verification joins. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_similarity(a, b)

  /** Multi-table hyperplane LSH: `nTables` independent tables of
    * `bitsPerTable` planes each (seed 42, deterministic). One table of
    * many bits is vacuously selective (recall→0 as the corpus thins per
    * bucket); multiple short tables is the standard recall/cost trade —
    * a candidate is anything sharing >= 1 of the query's buckets. */
  private val nTables = 8
  private val bitsPerTable = 6
  /** The index's FIXED vector dimension — hyperplane LSH, like any
    * trained quantizer, is built for one dim: the plane matrix is
    * `nPlanes` dim-length blocks. */
  private val Dim = 64
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42L)
    Seq.fill(nTables * bitsPerTable)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Array of `nTables` bucket ids (table index folded into high bits) —
    * ONE fused codegen kernel over the flattened plane matrix
    * ([[graft.functions.HyperplaneBuckets]]), bit-identical to the
    * 48-fold `aggregate(zip_with(...))` composition it replaced (same
    * left-fold summation order; sign test, bucket ids unchanged).
    *
    * Gated on `size(emb) == Dim`: the kernel derives the plane count
    * from `planes.length / dim`, so a shorter vector whose length merely
    * DIVIDES the flattened matrix (dim 2/4/8/16/32 against 48×64) would
    * be sliced into garbage pseudo-tables that can spuriously collide
    * with real buckets. An off-dim vector gets NO buckets — it is not in
    * this index — and its empty array explodes to zero candidate rows. */
  def lshBuckets(emb: Column): Column =
    when(size(emb) === Dim,
      graft.functions.VectorExpressions.hyperplane_buckets(
        emb, typedlit(planes.flatten), lit(bitsPerTable)))
      .otherwise(typedlit(Array.empty[Long]))

  /** Single coarse bucket (first table) — kept for blocked pair gen where
    * one table suffices (e.g. near-dup verification at tight thresholds).
    * NULL (not an ANSI element_at error) when the vector is off-dim or
    * null: [[lshBuckets]] returns an EMPTY bucket array for those, and
    * element_at(empty, 1) throws under Spark 4's default ANSI mode. */
  def lshBucket(emb: Column): Column =
    when(size(emb) === Dim, element_at(lshBuckets(emb), 1))

  /** The searchable corpus: rows WITHOUT an embedding (null or empty
    * array) are excluded up front — such a vector has no similarity to
    * anything, and letting it through NPEs the IVF seed sample
    * (`getSeq(1).toSeq` on the collected row), feeds a zero-length seed
    * into the Lloyd movement fold (`empty.max`), and crashes the typed
    * vector aggregator. A crawl-scale corpus is guaranteed to contain
    * such rows; dropping them at the scan (pushed filters) is the only
    * placement that covers every index family at once. */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
  }

  /** Default query set for the declared topk queries: vectors 0–4. */
  private val defaultQueries: Column = col("vec_id") < 5

  /** Exact top-k search body: broadcast the (small) query set, scan the
    * corpus once, windowed rank per query. `score` defaults to the full
    * cosine; variants (e.g. the truncated-prefix audit) swap the score
    * while inheriting the SAME determinism discipline — round to 6 dp
    * before ranking, vec_id tiebreak, NULL similarities filtered before
    * the window. */
  private def bruteSearch(base: DataFrame, queryPred: Column, k: Int,
      score: (Column, Column) => Column = cosine): DataFrame = {
    val q = base.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = base.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(score(col("q_emb"), col("embedding")), 6).as("cos"))
      // a candidate with UNDEFINED similarity (zero-norm / non-finite
      // vector → NULL cosine) is not a neighbor — without this it would
      // still fill trailing top-k ranks (NULL sorts last, not out)
      .filter(col("cos").isNotNull)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact top-10 cosine neighbors for query vectors vec_id < 5. */
  def annBruteForce(s: SparkSession, d: String): DataFrame =
    bruteSearch(corpus(s, d), defaultQueries, 10)

  /** RADIUS (range) similarity search — the "all neighbors within τ"
    * complement of top-k retrieval: exact brute force with a broadcast
    * query set, ONE corpus scan for all queries (the
    * [[annBruteForce]] shape; the 100 TB scale path is the same
    * IVF/LSH bucketing the top-k family uses — probe candidate lists,
    * verify exact). Exact-copy twins are planted (every
    * `vec_id % 101 == 0` re-appended under +1e12, the established
    * device), so query 0's twin MUST appear at cos 1.0 — a
    * ground-truth anchor inside the radius set. Scores rounded to
    * 4 dp BEFORE the threshold so both engines cut identically. */
  def annRadius(s: SparkSession, d: String): DataFrame = {
    val base0 = corpus(s, d)
    val base = base0.unionByName(
      base0.filter(col("vec_id") % 101 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000000000L))
    val q = base0.filter(defaultQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    base.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy(col("q_id"), col("vec_id"))
  }

  /** Int8-quantized corpus `(vec_id, qv: array<long>)` — the shared
    * "training + quantize" front of the SQ and PQ searches. Fixed-dim
    * AND finite: a NaN/Inf component would poison the learned scale
    * (max |v|) and ANSI-throw in the integer cast — a quantizer indexes
    * only well-formed vectors (abs(v) < Inf is false for BOTH NaN and
    * ±Inf, one predicate covers all three). The per-dim max|v| scale
    * vector is assembled into ONE ordered array row — dims are
    * struct-sorted so the array index is the dimension, no collect(),
    * one broadcast row. */
  private def int8Corpus(s: SparkSession, d: String): DataFrame = {
    val base = corpus(s, d).filter(size(col("embedding")) === Dim &&
      expr("forall(embedding, v -> abs(CAST(v AS DOUBLE)) < CAST('Infinity' AS DOUBLE))"))
    val scales = base
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim")).agg(max(abs(col("v").cast("double"))).as("m"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("sm"))
      .select(transform(col("sm"), x => x.getField("m")).as("scales"))
    base.crossJoin(broadcast(scales))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("scales"), (v, m) =>
          when(m > 0, round(v.cast("double") * 127.0 / m, 0))
            .otherwise(0.0).cast("long")).as("qv"))
  }

  /** Scalar-quantized (int8) nearest neighbors: per-dimension symmetric
    * quantization q = round(v·127 / max|v_dim|), then EXACT integer dot
    * products over the quantized vectors, top-10 per query (score desc,
    * vec_id tiebreak). The 100 TB rationale: int8 cuts vector memory and
    * scan bandwidth 4× and turns the scoring kernel into integer MACs —
    * the standard first rung of vector-search compression (IVF-SQ /
    * faiss SQ8 shape). Because the quantized values and their dot
    * products are small integers derived from one deterministic rounding,
    * the WHOLE search result — scores included — is oracle-checkable,
    * unlike float scores that drift with summation order.
    *
    * Shape: one posexplode + 64-row aggregate learns the per-dim scales
    * (the "training" pass); the scales ride a 1-row broadcast into a
    * single quantize-and-score corpus scan against the broadcast query
    * set — same plan skeleton as [[annBruteForce]], integer arithmetic
    * instead of float cosine. Off-dim vectors are excluded by the
    * fixed-dim index rule. */
  def annQuantizedTopK(s: SparkSession, d: String): DataFrame = {
    val quantized = int8Corpus(s, d)
    val q = quantized.filter(defaultQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val scored = quantized.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("aggregate(zip_with(q_qv, qv, (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy(col("q_id"), col("rank"))
  }

  private val pqSubspaces = 8
  private val pqSubDim = Dim / pqSubspaces // 8 dims per subvector
  private val pqCodes = 16                 // 4-bit codes

  /** Product-quantization ANN with ADC scoring — the memory-compression
    * rung above int8: each vector is stored as 8 four-bit CODES (64
    * floats → 4 bytes, a 64× compression), each code naming the nearest
    * codebook entry for one 8-dim subvector; a query is answered by one
    * 8×16 lookup table of exact integer sub-dot-products and a
    * table-sum per candidate (faiss's IVFPQ/ADC serving shape).
    *
    * The codebook is SAMPLED, not Lloyd-trained: the 16 anchors are the
    * corpus vectors with the smallest portable-md5 priority (a
    * deterministic uniform draw — the standard random-codebook PQ
    * variant), and all arithmetic downstream of the int8 quantizer is
    * exact integer math. That trade makes the ENTIRE pipeline — codes,
    * LUT, ADC scores, ranks — oracle-checkable in closed form, where
    * iterative k-means training would be float-order-dependent (the IVF
    * family covers that side, gated by its recall audit).
    *
    * Shape: encode = one broadcast join of (vec, sub) slices against the
    * 128-row codebook + a min-struct argmin agg (never a shuffle of
    * the corpus against itself); serving = codes ⋈ broadcast LUT
    * (|q|·8·16 rows) + one (q, vec) sum-agg + rank-limited top-k. At
    * 100 TB the stored index is the 4-byte code column — the scan reads
    * 64× fewer vector bytes than brute force. */
  def annPqTopK(s: SparkSession, d: String): DataFrame = {
    val quantized = int8Corpus(s, d)
    // (vec, sub, 8-dim subvector)
    val subs = quantized
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(pqSubspaces - 1))).as("sub"), col("qv"))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(qv, sub * $pqSubDim + 1, $pqSubDim)").as("sv"))
    // deterministic uniform codebook draw: 16 anchors by md5 priority
    val anchors = quantized
      .withColumn("pri", expr(
        "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .orderBy(col("pri"), col("vec_id")).limit(pqCodes)
      .withColumn("j",
        row_number().over(Window.orderBy(col("pri"), col("vec_id"))) - 1)
    val codebook = anchors
      .select(col("j"),
        explode(sequence(lit(0), lit(pqSubspaces - 1))).as("sub"), col("qv"))
      .select(col("j"), col("sub"),
        expr(s"slice(qv, sub * $pqSubDim + 1, $pqSubDim)").as("cv"))
    // encode: nearest codebook entry per (vec, sub) by exact integer L2;
    // min over (dist, j) structs breaks ties on the smaller code
    val codes = subs.join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("j"),
        expr("aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("dist"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("j"))).getField("j").as("code"))
    // ADC lookup table: per (query, sub, code) the exact integer
    // sub-dot-product of the UNENCODED query against the codebook
    val lut = subs.filter(defaultQueries)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv").as("q_sv"))
      .join(broadcast(codebook), Seq("sub"))
      .select(col("q_id"), col("sub"), col("j"),
        expr("aggregate(zip_with(q_sv, cv, (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("l"))
    val scored = codes
      .join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("j"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("l")).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Per-label centroid table: for every (label, dimension), the member
    * count and 6dp mean component over well-formed (fixed-dim, finite)
    * vectors — the "class prototype" table a retrieval or clustering
    * pipeline materializes for probing and drift monitoring. Long shape
    * (label, dim) rather than an array column so the oracle hash covers
    * every component.
    *
    * Shape: one posexplode + ONE aggregate shuffle on the (label, dim)
    * key — 64·|labels| cells regardless of corpus size, the same
    * partial-agg collapse as every sketch here. */
  def embeddingCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === Dim &&
        expr("forall(embedding, v -> abs(CAST(v AS DOUBLE)) < CAST('Infinity' AS DOUBLE))"))
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), round(avg(col("v").cast("double")), 6).as("mean_v"))
      .orderBy(col("label"), col("dim"))

  /** Pairwise centroid-distance matrix: cosine between every pair of
    * per-label class prototypes — the embedding-space confusion proxy a
    * drift monitor tracks (labels whose prototypes converge are the ones
    * a classifier will start conflating).
    *
    * Determinism: per-(label, dim) sums are EXACT integer micros
    * (`round(v·1e6)` summed as longs — order-independent); each pair's
    * per-dim product and the squared norms are rounded to longs BEFORE
    * their 64-term sums (the BM25 fixed-point pattern), so the only
    * float ops are per-term products and one final division on
    * identical inputs in both engines.
    *
    * Shape: the corpus is touched by ONE posexplode + (label, dim)
    * aggregate (64·|labels| cells out); the pair fan is |labels|²·64
    * rows of tiny integers — broadcast-joined, corpus-size-independent. */
  def embedCentroidDistances(s: SparkSession, d: String): DataFrame = {
    val comp = Tables.embeddings(s, d)
      .filter(col("embedding").isNotNull && size(col("embedding")) === Dim &&
        col("label").isNotNull &&
        expr("forall(embedding, v -> abs(CAST(v AS DOUBLE)) < CAST('Infinity' AS DOUBLE))"))
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)")).as("sm"))
      // centroid component in micro units (double, from exact integers)
      .select(col("label"), col("dim"),
        (col("sm").cast("double") / col("n")).as("c"))
    val norms = comp.groupBy(col("label"))
      .agg(sum(expr("CAST(round(c * c) AS BIGINT)")).as("n2"))
    val pairs = comp.as("a")
      .join(broadcast(comp.as("b")),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        expr("CAST(round(a.c * b.c) AS BIGINT)").as("t"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("t")).as("dot"))
    pairs
      .join(broadcast(norms.select(col("label").as("label_a"), col("n2").as("na"))),
        "label_a")
      .join(broadcast(norms.select(col("label").as("label_b"), col("n2").as("nb"))),
        "label_b")
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("label_a"), col("label_b"),
        expr("CAST(round(dot / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1000000) AS BIGINT)")
          .as("cos_micro"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** k-NN classification by retrieval: each query vector takes the
    * MAJORITY label of its exact top-10 cosine neighbors (vote count
    * desc, label asc tiebreak — fully deterministic). The classic
    * "search as a classifier" audit: it exercises retrieval + metadata
    * join + per-query reduction, and the label vote is integer-exact in
    * both engines.
    *
    * Shape: [[annBruteForce]]'s one corpus scan, then the ≤10·|queries|
    * neighbor rows join the label table keyed and reduce per query —
    * nothing beyond the search itself touches the corpus. */
  def annKnnClassify(s: SparkSession, d: String): DataFrame = {
    val neighbors = annBruteForce(s, d).select(col("q_id"), col("vec_id"))
    val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val votes = neighbors.join(labels, Seq("vec_id"))
      .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("label").as("predicted"), col("votes"))
      .orderBy(col("q_id"))
  }

  /** Shared LSH search body (production + portable differ only in the
    * bucket expression): bucket equi-join → candidate ID pairs — the
    * multi-table collision dedup runs on the (q_id, vec_id) pair alone
    * (2 longs), never on rows still carrying both 64-float vectors —
    * → query vectors broadcast back for the exact-cosine rerank →
    * per-query top-k. */
  private def lshSearch(base: DataFrame, bucketCol: Column, k: Int,
      queryPred: Column = defaultQueries): DataFrame =
    lshSearchFrom(
      base.select(col("vec_id"), explode(bucketCol).as("bucket")), base, k,
      queryPred)

  /** [[lshSearch]] body over an explicit (possibly PRE-BUILT and loaded)
    * bucket table — the state [[saveLshBuckets]] persists. */
  private def lshSearchFrom(bucketed: DataFrame, base: DataFrame, k: Int,
      queryPred: Column): DataFrame = {
    val q = bucketed.filter(queryPred)
      .select(col("bucket"), col("vec_id").as("q_id"))
    val cand = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val qVecs = base.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = cand
      .join(broadcast(qVecs), "q_id")
      .join(base, "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
      .filter(col("cos").isNotNull) // see bruteSearch: NULL cos ≠ neighbor
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN via multi-table hyperplane LSH: candidates share >= 1 bucket with
    * the query in any table; exact cosine re-ranks the candidate set. */
  def annLsh(s: SparkSession, d: String): DataFrame =
    lshSearch(corpus(s, d), lshBuckets(col("embedding")), 5)

  /** Persist the production LSH index state to `path`: the exploded
    * (vec_id, bucket) table — the expensive part, one fused-kernel pass
    * over the corpus — plus the (vec_id, embedding) vectors the rerank
    * needs. Both are one distributed write; nothing touches the driver. */
  def saveLshBuckets(base: DataFrame, path: String): Unit = {
    base.select(col("vec_id"),
        explode(lshBuckets(col("embedding"))).as("bucket"))
      .write.mode("overwrite").parquet(path + "/buckets")
    base.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(path + "/vectors")
  }

  /** Search a [[saveLshBuckets]]-persisted LSH index: the stored bucket
    * table replaces the hashing pass, so a session that never saw the
    * hyperplanes (only the constants baked into the saved buckets)
    * answers bit-identically to the building session. */
  def lshSearchSaved(s: SparkSession, path: String, k: Int,
      queryPred: Column = defaultQueries): DataFrame =
    lshSearchFrom(s.read.parquet(path + "/buckets"),
      s.read.parquet(path + "/vectors"), k, queryPred)

  // ---- portable LSH: oracle-checkable twin of annLsh ----------------------
  //
  // The production tables use seeded gaussian hyperplanes — fine for the
  // engine, but no SQL oracle can reproduce a JVM PRNG stream. The twin
  // replaces each gaussian plane with a ±1 weight vector derived from pure
  // integer arithmetic (affine scramble mod P, the same trick as the
  // portable SimHash family), so DuckDB regenerates the identical planes
  // from the same constants. The projection is a left-fold sum of
  // `float→double × ±1.0` in index order in BOTH engines, which IEEE-754
  // guarantees bit-identical — sign tests, buckets, candidates, and the
  // rerank are then oracle-checked end to end. Same multi-table bucket
  // equi-join shape and cost model as [[annLsh]].

  private val PP = 1000000007L
  private def pA(k: Int): Long = (2654435761L * (k + 1)) % PP
  private def pC(k: Int): Long = (40503L * (k + 11) * (k + 17)) % PP

  /** ±1 weights of plane k: sign_i = [(i·A_k + C_k) mod P >= P/2], i 1-based. */
  private def portableWeights(k: Int): Seq[Double] =
    (1 to 64).map(i => if ((i * pA(k) + pC(k)) % PP >= PP / 2) 1.0 else -1.0)

  /** Same fused kernel as [[lshBuckets]] over the portable ±1 planes —
    * the left-fold order is what the DuckDB oracle's `list_reduce`
    * reproduces, so the swap is hash-invariant by construction. Same
    * fixed-dim gate as the production family. */
  private def portableBuckets(emb: Column): Column =
    when(size(emb) === Dim,
      graft.functions.VectorExpressions.hyperplane_buckets(
        emb,
        typedlit((0 until nTables * bitsPerTable).flatMap(portableWeights)),
        lit(bitsPerTable)))
      .otherwise(typedlit(Array.empty[Long]))

  /** ANN with the portable plane family — identical plan shape to
    * [[annLsh]] by construction (same [[lshSearch]] body, different
    * bucket expression). */
  def annLshPortable(s: SparkSession, d: String): DataFrame =
    lshSearch(corpus(s, d), portableBuckets(col("embedding")), 5)

  /** DuckDB twin of [[annLshPortable]] — planes regenerated from the same
    * A/C constants; the projection fold uses `list_reduce` so the
    * summation order matches Spark's `aggregate` exactly. */
  private def portableProjSql(k: Int): String =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, 65), i -> " +
      "CAST(embedding[CAST(i AS INT)] AS DOUBLE) * " +
      s"(CASE WHEN ((i * ${pA(k)} + ${pC(k)}) % $PP) >= ${PP / 2} " +
      "THEN 1.0 ELSE -1.0 END))), (a, x) -> a + x)"

  private val annLshPortableOracleSql: String = {
    val tableSelects = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { j =>
        s"(CASE WHEN ${portableProjSql(t * bitsPerTable + j)} >= 0 " +
          s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
      s"SELECT vec_id, (CAST(${t.toLong << 32} AS BIGINT) + $bits) AS bucket FROM embeddings"
    }.mkString("\nUNION ALL\n")
    s"""WITH bk AS (
       |$tableSelects),
       |q AS (SELECT bucket, vec_id AS q_id FROM bk WHERE vec_id < 5),
       |cand AS (SELECT DISTINCT q.q_id, e.vec_id
       |  FROM bk e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id),
       |scored AS (
       |  SELECT c.q_id, c.vec_id,
       |   round(list_dot_product(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]) /
       |     (sqrt(list_dot_product(qe.embedding::DOUBLE[], qe.embedding::DOUBLE[])) *
       |      sqrt(list_dot_product(ce.embedding::DOUBLE[], ce.embedding::DOUBLE[]))), 6) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.q_id
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, rank FROM ranked
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---- IVF (inverted-file) ANN: the second scale path, complementing LSH ----

  private val ivfProbes = 3
  private val ivfIters = 2
  private val ivfMinClusters = 4
  private val ivfMaxClusters = 4096

  /** √N clusters, clamped — the standard IVF heuristic: at fixed nProbe,
    * expected candidates per query ≈ nProbe·N/kC, so kC=√N keeps both the
    * list count and the per-list scan ~√N as the corpus grows. The clamp
    * caps the driver-held centroid matrix at kC·dim ≈ 1 MB regardless of
    * corpus size. */
  def ivfClusterCount(n: Long): Int =
    math.min(ivfMaxClusters,
      math.max(ivfMinClusters, math.ceil(math.sqrt(n.toDouble)).toInt)).toInt

  /** Nearest-centroid id as ONE codegen'd projection — no join, no
    * shuffle. The centroid matrix travels as a single flattened
    * `array<float>` literal (O(kC·dim) floats, ~1 MB at the kC cap) and
    * the generated code LOOPS over it ([[graft.functions.CentroidOps]]):
    * an earlier per-centroid `array_max(struct(cos, id), ...)` unrolling
    * made Janino compile time explode once the √N heuristic raised kC
    * (measured 3.2s → 41.8s on the sf0.1 bench). Ties pick the lower id,
    * so assignment stays deterministic. */
  private[operators] def nearestCluster(emb: Column, cents: Seq[Seq[Float]]): Column =
    graft.functions.CentroidExpressions.nearest_centroid(
      emb, typedlit(cents.flatten))

  /** The query's `nProbe` closest centroid ids (descending cosine). */
  private def probeClusters(emb: Column, cents: Seq[Seq[Float]], nProbe: Int): Column =
    graft.functions.CentroidExpressions.probe_centroids(
      emb, typedlit(cents.flatten), lit(nProbe))

  /** Convergence threshold for the Lloyd loop: stop once no centroid
    * component moved by more than this between rounds — a converged
    * quantizer re-pays a full corpus pass for a no-op update otherwise. */
  private val ivfEps = 1e-4

  /** Spherical k-means coarse quantizer. Seeds are the `kC` vectors with
    * smallest xxhash64(vec_id) — a deterministic distributed sample
    * (TakeOrdered, no full sort). Each Lloyd round is ONE distributed
    * assign+sum job: per-cluster element-wise vector sums via the typed
    * [[graft.functions.VecSumAgg]] aggregator (map-side partials, kC rows
    * per split to the shuffle — the posexplode formulation it replaces
    * shuffled a dim× row blowout of the corpus per round); only the
    * kC×dim centroid matrix ever reaches the driver, so training is
    * corpus-size-independent on the driver side. Empty clusters keep
    * their previous centroid. Rounds stop early once the max component
    * movement drops under [[ivfEps]]. */
  private[operators] def trainCentroids(emb: DataFrame, kC: Int): Seq[Seq[Float]] = {
    val vecSum = udaf(graft.functions.VecSumAgg)
    var cents: Seq[Seq[Float]] = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(kC)
      .collect().map(_.getSeq[Float](1).toSeq).toSeq
    // zero-row corpus: no seeds, no quantizer to train (the Lloyd loop's
    // movement max is undefined over zero centroids)
    if (cents.isEmpty) return cents
    var iter = 0
    var moved = Double.MaxValue
    while (iter < ivfIters && moved > ivfEps) {
      val means = emb
        .select(nearestCluster(col("embedding"), cents).as("cl"),
          col("embedding"))
        .groupBy(col("cl"))
        .agg(vecSum(col("embedding")).as("vsum"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2)
          r.getInt(0) -> r.getSeq[Double](1).map(v => (v / n).toFloat).toSeq
        }
        .toMap
      val next = cents.indices.map(i => means.getOrElse(i, cents(i)))
      moved = cents.iterator.zip(next.iterator).map { case (a, b) =>
        a.iterator.zip(b.iterator).map(p => math.abs(p._1 - p._2).toDouble).max
      }.max
      cents = next
      iter += 1
    }
    cents
  }

  /** IVF ANN: assign every vector to its nearest centroid (the inverted
    * list), probe the query's `nProbe` nearest lists, exact-cosine
    * rerank the candidates. Scale shape vs LSH: ONE short join key
    * (cluster id), candidate cost ~ corpus × nProbe / kC per query, and
    * the only broadcast is the query set — the index add/search never
    * touches the driver. Results are approximate (recall is spec-tested
    * against the brute-force baseline; no SQL oracle by design). */
  def annIvf(s: SparkSession, d: String): DataFrame =
    annIvfFrom(corpus(s, d))

  /** A built IVF index: the persisted assigned corpus plus the trained
    * centroid matrix. The cache IS the index — `search` plans against it
    * without re-deriving the corpus — and [[close]] is its explicit
    * lifecycle end (releases the persisted corpus). */
  final class IvfIndex private[SimilarityOps] (
      private[SimilarityOps] val corpus: DataFrame,
      private val backing: DataFrame,
      val centroids: Seq[Seq[Float]], val nProbe: Int) {
    /** Assigned inverted lists: a LOADED index carries its stored `cl`
      * column; an in-session one derives it with the codegen
      * nearest-centroid projection (deterministic, so both forms agree
      * bit-for-bit). */
    private def indexedCorpus: DataFrame =
      if (corpus.columns.contains("cl")) corpus
      else corpus.select(col("vec_id"), col("embedding"),
        nearestCluster(col("embedding"), centroids).as("cl"))
    /** Top-k probe: explode the query set over its nProbe nearest lists,
      * keyed join on the cluster id, exact-cosine rerank. */
    def search(queryPred: Column, k: Int): DataFrame = {
      val indexed = indexedCorpus
      val q = corpus.filter(queryPred)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          explode(probeClusters(col("embedding"), centroids, nProbe)).as("cl"))
      // every corpus vector lives in exactly one inverted list, so a
      // (query, candidate) pair appears at most once — no distinct needed
      val scored = indexed.join(broadcast(q), Seq("cl"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
        .filter(col("cos").isNotNull) // see bruteSearch: NULL cos ≠ neighbor
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .orderBy(col("q_id"), col("rank"))
    }
    /** Release the persisted corpus backing this index. Lazy results built
      * from [[search]] stay correct afterwards (they recompute from
      * lineage), they just lose the cache. */
    def close(): Unit = backing.unpersist(false)

    /** Incremental append — the ingest shape ([[graft.operators.DedupOps]]
      * `ingestDedupMinhash` discipline): assign ONLY the batch to the
      * EXISTING centroids (one codegen projection over O(batch) rows — no
      * retraining, no corpus reassignment, no driver data) and extend the
      * inverted lists. Off-dim / null vectors are excluded by the same
      * fixed-dim index contract as [[buildIvfIndex]]. Returns a NEW index
      * with its own cache lifecycle (close both when done); the centroids
      * are shared unchanged, so existing vectors keep their exact
      * assignments — a planted duplicate lands in precisely its
      * original's list. Quantizer drift under sustained appends is the
      * operator's retraining policy (rebuild when recall audits decay),
      * exactly as for any trained ANN index. */
    def append(newVectors: DataFrame): IvfIndex = {
      val dim = centroids.headOption.map(_.length).getOrElse(0)
      val assigned = newVectors.select(col("vec_id"), col("embedding"))
        .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
        .select(col("vec_id"), col("embedding"),
          nearestCluster(col("embedding"), centroids).as("cl"))
      val ext = indexedCorpus.unionByName(assigned)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      new IvfIndex(ext, ext, centroids, nProbe)
    }

    /** Persist the index to `path` so later sessions serve from it
      * without retraining — the 100 TB usage shape (train once, search
      * many): `corpus/` is a [[graft.sources.SnapshotTable]] holding the
      * ASSIGNED inverted lists (vec_id, embedding, cl — one distributed
      * write, assignment never recomputed again; appends land as new
      * atomic snapshot versions, see
      * [[SimilarityOps.appendToIvfIndex]]) and `centroids/` the kC×dim
      * matrix + nProbe (≤ 1 MB, one file).
      * [[SimilarityOps.loadIvfIndex]] restores an index whose `search`
      * is bit-identical to this one's. */
    def save(path: String): Unit = {
      val s = corpus.sparkSession
      graft.sources.SnapshotTable.commit(s, path + "/corpus",
        indexedCorpus, overwrite = true)
      import s.implicits._
      centroids.zipWithIndex
        .map { case (v, i) => (i, v, nProbe) }
        .toDF("cl", "centroid", "n_probe")
        .coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    }
  }

  /** Reload an [[IvfIndex.save]]d index: the centroid matrix (≤ 1 MB)
    * is the only driver-side read; the assigned corpus stays a lazy
    * persisted scan of the LATEST snapshot version. `search` answers
    * bit-identically to the index that was saved/appended — no
    * retraining, no reassignment. */
  def loadIvfIndex(s: SparkSession, path: String): IvfIndex = {
    graft.functions.CentroidExpressions.register(s)
    val cent = s.read.parquet(path + "/centroids").orderBy(col("cl")).collect()
    require(cent.nonEmpty, s"no centroids at $path/centroids — not a saved IVF index")
    val cents: Seq[Seq[Float]] = cent.map(_.getSeq[Float](1).toSeq).toSeq
    val corpus = graft.sources.SnapshotTable
      .readAsOf(s, path + "/corpus", Int.MaxValue)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new IvfIndex(corpus, corpus, cents, cent(0).getInt(2))
  }

  /** Incremental append to a SAVED index: O(batch) work end to end —
    * one ≤1 MB centroid read, one codegen assignment projection over
    * the batch, one atomic snapshot-table append commit (two metadata
    * operations regardless of index size). The index's history is the
    * table's: `readAsOf` an older version serves the pre-append index,
    * and [[graft.sources.SnapshotTable.vacuum]] bounds its storage.
    * Returns the committed corpus version. */
  def appendToIvfIndex(s: SparkSession, path: String,
      newVectors: DataFrame): Int = {
    graft.functions.CentroidExpressions.register(s)
    val cent = s.read.parquet(path + "/centroids").orderBy(col("cl")).collect()
    require(cent.nonEmpty, s"no centroids at $path/centroids — not a saved IVF index")
    val cents: Seq[Seq[Float]] = cent.map(_.getSeq[Float](1).toSeq).toSeq
    val assigned = newVectors.select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === cents.head.length)
      .select(col("vec_id"), col("embedding"),
        nearestCluster(col("embedding"), cents).as("cl"))
    graft.sources.SnapshotTable.commit(s, path + "/corpus",
      assigned, overwrite = false)
  }

  /** Build an IVF index over an explicit corpus.
    * `clusters = None` applies the √N heuristic (one count() over the
    * persisted corpus — amortized into the cache the build needs
    * anyway); `probes = None`
    * probes max(3, √kC) lists — nProbe has to grow with the cluster
    * count or recall decays as the corpus (and with it kC) grows, while
    * the probed corpus fraction √kC/kC still *shrinks* at scale. */
  def buildIvfIndex(emb0: DataFrame, clusters: Option[Int] = None,
      probes: Option[Int] = None): IvfIndex = {
    graft.functions.CentroidExpressions.register(emb0.sparkSession)
    // Index building reads the corpus ~6 times (count, seed sample, each
    // Lloyd round, indexing, query side); persist the projected corpus so
    // an expensive upstream lineage executes once, not per pass.
    val emb = emb0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // IVF is a FIXED-DIM index (like any trained quantizer): the index
    // dim is the corpus's modal embedding length (ties → larger), and
    // vectors of any other length are excluded — a truncated vector
    // cannot share a centroid vector-sum with full-dim ones (the typed
    // aggregator rightly refuses the merge), and scoring it against a
    // flattened kC×dim centroid matrix would misread plane offsets. One
    // tiny aggregate over the already-persisted corpus; a no-op slice on
    // a uniform corpus.
    val dimRow = emb.groupBy(size(col("embedding")).as("dim"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("dim").desc).head(1)
    val embU =
      if (dimRow.isEmpty) emb
      else emb.filter(size(col("embedding")) === dimRow(0).getInt(0))
    // the modal-dim group's count IS embU's row count — no second scan
    val kC = clusters.getOrElse(ivfClusterCount(
      if (dimRow.isEmpty) 0L else dimRow(0).getLong(1)))
    val nProbe = probes.getOrElse(
      math.max(ivfProbes, math.ceil(math.sqrt(kC.toDouble)).toInt))
    new IvfIndex(embU, emb, trainCentroids(embU, kC), nProbe)
  }

  /** The most recent fire-and-forget index built by [[annIvfFrom]]: the
    * declared-query path has no caller holding an [[IvfIndex]] handle to
    * close, so each new build releases the previous build's corpus cache —
    * bounding the session to ONE cached IVF corpus no matter how many
    * times the bench/driver loop re-runs the query. Library users who need
    * several live indexes call [[buildIvfIndex]] and own the lifecycle. */
  private val lastAnonIndex =
    new java.util.concurrent.atomic.AtomicReference[IvfIndex](null)

  /** One-shot IVF search over an explicit corpus (builds a throwaway
    * index; see [[buildIvfIndex]] for an owned, reusable one). */
  def annIvfFrom(emb0: DataFrame, clusters: Option[Int] = None,
      probes: Option[Int] = None,
      queryPred: Column = defaultQueries): DataFrame = {
    val idx = buildIvfIndex(emb0, clusters, probes)
    val prev = lastAnonIndex.getAndSet(idx)
    if (prev != null) prev.close()
    idx.search(queryPred, 5)
  }

  /** Recall audit with a DETERMINISTIC ground truth — the trick that makes
    * an approximate index oracle-checkable: plant an exact-copy twin
    * (vec_id + 1e12) for every 101st vector and use the twins as the query
    * set. Each twin's true nearest neighbor is its original at cos exactly
    * 1.0 (the nearest NATURAL pair is ≤ 0.6 — a huge margin), and both
    * index families find it BY CONSTRUCTION: identical vectors share every
    * LSH bucket and land in the same inverted list, so expected recall is
    * exactly n_queries for every method. The DuckDB oracle states that
    * expectation in closed form; any blocking/probe/rerank regression
    * breaks the hash. Turns `ann_lsh_topk`/`ann_ivf_topk` from rows-only
    * signals into an oracle-gated recall contract.
    *
    * Scale note: the brute ground-truth pass is O(corpus × queries), and
    * the every-101st query set grows WITH the corpus — fine for the
    * declared fixture-scale audit, quadratic on a production corpus.
    * `sampleEvery` thins the planted query set k-fold (deterministic
    * modular sample, so an oracle can still state the expectation in
    * closed form): pick it so queries stay roughly constant as the corpus
    * grows and the audit stays linear. */
  def annRecall(s: SparkSession, d: String): DataFrame =
    annRecall(s, d, sampleEvery = 1L)

  def annRecall(s: SparkSession, d: String, sampleEvery: Long): DataFrame = {
    require(sampleEvery >= 1L, s"sampleEvery must be >= 1, got $sampleEvery")
    val plantOff = 1000000000000L
    val base0 = corpus(s, d)
    // plant twins only of WELL-FORMED, INDEX-DIM vectors: a zero-norm or
    // non-finite vector has undefined self-similarity (cos(v, v) is
    // NULL, see the kernel contract) so its twin is unfindable by any
    // method, and an off-dim vector is excluded from the fixed-dim
    // LSH/IVF indexes by contract so its twin is unfindable by the
    // indexed methods — either would understate recall against the
    // oracle's closed-form expectation. cos(v, v) IS NOT NULL is exactly
    // the "norm positive and finite" predicate the oracle states; the
    // dim gate mirrors its len(embedding) = 64.
    val planted = base0.filter(col("vec_id") % (101L * sampleEvery) === 0 &&
        size(col("embedding")) === Dim &&
        cosine(col("embedding"), col("embedding")).isNotNull)
      .withColumn("vec_id", col("vec_id") + plantOff)
    val base = base0.unionByName(planted)
    val isQ = col("vec_id") >= plantOff
    val nQ = planted.agg(count(lit(1)).as("n_queries"))
    // found = top-k rows where the retrieved neighbor IS the query's twin
    def audit(m: String, res: DataFrame): DataFrame =
      nQ.crossJoin(res.agg(
        sum(when(col("q_id") === col("vec_id") + plantOff, 1L).otherwise(0L))
          .as("found")))
        .select(lit(m).as("method"), col("n_queries"),
          coalesce(col("found"), lit(0L)).as("n_found"))
    audit("brute", bruteSearch(base, isQ, 5))
      .unionByName(audit("ivf", annIvfFrom(base, queryPred = isQ)))
      .unionByName(audit("lsh", lshSearch(base, lshBuckets(col("embedding")), 5, isQ)))
      .orderBy(col("method"))
  }

  /** Recall audit for the INCREMENTAL index path — the
    * [[IvfIndex.append]] contract made oracle-checkable: build the IVF
    * index over the NATURAL corpus only, append the planted exact-copy
    * twins as a post-build batch (the ingest shape: O(batch) assignment
    * against the already-trained centroids), then search with the twins
    * as queries. A twin is assigned to precisely its original's
    * inverted list (assignment is deterministic on identical vectors
    * against the SAME centroids) and probes its own list first, so
    * every appended query finds its original at cos exactly 1.0 —
    * expected recall is n_queries in closed form, same as
    * [[annRecall]], and any regression in the append path (drifted
    * centroids, re-trained quantizer, missed batch rows) breaks the
    * oracle hash. */
  def annIvfAppend(s: SparkSession, d: String): DataFrame = {
    val plantOff = 1000000000000L
    val base0 = corpus(s, d)
    val planted = base0.filter(col("vec_id") % 101L === 0 &&
        size(col("embedding")) === Dim &&
        cosine(col("embedding"), col("embedding")).isNotNull)
      .withColumn("vec_id", col("vec_id") + plantOff)
    val baseIdx = buildIvfIndex(base0)
    val idx = baseIdx.append(planted)
    val prev = lastAnonIndex.getAndSet(idx)
    if (prev != null) prev.close()
    // the appended index's persist covers the union; the base build's
    // separate cache is no longer needed
    baseIdx.close()
    val nQ = planted.agg(count(lit(1)).as("n_queries"))
    val res = idx.search(col("vec_id") >= lit(plantOff), 5)
    nQ.crossJoin(res.agg(
        sum(when(col("q_id") === col("vec_id") + plantOff, 1L).otherwise(0L))
          .as("found")))
      .select(lit("ivf_append").as("method"), col("n_queries"),
        coalesce(col("found"), lit(0L)).as("n_found"))
  }

  /** Per-label corpus stats — the oracle-checked sanity slice (DuckDB
    * computes the same norms over the same lists cast to double). Rows
    * whose norm is undefined (null embedding) or non-finite (a NaN/Inf
    * component) are excluded BEFORE the aggregate — one NaN norm would
    * otherwise poison avg/max for its whole label group (NaN propagates
    * through sums; the oracle mirrors the same guard). */
  def embeddingStats(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val norm = sqrt(aggregate(col("embedding"),
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    Tables.embeddings(s, d)
      // empty arrays out BEFORE the fold: Spark's aggregate seed makes
      // an empty embedding's norm 0.0 while DuckDB's list_sum([]) is
      // NULL — the size gate keeps both engines excluding the row
      .filter(size(col("embedding")) > 0)
      .select(col("label"), norm.as("nrm"))
      .filter(col("nrm").isNotNull && !isnan(col("nrm")) &&
        col("nrm") =!= Double.PositiveInfinity) // an Inf component → +Inf norm
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("nrm")), 4).as("avg_norm"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"))
      .orderBy(col("label"))
  }

  /** Target dimension of the random projection — small enough that the
    * reduced corpus is a quarter of the original scan, large enough
    * that JL distortion keeps exact twins unambiguous. */
  private val RpDim = 16

  /** Johnson–Lindenstrauss dimensionality reduction (Achlioptas-style
    * ±1 signs, JL lemma via Achlioptas 2003's database-friendly
    * projections): y_j = Σ_i x_i·sign(h(i·16+j)) with signs from
    * xxhash64 parity — MATRIX-FREE (no driver-held projection matrix,
    * no broadcast), evaluated as 16 sign-flipped sums in ONE partial
    * aggregate over the exploded (vec_id, i, x_i) rows. Inputs are
    * micro-unit integers (CAST(round(x·1e6))), so each projected
    * coordinate is an EXACT integer sum — order-independent across
    * partitions, and a planted twin's projection is bit-equal to its
    * original's, making expected recall closed-form (the [[annRecall]]
    * device): every planted query's nearest reduced-space neighbor is
    * its original at cosine exactly dot/√(dot·dot).
    *
    * This is the scale path for similarity over fat embeddings: project
    * once (map-side, one shuffle on vec_id), bucket on the projection's
    * 16 sign bits (a free simhash of the reduced space), and search
    * only within the query's bucket — a keyed equi-join whose volume is
    * Σ|bucket(q)|, with the raw corpus consulted only to re-rank final
    * candidates. */
  def annRpRecall(s: SparkSession, d: String): DataFrame = {
    val plantOff = 1000000000000L
    val base0 = corpus(s, d).filter(size(col("embedding")) === Dim &&
      cosine(col("embedding"), col("embedding")).isNotNull)
    val planted = base0.filter(col("vec_id") % 101L === 0)
      .withColumn("vec_id", col("vec_id") + plantOff)
    val base = base0.unionByName(planted)
    val ex = base.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
    val aggs = (0 until RpDim).map { j =>
      sum(expr("CAST(round(x * 1000000) AS BIGINT)") *
        (pmod(xxhash64(col("i") * lit(RpDim) + lit(j)), lit(2)) * 2 - 1))
        .as(s"y$j")
    }
    // The projection's 16 SIGN BITS are a free LSH bucket (a simhash of
    // the reduced space): an exact twin's integer projection is
    // bit-equal to its original's, so they share the bucket by
    // construction and blocking the search on it costs NO recall on
    // the planted queries — while turning the query×corpus term from
    // quadratic (the audit plants N/101 queries, so a brute scan is
    // O(N²/101) — measured 33× wall at 10× data) into a keyed
    // Σ|bucket(q)| join that grows with the data, not its square.
    val proj = ex.groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        array((0 until RpDim).map(j => col(s"y$j").cast("double")): _*).as("y"),
        (0 until RpDim).map(j =>
          when(col(s"y$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("bucket"))
    val q = proj.filter(col("vec_id") >= plantOff)
      .select(col("vec_id").as("q_id"), col("y").as("qy"), col("bucket"))
    // 16-element arrays: the HOF dot/norms stay tiny and codegen-safe
    val dot = expr("aggregate(zip_with(qy, y, (a, b) -> a * b), 0D, (acc, v) -> acc + v)")
    val nq = expr("aggregate(qy, 0D, (acc, v) -> acc + v * v)")
    val ny = expr("aggregate(y, 0D, (acc, v) -> acc + v * v)")
    val scored = proj.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        when(nq > 0 && ny > 0, dot / sqrt(nq * ny)).as("cos"))
      .filter(col("cos").isNotNull)
    // Tie-break toward the planted original FIRST: a corpus holding
    // duplicate embeddings (or two vectors equal after micro-unit
    // rounding) puts a second cos-1.0 neighbor in the tie set, and
    // ordering by vec_id alone would let a smaller id steal rank-1 and
    // hard-fail the closed-form n_found==n_queries oracle. The audit's
    // claim is "the original is IN the max-cos tie set", so prefer it.
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc,
      (col("vec_id") === col("q_id") - plantOff).desc, col("vec_id"))
    val top1 = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
    planted.agg(count(lit(1)).as("n_queries"))
      .crossJoin(top1.agg(
        sum(when(col("q_id") === col("vec_id") + plantOff, 1L).otherwise(0L))
          .as("found")))
      .select(lit("rp16").as("method"), col("n_queries"),
        coalesce(col("found"), lit(0L)).as("n_found"))
  }

  /** Matryoshka (truncated-embedding) retrieval audit: top-10 cosine
    * neighbors computed with the FULL 64-dim embedding vs with only its
    * FIRST 16 dimensions, and the per-query recall of the truncated
    * search against the full one. This is the measurement behind
    * MRL-style adaptive retrieval (use a prefix of the embedding for
    * the cheap first pass, the full vector to re-rank): at 100 TB a
    * 16-dim first pass reads 4× less vector data — the audit tells you
    * what recall that buys. Truncation here is a plain `slice`; the
    * scale path (IVF over the truncated prefix) is
    * [[annIvf]]/[[saveIvfIndex]] unchanged, since the index never sees
    * the tail dims.
    *
    * Determinism: both legs run through [[bruteSearch]] — round to 6 dp
    * before ranking with a vec_id tiebreak, NULL similarities filtered
    * BEFORE the window so cross-engine null-ordering never matters (the
    * oracle additionally drops NaN: DuckDB renders a zero-norm prefix
    * as 0/0 = NaN where Spark's cosine returns NULL). */
  def embedTruncationRecall(s: SparkSession, d: String): DataFrame = {
    val k = 10
    val truncDim = 16
    val base = corpus(s, d)
    def ids(df: DataFrame) = df.select(col("q_id"), col("vec_id"))
    val full = ids(bruteSearch(base, defaultQueries, k))
    val trunc = ids(bruteSearch(base, defaultQueries, k,
      (a, b) => cosine(slice(a, 1, truncDim), slice(b, 1, truncDim))))
    val nf = full.groupBy(col("q_id")).agg(count(lit(1)).as("n_full"))
    val ov = full.as("f").join(trunc.as("t"),
        col("f.q_id") === col("t.q_id") && col("f.vec_id") === col("t.vec_id"))
      .groupBy(col("f.q_id").as("q_id")).agg(count(lit(1)).as("n_overlap"))
    nf.join(ov, Seq("q_id"), "left")
      .select(col("q_id"), col("n_full"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_full").cast("double"), 4).as("recall"))
      .orderBy(col("q_id"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_rp_recall" -> annRpRecall,
    "embed_truncation_recall" -> embedTruncationRecall,
    "ann_brute_topk" -> annBruteForce,
    "ann_radius" -> annRadius,
    "ann_quantized_topk" -> annQuantizedTopK,
    "ann_pq_topk" -> annPqTopK,
    "ann_knn_classify" -> annKnnClassify,
    "embedding_centroids" -> embeddingCentroids,
    "embed_centroid_distances" -> embedCentroidDistances,
    "ann_lsh_topk" -> annLsh,
    "ann_lsh_portable" -> annLshPortable,
    "ann_ivf_topk" -> annIvf,
    "ann_ivf_append" -> annIvfAppend,
    "ann_recall" -> annRecall,
    "embedding_stats" -> embeddingStats,
  )

  override val oracle: Map[String, String] = Map(
    "ann_lsh_portable" -> annLshPortableOracleSql,
    // exact-integer micro sums per (label, dim); per-term rounding before
    // the 64-term sums — float ops only on identical inputs
    "embed_centroid_distances" ->
      s"""WITH w AS (SELECT label, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) = $Dim
         |    AND label IS NOT NULL
         |    AND len(list_filter(embedding, x ->
         |      NOT isfinite(CAST(x AS DOUBLE)))) = 0),
         |e AS (SELECT label, unnest(embedding)::DOUBLE AS v,
         |  generate_subscripts(embedding, 1) AS dim FROM w),
         |comp AS (SELECT label, dim, count(*) AS n,
         |  sum(CAST(round(v * 1000000) AS BIGINT)) AS sm
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT label, dim, CAST(sm AS DOUBLE) / n AS c FROM comp),
         |norms AS (SELECT label,
         |  CAST(sum(CAST(round(c * c) AS BIGINT)) AS BIGINT) AS n2
         |  FROM c GROUP BY label),
         |pairs AS (SELECT a.label AS label_a, b.label AS label_b,
         |  CAST(sum(CAST(round(a.c * b.c) AS BIGINT)) AS BIGINT) AS dot
         |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
         |  GROUP BY 1, 2)
         |SELECT p.label_a, p.label_b,
         |  CAST(round(p.dot / (sqrt(CAST(na.n2 AS DOUBLE)) *
         |    sqrt(CAST(nb.n2 AS DOUBLE))) * 1000000) AS BIGINT) AS cos_micro
         |FROM pairs p
         |JOIN norms na ON na.label = p.label_a
         |JOIN norms nb ON nb.label = p.label_b
         |WHERE na.n2 > 0 AND nb.n2 > 0
         |ORDER BY label_a, label_b""".stripMargin,
    // int8 quantization + integer dot products: every step is exact
    // arithmetic on identical doubles/integers, so the full result —
    // scores included — reproduces in SQL
    "ann_quantized_topk" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings
        |           WHERE embedding IS NOT NULL AND len(embedding) = 64
        |             AND len(list_filter(embedding, x -> x IS NULL OR
        |               NOT (abs(CAST(x AS DOUBLE)) < CAST('infinity' AS DOUBLE)))) = 0),
        |dims AS (SELECT CAST(i AS INT) AS i FROM unnest(range(1, 65)) AS u(i)),
        |flat AS (SELECT e.vec_id, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS v
        |         FROM e, dims d),
        |sc AS (SELECT i, max(abs(v)) AS m FROM flat GROUP BY i),
        |qz AS (SELECT f.vec_id, f.i,
        |    CASE WHEN s.m > 0 THEN CAST(round(f.v * 127.0 / s.m) AS BIGINT)
        |         ELSE 0 END AS q
        |  FROM flat f JOIN sc s USING (i)),
        |qs AS (SELECT vec_id, i, q FROM qz WHERE vec_id < 5),
        |dots AS (SELECT qs.vec_id AS q_id, z.vec_id,
        |    CAST(sum(qs.q * z.q) AS BIGINT) AS score
        |  FROM qs JOIN qz z USING (i) WHERE z.vec_id <> qs.vec_id
        |  GROUP BY 1, 2),
        |rk AS (SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |      AS rank
        |  FROM dots)
        |SELECT q_id, vec_id, score, CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // sampled-codebook product quantization: every stage downstream of
    // the int8 quantizer is integer arithmetic (codes, LUT, ADC scores),
    // so the WHOLE search replays in closed-form SQL — ties in the
    // argmin broken on the smaller code in both engines
    "ann_pq_topk" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings
        |           WHERE embedding IS NOT NULL AND len(embedding) = 64
        |             AND len(list_filter(embedding, x -> x IS NULL OR
        |               NOT (abs(CAST(x AS DOUBLE)) < CAST('infinity' AS DOUBLE)))) = 0),
        |dims AS (SELECT CAST(i AS INT) AS i FROM unnest(range(1, 65)) AS u(i)),
        |flat AS (SELECT e.vec_id, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS v
        |         FROM e, dims d),
        |sc AS (SELECT i, max(abs(v)) AS m FROM flat GROUP BY i),
        |qz AS (SELECT f.vec_id, f.i,
        |    CASE WHEN s.m > 0 THEN CAST(round(f.v * 127.0 / s.m) AS BIGINT)
        |         ELSE 0 END AS q
        |  FROM flat f JOIN sc s USING (i)),
        |pri AS (SELECT vec_id,
        |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS pri
        |  FROM e),
        |anch AS (SELECT vec_id,
        |    row_number() OVER (ORDER BY pri, vec_id) - 1 AS j
        |  FROM pri ORDER BY pri, vec_id LIMIT 16),
        |cb AS (SELECT a.j, (z.i - 1) // 8 AS sub, (z.i - 1) % 8 AS dsub, z.q AS c
        |  FROM anch a JOIN qz z ON z.vec_id = a.vec_id),
        |enc AS (SELECT z.vec_id, (z.i - 1) // 8 AS sub, cb.j,
        |    CAST(sum((z.q - cb.c) * (z.q - cb.c)) AS BIGINT) AS dist
        |  FROM qz z JOIN cb ON cb.sub = (z.i - 1) // 8 AND cb.dsub = (z.i - 1) % 8
        |  GROUP BY z.vec_id, (z.i - 1) // 8, cb.j),
        |codes AS (SELECT vec_id, sub, j AS code FROM (
        |    SELECT vec_id, sub, j,
        |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, j) AS rn
        |    FROM enc) WHERE rn = 1),
        |lut AS (SELECT z.vec_id AS q_id, (z.i - 1) // 8 AS sub, cb.j,
        |    CAST(sum(z.q * cb.c) AS BIGINT) AS l
        |  FROM qz z JOIN cb ON cb.sub = (z.i - 1) // 8 AND cb.dsub = (z.i - 1) % 8
        |  WHERE z.vec_id < 5
        |  GROUP BY z.vec_id, (z.i - 1) // 8, cb.j),
        |adc AS (SELECT l.q_id, c.vec_id, CAST(sum(l.l) AS BIGINT) AS score
        |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.j = c.code
        |  WHERE c.vec_id <> l.q_id
        |  GROUP BY l.q_id, c.vec_id),
        |rk AS (SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id)
        |      AS rank
        |  FROM adc)
        |SELECT q_id, vec_id, score, CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "embedding_centroids" ->
      """WITH e AS (SELECT label, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64
        |    AND len(list_filter(embedding, x -> x IS NULL OR
        |      NOT (abs(CAST(x AS DOUBLE)) < CAST('infinity' AS DOUBLE)))) = 0),
        |flat AS (SELECT label, CAST(i - 1 AS INT) AS dim,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM e, unnest(range(1, 65)) AS u(i))
        |SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(v), 6) AS mean_v
        |FROM flat GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    // degenerate-input guards mirror the Spark side (null/empty vectors
    // excluded at the corpus; NULL/NaN cosine is never a neighbor). The
    // len-equality guard protects DuckDB's list_dot_product from
    // erroring on an off-dim vector — the one place the oracle cannot
    // express graft_cosine's documented min-length prefix semantics
    // (irrelevant on a fixed-dim corpus, where the guard is a no-op).
    "ann_knn_classify" ->
      """WITH e0 AS (SELECT vec_id, embedding FROM embeddings
        |            WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |      FROM e0 WHERE vec_id < 5),
        |scored AS (
        |  SELECT q_id, e.vec_id AS vec_id,
        |   round(list_dot_product(q_emb, e.embedding::DOUBLE[]) /
        |     (sqrt(list_dot_product(q_emb, q_emb)) *
        |      sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cos
        |  FROM e0 e JOIN q ON e.vec_id <> q.q_id
        |  WHERE len(e.embedding) = len(q_emb)),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored
        |  WHERE cos IS NOT NULL AND NOT isnan(cos)),
        |votes AS (
        |  SELECT r.q_id, l.label, CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked r JOIN embeddings l ON r.vec_id = l.vec_id
        |  WHERE r.rank <= 10 GROUP BY r.q_id, l.label),
        |best AS (
        |  SELECT q_id, label, votes,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY votes DESC, label) AS rk
        |  FROM votes)
        |SELECT q_id, label AS predicted, votes FROM best
        |WHERE rk = 1 ORDER BY q_id""".stripMargin,
    // planted-twin recall is exact by construction (see annRecall): every
    // method must retrieve each twin's original, so the expected counts
    // are a closed-form function of the plant modulus
    "ann_recall" ->
      """WITH nr AS (
        |  SELECT sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |  WHERE vec_id % 101 = 0 AND embedding IS NOT NULL
        |    AND len(embedding) = 64),
        |p AS (SELECT count(*) AS n FROM nr
        |      WHERE nrm > 0 AND NOT isnan(nrm) AND NOT isinf(nrm))
        |SELECT m.method, p.n AS n_queries, p.n AS n_found
        |FROM p, (SELECT 'brute' AS method UNION ALL SELECT 'ivf'
        |         UNION ALL SELECT 'lsh') m
        |ORDER BY method""".stripMargin,
    // same closed-form expectation in the REDUCED space: a twin's
    // integer projection is bit-equal to its original's (see annRpRecall)
    "ann_rp_recall" ->
      """WITH nr AS (
        |  SELECT sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |  WHERE vec_id % 101 = 0 AND embedding IS NOT NULL
        |    AND len(embedding) = 64),
        |p AS (SELECT count(*) AS n FROM nr
        |      WHERE nrm > 0 AND NOT isnan(nrm) AND NOT isinf(nrm))
        |SELECT 'rp16' AS method, p.n AS n_queries, p.n AS n_found
        |FROM p""".stripMargin,
    // same closed-form expectation for the incremental path: an appended
    // exact-copy twin is found by construction (see annIvfAppend)
    "ann_ivf_append" ->
      """WITH nr AS (
        |  SELECT sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |  WHERE vec_id % 101 = 0 AND embedding IS NOT NULL
        |    AND len(embedding) = 64),
        |p AS (SELECT count(*) AS n FROM nr
        |      WHERE nrm > 0 AND NOT isnan(nrm) AND NOT isinf(nrm))
        |SELECT 'ivf_append' AS method, p.n AS n_queries, p.n AS n_found
        |FROM p""".stripMargin,
    "embedding_stats" ->
      """WITH n AS (
        |  SELECT label, sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings WHERE len(embedding) > 0)
        |SELECT label, count(*) AS n, round(avg(nrm), 4) AS avg_norm,
        | round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
        |FROM n WHERE nrm IS NOT NULL AND NOT isnan(nrm) AND NOT isinf(nrm)
        |GROUP BY label ORDER BY label""".stripMargin,
    // radius search: same cosine idiom, planted twins included in the
    // corpus (query 0's twin must surface at cos 1.0), round-then-cut
    "ann_radius" ->
      """WITH b0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |b AS (SELECT * FROM b0
        |  UNION ALL
        |  SELECT vec_id + 1000000000000, emb FROM b0 WHERE vec_id % 101 = 0),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM b0 WHERE vec_id < 5)
        |SELECT q.q_id, b.vec_id,
        |  round(list_dot_product(q.q_emb, b.emb) /
        |    (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
        |     sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos
        |FROM q JOIN b ON b.vec_id <> q.q_id
        |WHERE round(list_dot_product(q.q_emb, b.emb) /
        |    (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
        |     sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.3
        |ORDER BY q_id, vec_id""".stripMargin,
    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q_id, e.vec_id AS vec_id,
        |   round(list_dot_product(q_emb, e.embedding::DOUBLE[]) /
        |     (sqrt(list_dot_product(q_emb, q_emb)) *
        |      sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cos
        |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT q_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // the same double-typed cosine tree over the full vector and its
    // 16-dim prefix ([1:16] = Spark slice(e,1,16)); rounding-then-rank
    // and the vec_id tiebreak make both top-10 sets engine-identical
    "embed_truncation_recall" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id < 5),
        |j AS (SELECT q_id, q_emb, e.vec_id AS vec_id,
        |        e.embedding::DOUBLE[] AS emb
        |      FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
        |f AS (SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, cos, row_number() OVER
        |      (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM (SELECT q_id, vec_id,
        |      round(list_dot_product(q_emb, emb) /
        |        (sqrt(list_dot_product(q_emb, q_emb)) *
        |         sqrt(list_dot_product(emb, emb))), 6) AS cos FROM j)
        |  WHERE cos IS NOT NULL AND NOT isnan(cos)) WHERE rank <= 10),
        |t AS (SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, cos, row_number() OVER
        |      (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM (SELECT q_id, vec_id,
        |      round(list_dot_product(q_emb[1:16], emb[1:16]) /
        |        (sqrt(list_dot_product(q_emb[1:16], q_emb[1:16])) *
        |         sqrt(list_dot_product(emb[1:16], emb[1:16]))), 6) AS cos
        |    FROM j)
        |  WHERE cos IS NOT NULL AND NOT isnan(cos)) WHERE rank <= 10),
        |nf AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_full FROM f
        |  GROUP BY q_id),
        |ov AS (SELECT f.q_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM f JOIN t ON f.q_id = t.q_id AND f.vec_id = t.vec_id
        |  GROUP BY f.q_id)
        |SELECT nf.q_id, nf.n_full,
        |  coalesce(ov.n_overlap, 0) AS n_overlap,
        |  round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) /
        |    CAST(nf.n_full AS DOUBLE), 4) AS recall
        |FROM nf LEFT JOIN ov ON ov.q_id = nf.q_id
        |ORDER BY nf.q_id""".stripMargin,
  )
}
