package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time inside partitions.
  *
  * The container ships no image/audio codecs, so the fixtures are
  * deterministic synthetic media blobs built from the `documents` table:
  * a PNG-IHDR-shaped header (magic + big-endian width/height/frame-count
  * fields derived arithmetically from `doc_id`) followed by the UTF-8
  * text as the "pixel data". That makes the decode step REAL — the
  * metadata extractor parses actual bytes out of a true `binary` column
  * (ByteBuffer big-endian reads, magic validation), exactly what a JPEG/
  * PNG header parser does — while the expected values stay independently
  * computable by the DuckDB oracle without a blob parser. The deep decode
  * ([[mediaPixels]]) processes every payload byte into pixel statistics.
  * At scale this runs one decoder instance per partition
  * (`mapPartitions`, amortized codec init), never per row.
  *
  * Header layout (18 bytes, big-endian):
  *   bytes 0..3   magic "GRFT" (0x47524654)
  *   bytes 4..7   width  (int32)
  *   bytes 8..11  height (int32)
  *   bytes 12..13 n_frames (int16)
  *   bytes 14..17 payload byte length (int32)
  */
object MultimodalOps extends QueryPack {

  /** Extracted media metadata row (all long so the parquet schema matches
    * DuckDB's BIGINT arithmetic bit-for-bit). */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long)

  // Deterministic synthetic dimensions — the same formulas the oracle uses.
  private def widthCol: Column = lit(64) + pmod(col("doc_id"), lit(1856)).cast("int")
  private def heightCol: Column = lit(64) + pmod(col("doc_id") * 7, lit(1016)).cast("int")
  private def framesCol: Column = lit(1) + pmod(col("doc_id"), lit(60)).cast("int")

  /** documents → (doc_id, payload: binary) with the GRFT header prepended
    * to the UTF-8 text bytes. Pure codegen'd expressions. A document with
    * NULL text carries no media blob and is excluded here — every
    * downstream decoder wraps the payload in a ByteBuffer, and a null
    * byte array would NPE inside the executor loop (the oracles mirror
    * the same `text IS NOT NULL` guard). */
  def payloads(s: SparkSession, d: String): DataFrame =
    payloadsOf(Tables.documents(s, d))

  /** The corpus plus planted multi-byte rows: every 101st doc re-entered
    * under doc_id+2e12 with a 2-byte (U+00E9) and 3-byte (U+2713) suffix.
    * The driver corpus is pure ASCII, so without these rows the byte-level
    * decode paths would never be exercised where bytes ≠ characters; the
    * oracles rebuild the same rows with chr() and sample per BYTE. */
  private[operators] def utf8PlantedDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base
      .filter(col("doc_id") % 101 === 0 && col("text").isNotNull)
      .select((col("doc_id") + 2000000000000L).as("doc_id"),
        concat(col("text"), lit(" \u00e9\u2713")).as("text")))
  }

  private def payloadsOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .withColumn("w", widthCol).withColumn("h", heightCol).withColumn("f", framesCol)
      .select(col("doc_id"),
        concat(
          unhex(concat(
            lit("47524654"),
            lpad(hex(col("w")), 8, "0"),
            lpad(hex(col("h")), 8, "0"),
            lpad(hex(col("f")), 4, "0"),
            lpad(hex(octet_length(col("text"))), 8, "0"))),
          encode(col("text"), "utf-8")).as("payload"))

  /** Binary ingest → per-partition batch header decode → typed metadata
    * table. The parse is real byte-level work: magic check + big-endian
    * field reads off the binary column. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = payloads(s, d).as[(Long, Array[Byte])]
    val meta = bin.mapPartitions { rows =>
      // one decoder context per partition (amortized init, like a codec)
      rows.map { case (id, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload) // big-endian by default
        require(buf.getInt(0) == 0x47524654, s"bad magic in doc $id")
        val w = buf.getInt(4)
        val h = buf.getInt(8)
        val f = buf.getShort(12).toInt
        MediaMeta(id, payload.length.toLong, w.toLong, h.toLong, f.toLong)
      }
    }
    meta.toDF().orderBy(col("doc_id"))
  }

  /** Per-doc pixel statistics from the decoded payload. */
  case class PixelStats(doc_id: Long, n_px: Long, px_sum: Long,
      px_min: Long, px_max: Long, px_checksum: Long)

  /** DEEP payload decode: header parse, then a full pass over the frame
    * bytes — sum / min / max over unsigned sample values plus a
    * position-weighted checksum Σ i·vᵢ (1-based, order-sensitive: a
    * shuffled or truncated payload breaks it where the order-free sums
    * would not). One decoder loop per partition, the whole-payload work a
    * real pixel decoder does, and the reason there is no remaining stub:
    * every byte the column carries is processed. The declared length
    * field is cross-checked against the physical payload first — a real
    * decoder's truncation guard. The mean is derived as a Spark `round`
    * column so its HALF_UP semantics match every other green ratio. */
  def mediaPixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = payloadsOf(utf8PlantedDocs(s, d)).as[(Long, Array[Byte])]
    val stats = bin.mapPartitions { rows =>
      rows.map { case (id, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload)
        require(buf.getInt(0) == 0x47524654, s"bad magic in doc $id")
        val plen = buf.getInt(14)
        require(payload.length == 18 + plen, s"truncated payload in doc $id")
        var i = 0; var sum = 0L; var ck = 0L
        var mn = 256L; var mx = -1L
        while (i < plen) {
          val v = (payload(18 + i) & 0xff).toLong
          sum += v; ck += (i + 1) * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        if (plen == 0) { mn = 0L; mx = 0L }
        // no ASCII restriction: the oracle samples the payload per BYTE
        // (hex(encode(text)) two-char slices), so any UTF-8 content —
        // including the planted multi-byte rows — agrees bit-for-bit
        PixelStats(id, plen.toLong, sum, mn, mx, ck)
      }
    }
    // empty payloads have no pixel row — matches the oracle (whose unnest
    // over 1..strlen generates zero rows) and keeps the ANSI-mode mean
    // division away from 0/0
    stats.toDF()
      .filter(col("n_px") > 0)
      .select(col("doc_id"), col("n_px"), col("px_sum"),
        round(col("px_sum") / col("n_px"), 4).as("px_mean"),
        col("px_min"), col("px_max"), col("px_checksum"))
      .orderBy(col("doc_id"))
  }

  case class SceneCuts(doc_id: Long, n_frames: Long, n_cuts: Long,
      first_cut: Long, max_jump: Long)

  /** Scene-cut detection over the frame stream — the shot-boundary pass
    * every video curation pipeline runs before sampling/captioning: the
    * payload's pixel bytes are split into the header's `n_frames`
    * contiguous frames (balanced integer split, byte i → frame
    * i·nf/len), each frame reduced to its byte-energy sum, and a CUT is
    * declared where consecutive energies jump by more than 12.5% of
    * their sum — |Δ| > (e_f + e_{f−1})/8, evaluated as
    * 8·|Δ| > e_f + e_{f−1} in exact integer arithmetic end to end.
    * The fixture makes cuts REAL: the media content is
    * `text ‖ upper(text)` — two visually distinct "scenes" whose
    * boundary frame drops ~32 per alphabetic byte — so the detector has
    * a genuine transition to find, not an all-zero row. Per-partition
    * single-pass decode (one frame-energy array per doc, O(bytes)), the
    * [[mediaPixels]] execution shape; the oracle re-derives energies by
    * hex-slicing the same bytes. */
  def sceneCuts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val two = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"), upper(col("text"))).as("text"))
    val bin = payloadsOf(two).as[(Long, Array[Byte])]
    val cuts = bin.mapPartitions { rows =>
      rows.map { case (id, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload)
        require(buf.getInt(0) == 0x47524654, s"bad magic in doc $id")
        val nf = buf.getShort(12).toInt
        val plen = buf.getInt(14)
        require(payload.length == 18 + plen, s"truncated payload in doc $id")
        val e = new Array[Long](nf)
        var i = 0
        while (i < plen) {
          e((i.toLong * nf / plen).toInt) += (payload(18 + i) & 0xff).toLong
          i += 1
        }
        var nCuts = 0L; var first = -1L; var maxJump = 0L
        var f = 1
        while (f < nf) {
          val jump = math.abs(e(f) - e(f - 1))
          if (jump > maxJump) maxJump = jump
          if (8L * jump > e(f) + e(f - 1)) {
            nCuts += 1
            if (first < 0) first = f.toLong
          }
          f += 1
        }
        SceneCuts(id, nf.toLong, nCuts, first, maxJump)
      }
    }
    cuts.toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling over the parsed frame count: every 10th frame index —
    * the explode shape a video pipeline produces (doc × frame rows). */
  def frameSample(s: SparkSession, d: String): DataFrame =
    mediaMeta(s, d)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Payload byte accounting over the raw text (kept from round 1: the
    * UTF-8 length must equal DuckDB's byte length of the same text). */
  def mediaBytes(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("octet_length(text)").cast("long").as("n_bytes"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** 60-bit average-hash (aHash) of a payload's frame bytes — the
    * perceptual-dedup primitive for media columns: sample 60 evenly-spaced
    * bytes (offset ⌊j·plen/60⌋, the "resize to a fixed grid" step of a
    * real aHash), set bit j iff the sample exceeds the sample mean. The
    * mean test is the INTEGER inequality v·60 > Σv — no division, no
    * float, so the DuckDB oracle reproduces the hash bit-for-bit. 60 bits
    * (not 64) keeps every power-of-two term ANSI-safe in signed long
    * arithmetic, same choice as the portable SimHash. */
  private def aHash60(payload: Array[Byte], plen: Int): Long = {
    val samples = new Array[Int](60)
    var sum = 0L
    var j = 0
    while (j < 60) {
      val v = payload(18 + ((j.toLong * plen) / 60).toInt) & 0xff
      samples(j) = v; sum += v; j += 1
    }
    var h = 0L
    j = 0
    while (j < 60) {
      if (samples(j) * 60L > sum) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Perceptual near-dup pairs over the media payloads: per-partition
    * deep decode → [[aHash60]] sketch, then the same banded-LSH relational
    * shape as the text SimHash pipelines (4×15-bit chunks → equi-join →
    * hamming ≤ 4 verify). Exact-copy payloads are planted (every 97th doc
    * under doc_id + 1e12, the [[graft.operators.DedupOps]] convention) so
    * the gate is non-vacuous at every scale; the oracle recomputes the
    * hash from the text bytes and brute-forces the tiny planted pair set.
    * Scale shape: the sketch is one decoder pass (no shuffle), the join
    * is keyed on 15-bit chunks, work linear in corpus + candidates. */
  def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // empty payloads carry no frame bytes to hash — no sketch row, the
    // minhashSigs/simhashes convention (mirrored in the oracle's
    // strlen > 0 guard)
    val base = payloadsOf(utf8PlantedDocs(s, d))
      .filter(length(col("payload")) > 18)
    val planted = base.unionByName(
      base.filter(col("doc_id") % 97 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000000000L))
    val hashed = planted.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.map { case (id, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload)
        require(buf.getInt(0) == 0x47524654, s"bad magic in doc $id")
        val plen = buf.getInt(14)
        // no ASCII restriction: the oracle samples per BYTE (see
        // mediaPixels), so multi-byte UTF-8 payloads hash identically
        (id, aHash60(payload, plen))
      }
    }.toDF("doc_id", "sk")
    // same banded-LSH join + hot-bucket cap as the text sketches
    // (mirrored in the oracle, so the cap is verified rather than asserted)
    DedupOps.bandedHammingPairs(hashed, nBands = 4, bandBits = 15, maxHamming = 4)
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> mediaMeta,
    "multimodal_frame_sample" -> frameSample,
    "multimodal_bytes" -> mediaBytes,
    "multimodal_pixels" -> mediaPixels,
    "multimodal_phash_pairs" -> phashPairs,
    "multimodal_scene_cuts" -> sceneCuts,
  )

  // The oracle recomputes the header fields arithmetically (it has no blob
  // parser); a hash match therefore proves the Spark side round-tripped
  // them through real bytes correctly.
  override val oracle: Map[String, String] = Map(
    // scene cuts: the oracle re-derives per-frame byte energies from
    // the SAME two-scene payload (text || upper(text)) by hex-slicing,
    // maps byte i to frame (i-1)*nf/len with the same integer split,
    // and applies the same exact 8|Δ| > e_f + e_{f-1} cut rule
    "multimodal_scene_cuts" ->
      """WITH t2 AS (SELECT doc_id, text || upper(text) AS text
        |  FROM documents WHERE text IS NOT NULL),
        |hx AS (SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(strlen(text) AS BIGINT) AS blen,
        |    CAST(1 + doc_id % 60 AS BIGINT) AS nf FROM t2),
        |b AS (SELECT doc_id, ((i - 1) * nf) // blen AS f,
        |    CAST(('0x' || substring(h, CAST(2*i-1 AS INT), 2)) AS BIGINT)
        |      AS v
        |  FROM hx, unnest(range(1, blen + 1)) AS u(i)),
        |frames AS (SELECT doc_id, nf, unnest(range(0, nf)) AS f FROM hx),
        |eg AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS e FROM b
        |  GROUP BY 1, 2),
        |fr AS (SELECT frames.doc_id, frames.nf, frames.f,
        |    coalesce(eg.e, 0) AS e
        |  FROM frames LEFT JOIN eg
        |    ON eg.doc_id = frames.doc_id AND eg.f = frames.f),
        |dl AS (SELECT doc_id, nf, f, e,
        |    lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe FROM fr)
        |SELECT doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
        |  CAST(coalesce(sum(CASE WHEN f >= 1
        |    AND 8 * abs(e - pe) > e + pe THEN 1 END), 0) AS BIGINT)
        |    AS n_cuts,
        |  CAST(coalesce(min(CASE WHEN f >= 1
        |    AND 8 * abs(e - pe) > e + pe THEN f END), -1) AS BIGINT)
        |    AS first_cut,
        |  CAST(coalesce(max(CASE WHEN f >= 1 THEN abs(e - pe) END), 0)
        |    AS BIGINT) AS max_jump
        |FROM dl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        | 18 + CAST(strlen(text) AS BIGINT) AS n_bytes,
        | 64 + doc_id % 1856 AS width,
        | 64 + (doc_id * 7) % 1016 AS height,
        | 1 + doc_id % 60 AS n_frames
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, 1 + doc_id % 60 AS n_frames,
        | unnest(range(0, CAST(1 + doc_id % 60 AS BIGINT), 10)) AS frame_idx
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_bytes" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        | length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the oracle samples the payload per BYTE — hex(encode(text)) carries
    // the UTF-8 bytes, and each two-hex-char slice is one byte value — so
    // the parity holds for ANY text, including the planted multi-byte
    // rows (every 101st doc re-entered with a 2-byte + 3-byte suffix)
    "multimodal_pixels" ->
      """WITH docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000000000 AS doc_id,
        |    text || ' ' || chr(233) || chr(10003) AS text
        |  FROM documents WHERE doc_id % 101 = 0 AND text IS NOT NULL),
        |hx AS (SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(strlen(text) AS BIGINT) AS blen FROM docs2),
        |b AS (
        |  SELECT doc_id, i,
        |    CAST(('0x' || substring(h, CAST(2*i-1 AS INT), 2)) AS BIGINT) AS v
        |  FROM hx, unnest(range(1, blen+1)) AS u(i))
        |SELECT doc_id, count(*) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
        | round(sum(v)/CAST(count(*) AS DOUBLE), 4) AS px_mean,
        | CAST(min(v) AS BIGINT) AS px_min, CAST(max(v) AS BIGINT) AS px_max,
        | CAST(sum(i*v) AS BIGINT) AS px_checksum
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // recompute the 60-bit aHash from the payload BYTES (hex-slice
    // sampling, multi-byte safe) and mirror the banded join + hot-bucket
    // cap relationally; docs0 adds the planted multi-byte rows first so
    // the %97 twin planting sees the same corpus the Spark side does
    "multimodal_phash_pairs" ->
      """WITH docs0 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000000000 AS doc_id,
        |    text || ' ' || chr(233) || chr(10003) AS text
        |  FROM documents WHERE doc_id % 101 = 0 AND text IS NOT NULL),
        |docs2 AS (
        |  SELECT doc_id, text FROM docs0 WHERE strlen(text) > 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000000 AS doc_id, text FROM docs0
        |  WHERE doc_id % 97 = 0 AND strlen(text) > 0),
        |hxt AS (SELECT doc_id, hex(encode(text)) AS hxs,
        |    CAST(strlen(text) AS BIGINT) AS blen FROM docs2),
        |s AS (SELECT doc_id, j,
        |   CAST(('0x' || substring(hxs,
        |     CAST(2 * ((j * blen) // 60) + 1 AS INT), 2)) AS BIGINT) AS v
        |  FROM hxt, unnest(range(0, 60)) AS u(j)),
        |h AS (SELECT doc_id,
        |   CAST(sum(CASE WHEN v * 60 > sv THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
        |            ELSE 0 END) AS BIGINT) AS ph
        |  FROM (SELECT doc_id, j, v, sum(v) OVER (PARTITION BY doc_id) AS sv FROM s)
        |  GROUP BY doc_id),
        |b AS (SELECT doc_id, ph, k AS band, (ph >> CAST(15 * k AS INT)) & 32767 AS chunk
        |  FROM h, unnest(range(0, 4)) AS u(k)),
        |hot AS (SELECT band, chunk FROM b GROUP BY band, chunk HAVING count(*) > 500),
        |kept AS (SELECT * FROM b ANTI JOIN hot USING (band, chunk)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    a.ph AS ph_a, c.ph AS ph_b
        |  FROM kept a JOIN kept c ON a.band = c.band AND a.chunk = c.chunk
        |   AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
