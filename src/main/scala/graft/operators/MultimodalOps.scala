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
  * computable by the DuckDB oracle without a blob parser. Only the deep
  * pixel decode is stubbed. At scale this runs one decoder instance per
  * partition (`mapPartitions`, amortized codec init), never per row.
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
    * to the UTF-8 text bytes. Pure codegen'd expressions. */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
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

  /** STUB deep decoder: stands in for pixel/sample decoding (no codecs in
    * this container). A real deployment replaces only this function. */
  private def decodePixelsStub(payload: Array[Byte]): Unit = ()

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
        decodePixelsStub(payload)
        MediaMeta(id, payload.length.toLong, w.toLong, h.toLong, f.toLong)
      }
    }
    meta.toDF().orderBy(col("doc_id"))
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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> mediaMeta,
    "multimodal_frame_sample" -> frameSample,
    "multimodal_bytes" -> mediaBytes,
  )

  // The oracle recomputes the header fields arithmetically (it has no blob
  // parser); a hash match therefore proves the Spark side round-tripped
  // them through real bytes correctly.
  override val oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        | 18 + CAST(strlen(text) AS BIGINT) AS n_bytes,
        | 64 + doc_id % 1856 AS width,
        | 64 + (doc_id * 7) % 1016 AS height,
        | 1 + doc_id % 60 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, 1 + doc_id % 60 AS n_frames,
        | unnest(range(0, CAST(1 + doc_id % 60 AS BIGINT), 10)) AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_bytes" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        | length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
