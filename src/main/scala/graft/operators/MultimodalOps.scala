package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time inside partitions.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): it derives deterministic fake dimensions from the
  * payload bytes. Everything around it — the binary column, the typed
  * row shape, partition-local batch processing via `mapPartitions`, and
  * the downstream relational ops over extracted metadata — is the real
  * Spark plumbing a decode UDF would plug into. At scale this runs one
  * decoder instance per partition (amortized init), never per row.
  */
object MultimodalOps extends QueryPack {

  /** Extracted media metadata row. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, content_hash: Long)

  /** STUB decoder: stands in for e.g. JPEG/PNG header parsing. Derives
    * deterministic pseudo-dimensions from payload bytes. A real deployment
    * replaces only this function body. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    val frames = 1 + math.floorMod(h >> 20, 64)
    (w, ht, frames)
  }

  /** Binary ingest → per-partition batch "decode" → typed metadata table
    * → relational agg over the extracted fields. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
    val meta = bin.mapPartitions { rows =>
      // one decoder per partition (init cost amortized, like a codec ctx)
      rows.map { case (id, payload) =>
        val (w, h, f) = decodeStub(payload)
        MediaMeta(id, payload.length.toLong, w, h, f,
          scala.util.hashing.MurmurHash3.bytesHash(payload, 42).toLong)
      }
    }
    meta.toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling plan over the stubbed decode: every 10th frame index —
    * the explode shape a video pipeline produces (doc × frame rows). */
  def frameSample(s: SparkSession, d: String): DataFrame =
    mediaMeta(s, d)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Payload byte accounting — the one slice of the multimodal pipeline
    * that IS oracle-checkable despite the stubbed decode: the UTF-8
    * payload length must equal DuckDB's byte length of the same text. */
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

  override val oracle: Map[String, String] = Map(
    "multimodal_bytes" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        | length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
