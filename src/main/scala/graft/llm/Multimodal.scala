package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension set, SURVEY.md §2.3):
  * media payloads ride as opaque `binary` columns (the reference's `bytea`
  * mapping, `pyopenetl/operations.py:253`) with typed metadata alongside.
  *
  * The decode step is a real header decoder ([[MediaCodec]]): container
  * format and pixel dimensions parsed from the payload's leading bytes
  * (PNG IHDR / JPEG SOF / GIF screen descriptor), plus content hash and
  * byte length. It runs through the typed-batch `mapPartitions` shape —
  * one decoder scope per partition, streaming iterator, no per-row setup —
  * which is exactly where a full pixel codec would slot in at 100 TB.
  */
object Multimodal extends QueryModule {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, sha256: String,
                       format: String, width: Long, height: Long)

  /** Decode one payload: content hash + header sniff ([[MediaCodec]]). */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md  = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val s   = MediaCodec.sniff(payload)
    MediaMeta(docId, payload.length.toLong, hex, s.format, s.width, s.height)
  }

  /** Batch-shaped decode: one pass per partition over a streaming iterator —
    * the Scala analog of a pandas-batch UDF, keeping per-partition (not
    * per-row) decoder setup.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, buffers)
      it.map(m => decode(m.doc_id, m.payload))
    }.toDF()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata extraction through the typed batch path.
    // The fixture payloads are text bytes, so the sniffer classifies every
    // row as opaque `bin` with 0x0 dimensions — the oracle states exactly
    // that; the image-header paths are ScalaTest-covered with real
    // PNG/JPEG/GIF header bytes (MultimodalSpec).
    "q41_multimodal_meta" -> { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      decodeMeta(media).orderBy("doc_id")
    })

  override def oracles: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
        |  SHA256(text) AS sha256,
        |  'bin' AS format,
        |  CAST(0 AS BIGINT) AS width,
        |  CAST(0 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
