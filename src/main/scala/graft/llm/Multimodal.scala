package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension set, SURVEY.md §2.3):
  * media payloads ride as opaque `binary` columns (the reference's `bytea`
  * mapping, `pyopenetl/operations.py:253`) with typed metadata alongside.
  *
  * The decode step is where a real pipeline calls an image/audio codec over
  * row batches; this container has no codec libraries, so [[fakeDecode]] is
  * a clearly-marked deterministic stand-in. Everything around it — the
  * binary schema, the typed-batch `mapPartitions` shape (one decoder
  * instance per partition, streaming iterator, no per-row setup), the
  * metadata struct — is the real plumbing and is exercised end-to-end.
  */
object Multimodal extends QueryModule {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, sha256: String,
                       format: String, width: Long, height: Long)

  /** STUB: deterministic fake decoder. A real implementation would hand the
    * bytes to a codec (e.g. image decode → dimensions); the fake derives
    * metadata from the payload alone so tests and oracles stay exact.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md  = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val len = payload.length.toLong
    val fmt = (len % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, len, hex, fmt, len % 640 + 1, len % 480 + 1)
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
      it.map(m => fakeDecode(m.doc_id, m.payload))
    }.toDF()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata extraction through the typed batch path.
    "q41_multimodal_meta" -> { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      decodeMeta(media).orderBy("doc_id")
    })

  override def oracles: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
        |    SHA256(text) AS sha256
        |  FROM documents)
        |SELECT doc_id, byte_len, sha256,
        |  CASE byte_len % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format,
        |  byte_len % 640 + 1 AS width,
        |  byte_len % 480 + 1 AS height
        |FROM m ORDER BY doc_id""".stripMargin)
}
