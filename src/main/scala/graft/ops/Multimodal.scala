package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata extracted by a partition-local decode stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub (reads header bytes of the payload); everything
  * around it — schema, binary column handling, typed Dataset encoders,
  * mapPartitions batching, partition-level parallelism — is the real
  * production shape. Swapping `decodeStub` for a JNI/codec call changes
  * nothing structurally.
  */
object Multimodal {

  /** One media row: opaque payload + source doc. */
  case class MediaBlob(doc_id: Long, payload: Array[Byte])

  /** Typed metadata produced by the decode stage. */
  case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String, n_bytes: Int)

  /** Synthesize a deterministic binary payload per document: the md5 of
    * the doc_id repeated 4× (64 bytes), via unhex — stands in for real
    * image bytes while staying oracle-reproducible. */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      unhex(repeat(md5(col("doc_id").cast("string")), 4)).as("payload"))

  /** STUB byte decoder — deterministic fake for the absent codec. Reads
    * the payload "header": width/height from bytes 0-1, format from
    * byte 2. A real implementation would hand the bytes to a codec here;
    * the signature (bytes in, typed meta out, partition-local, no
    * driver involvement) is exactly what the real one needs. */
  def decodeBytes(payload: Array[Byte]): (Int, Int, String, Int) = {
    val b0 = payload(0) & 0xff
    val b1 = payload(1) & 0xff
    val b2 = payload(2) & 0xff
    val fmt = (b2 % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    (64 + b0 % 192, 64 + b1 % 192, fmt, payload.length)
  }

  def decodeStub(blob: MediaBlob): MediaMeta = {
    val (w, hh, fmt, n) = decodeBytes(blob.payload)
    MediaMeta(blob.doc_id, w, hh, fmt, n)
  }

  /** Metadata row decoded from a crawl `media`-table payload. */
  case class CrawlMediaMeta(
      wiki_url: String, width: Int, height: Int, format: String, n_bytes: Int)

  /** Decode the CRAWL media table (LeafPipeline.fetchMedia output): real
    * fetched payload bytes, not synthesized ones. Only status='ok' rows
    * carry a payload; the decode is the same partition-local typed
    * stage as decodeMeta. */
  def decodeMediaTable(media: DataFrame): Dataset[CrawlMediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("status") === "ok")
      .select(col("wiki_url"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, payload) =>
        val (w, h, fmt, n) = decodeBytes(payload)
        CrawlMediaMeta(url, w, h, fmt, n)
      })
  }

  /** Decode stage: typed Dataset + mapPartitions so a real decoder can
    * amortize per-partition init (model load, codec context) across the
    * batch — the Scala analogue of a pandas `mapInPandas` batch UDF. */
  def decodeMeta(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(documents)
      .as[MediaBlob]
      .mapPartitions { it => it.map(decodeStub) }
  }

  /** Relational surface over the decode stage (oracle-checkable: the
    * stub's arithmetic is reproducible from md5 hex digits in SQL). */
  def mediaMeta(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeMeta(spark, documents).toDF()
}
