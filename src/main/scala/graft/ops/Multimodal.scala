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

  /** STUB decoder — deterministic fake for the absent codec. Reads the
    * payload "header": width/height from bytes 0-1, format from byte 2.
    * A real implementation would hand `blob.payload` to a decoder here;
    * the signature (bytes in, typed meta out, partition-local, no
    * driver involvement) is exactly what the real one needs. */
  def decodeStub(blob: MediaBlob): MediaMeta = {
    val b0 = blob.payload(0) & 0xff
    val b1 = blob.payload(1) & 0xff
    val b2 = blob.payload(2) & 0xff
    val fmt = (b2 % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    MediaMeta(blob.doc_id, 64 + b0 % 192, 64 + b1 % 192, fmt, blob.payload.length)
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
