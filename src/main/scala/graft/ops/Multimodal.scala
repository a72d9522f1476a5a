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

  // ---- resize / feature-extract / frame-sample ----------------------
  // The remaining media stages a training-data pipeline needs. Like
  // decode, the codec kernel is a deterministic md5-arithmetic stub
  // (no image libs in this container) while the Spark plumbing —
  // binary-in/binary-out typed mapPartitions, 1→k frame explosion,
  // embedding production feeding the similarity ops — is the
  // production shape, and every stub value is recomputable in SQL so
  // the driver hash-checks all three end-to-end.

  /** Resized image row: new payload bytes + target dims. */
  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte], payload_md5: String)

  /** Resize stage: payload → payload at (w × h). Stub "resampler":
    * resized bytes = unhex(md5(doc_id|WxH) × 3) (48 bytes); a real
    * implementation swaps only the kernel line for a codec call. */
  def resize(documents: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents).as[MediaBlob].mapPartitions(_.map { blob =>
      val hex = graft.functions.TextKernels.md5Hex(s"${blob.doc_id}|${w}x$h") * 3
      val bytes = hexToBytes(hex)
      ResizedMedia(blob.doc_id, w, h, bytes,
        graft.functions.TextKernels.md5Hex(hex))
    })
  }

  /** Feature row: one embedding component (exploded for the oracle;
    * `featureVectors` returns the array form the ANN ops consume). */
  case class MediaFeature(doc_id: Long, i: Int, v: Int)

  /** Feature-extraction stage: payload → dense embedding. Stub
    * "model": component i = int(md5(doc_id|e<i>)[0:4]) — a real
    * implementation batches payloads through a vision model per
    * partition (amortized model load, exactly this mapPartitions
    * shape). Emitted as integer components; callers scale/round
    * relationally so engines agree bit-for-bit. */
  def extractFeatures(documents: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents).as[MediaBlob].mapPartitions(_.flatMap { blob =>
      (0 until dim).iterator.map { i =>
        val h4 = graft.functions.TextKernels.md5Hex(s"${blob.doc_id}|e$i").substring(0, 4)
        MediaFeature(blob.doc_id, i, Integer.parseInt(h4, 16) % 1000)
      }
    })
  }

  /** Embedding-array form: (doc_id, embedding: array<float>) — plugs
    * straight into Similarity.bruteForceTopK / lshTopK. */
  def featureVectors(documents: DataFrame, dim: Int = 64): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    extractFeatures(documents, dim)
      .groupByKey(_.doc_id)
      .mapGroups { (id, rows) =>
        val arr = new Array[Float](dim)
        rows.foreach(f => arr(f.i) = f.v / 1000.0f)
        (id, arr)
      }
      .toDF("doc_id", "embedding")
  }

  /** One sampled frame of a (stub) video payload. */
  case class MediaFrame(doc_id: Long, frame_idx: Int, payload: Array[Byte], frame_md5: String)

  /** Frame-sampling stage: one video payload → `k` frame payloads
    * (1→k flatMap with ordered indices — the real shape for ffmpeg
    * keyframe extraction per partition). Stub frame: unhex(md5(
    * doc_id|f<idx>)), 16 bytes. */
  def sampleFrames(documents: DataFrame, k: Int = 4): Dataset[MediaFrame] = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents).as[MediaBlob].mapPartitions(_.flatMap { blob =>
      (0 until k).iterator.map { idx =>
        val hex = graft.functions.TextKernels.md5Hex(s"${blob.doc_id}|f$idx")
        MediaFrame(blob.doc_id, idx, hexToBytes(hex),
          graft.functions.TextKernels.md5Hex(hex))
      }
    })
  }

  private def hexToBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }
}
