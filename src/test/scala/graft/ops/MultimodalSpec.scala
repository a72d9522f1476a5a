package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Media-stage plumbing: the codec kernels are deterministic stubs, but
  * the Spark shapes (binary in/out, 1→k frame explosion, embedding
  * production) are production-real — these specs pin determinism,
  * schema, and the composition into the similarity ops.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(1L, 2L, 3L, 10L).toDF("doc_id")
    .withColumn("text", lit("x"))

  test("resize: deterministic payload bytes, md5 matches bytes, target dims") {
    val rows = Multimodal.resize(docs, 128, 128).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.width == 128 && r.height == 128)
      assert(r.payload.length == 48)
      // payload_md5 is the md5 of the hex form the payload was built from
      val hex = r.payload.map(b => f"${b & 0xff}%02x").mkString
      assert(r.payload_md5 == graft.functions.TextKernels.md5Hex(hex))
    }
    // determinism across runs/partitionings
    val again = Multimodal.resize(docs.repartition(3), 128, 128)
      .collect().map(r => r.doc_id -> r.payload_md5).toMap
    assert(rows.map(r => r.doc_id -> r.payload_md5).toMap == again)
  }

  test("extractFeatures/featureVectors: 64 components per doc, array form feeds ANN") {
    val feats = Multimodal.extractFeatures(docs).collect()
    assert(feats.length == 4 * 64)
    assert(feats.forall(f => f.v >= 0 && f.v < 1000))

    val vecs = Multimodal.featureVectors(docs)
    val arr = vecs.as[(Long, Array[Float])].collect().toMap
    assert(arr.keySet == Set(1L, 2L, 3L, 10L))
    assert(arr.values.forall(_.length == 64))
    // component parity with the row form
    val byDoc = feats.groupBy(_.doc_id)
    arr.foreach { case (id, a) =>
      byDoc(id).foreach(f => assert(a(f.i) == f.v / 1000.0f))
    }

    // composition: the embeddings plug into the ANN operator directly
    val emb = vecs.withColumnRenamed("doc_id", "vec_id")
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 2)
    assert(topk.count() == 2)
  }

  test("sampleFrames: ordered 1→k explosion with deterministic frame bytes") {
    val frames = Multimodal.sampleFrames(docs, 4).collect()
    assert(frames.length == 16)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.forall(_.payload.length == 16))
      // distinct frames per doc
      assert(fs.map(_.frame_md5).distinct.length == 4)
    }
  }
}
