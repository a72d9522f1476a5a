package graft.ops

import graft.SparkSpec
import graft.functions.TextKernels.md5Hex
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Interleaved record assembly vs a scalar Scala reference, plus the
  * north-rule shape pin: `spanize` must emit exactly the BASELINE.json
  * input_hint schema, and `assemble`'s fingerprint must be the
  * order-sensitive span-sequence hash.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // ---- scalar reference implementation --------------------------------

  private case class RefSpan(kind: String, text: String, mediaRef: String)
  private case class RefRec(nSpans: Long, nText: Long, nMedia: Long, nMissing: Long,
      textTokens: Long, patchTokens: Long, contentMd5: String, totalTokens: Long)

  private def refSpans(docId: Long, text: String): Vector[RefSpan] = {
    val toks = text.split(" ").filter(_.nonEmpty).toVector
    val chunks =
      if (toks.isEmpty) Vector("")
      else toks.grouped(Interleave.ChunkTokens).map(_.mkString(" ")).toVector
    chunks.zipWithIndex.flatMap { case (chunk, c) =>
      val t = RefSpan("text", chunk, "")
      if (c % 3 == (docId % 3).toInt) Vector(t, RefSpan("image", "", s"media://$docId/$c"))
      else Vector(t)
    }
  }

  private def refAssemble(spans: Vector[RefSpan]): RefRec = {
    val pieces = spans.map { s =>
      val resolved =
        if (s.kind != "image") ""
        else {
          val h = md5Hex(s.mediaRef)
          if (h.charAt(0) == 'f') "∅" else h
        }
      Seq(s.kind, s.text, s.mediaRef, resolved).mkString("\u0002")
    }
    val patch = spans.filter(_.kind == "image").map { s =>
      val h = md5Hex(s.mediaRef)
      if (h.charAt(0) == 'f') 0L
      else {
        val w = 64 + Integer.parseInt(h.substring(0, 2), 16) % 192
        val hh = 64 + Integer.parseInt(h.substring(2, 4), 16) % 192
        (math.ceil(w / 16.0) * math.ceil(hh / 16.0)).toLong
      }
    }.sum
    val textToks = spans.filter(_.kind == "text")
      .map(_.text.split(" ").count(_.nonEmpty).toLong).sum
    RefRec(spans.size.toLong,
      spans.count(_.kind == "text").toLong,
      spans.count(_.kind == "image").toLong,
      spans.count(s => s.kind == "image" && md5Hex(s.mediaRef).charAt(0) == 'f').toLong,
      textToks, patch,
      md5Hex(pieces.mkString("\u0001")),
      textToks + patch)
  }

  // ---- specs ----------------------------------------------------------

  test("spanize emits exactly the input_hint nested schema") {
    val schema = Interleave.spanize(docs).schema
    schema("spans").dataType match {
      case ArrayType(s: StructType, _) =>
        assert(s.fields.map(_.name).toSeq ===
          Seq("kind", "text", "media_ref", "offset"))
        assert(s.fields.map(_.dataType).toSeq ===
          Seq(StringType, StringType, StringType, IntegerType))
      case other => fail(s"spans is not array<struct>: $other")
    }
  }

  test("spanizeFlat matches the scalar spanization (kind, text, media_ref, order)") {
    val got = Interleave.spanizeFlat(docs)
      .as[(Long, Int, String, String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => RefSpan(r._3, r._4, r._5)).toVector).toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> refSpans(id, t) }.toMap
    assert(got.keySet === want.keySet)
    // per-row span-sequence equality — the north-rule invariant
    want.foreach { case (id, spans) => assert(got(id) === spans, s"doc $id") }
    // offsets dense from 0
    Interleave.spanizeFlat(docs).groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.expr(
        "min(offset) = 0 AND max(offset) = count(*) - 1").as("dense"))
      .select("dense").as[Boolean].collect().foreach(assert(_))
  }

  test("flatten(spanize) round-trips spanizeFlat exactly") {
    val a = Interleave.spanizeFlat(docs)
    val b = Interleave.flatten(Interleave.spanize(docs))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("assemble matches the scalar reference record for every doc") {
    val flat = Interleave.spanizeFlat(docs)
    val got = Interleave.assemble(flat, Interleave.mediaStore(flat))
      .select("doc_id", "n_spans", "n_text", "n_media", "n_missing",
        "text_tokens", "patch_tokens", "content_md5", "total_tokens")
      .as[(Long, Long, Long, Long, Long, Long, Long, String, Long)]
      .collect().map(r => r._1 ->
        RefRec(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9)).toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> refAssemble(refSpans(id, t)) }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, rec) => assert(got(id) === rec, s"doc $id") }
    // the synthetic store drops ~1/16 of refs — accounting must see some
    assert(got.values.map(_.nMissing).sum > 0, "no missing media exercised")
  }

  test("assemble fingerprint is order-sensitive (swapped spans differ)") {
    val spans = Seq(
      (1L, 0, "text", "a b", ""), (1L, 1, "text", "c d", ""),
      (2L, 0, "text", "c d", ""), (2L, 1, "text", "a b", ""))
      .toDF("doc_id", "offset", "kind", "text", "media_ref")
    val recs = Interleave.assemble(spans, Interleave.mediaStore(spans))
      .select("doc_id", "content_md5").as[(Long, String)].collect().toMap
    assert(recs(1L) !== recs(2L))
  }

  test("fingerprint separates spans by kind and by media_ref, not just text") {
    // same text at the same offsets, different KIND (text vs toc) —
    // the piece carries the kind, so the fingerprints must differ
    val byKind = Seq(
      (1L, 0, "text", "a b", ""), (2L, 0, "toc", "a b", ""))
      .toDF("doc_id", "offset", "kind", "text", "media_ref")
    val kindRecs = Interleave.assemble(byKind, Interleave.mediaStore(byKind))
      .select("doc_id", "content_md5").as[(Long, String)].collect().toMap
    assert(kindRecs(1L) !== kindRecs(2L), "kind must be in the fingerprint")
    // same kind+text, different media_ref on a NON-image span — the
    // north rule's tuple includes media_ref for every span kind
    val byRef = Seq(
      (1L, 0, "thumb", "", "media://x/1"), (2L, 0, "thumb", "", "media://x/2"))
      .toDF("doc_id", "offset", "kind", "text", "media_ref")
    val refRecs = Interleave.assemble(byRef, Interleave.mediaStore(byRef))
      .select("doc_id", "content_md5").as[(Long, String)].collect().toMap
    assert(refRecs(1L) !== refRecs(2L),
      "media_ref must be in the fingerprint for non-image spans too")
  }

  test("assembleDocs over the CRAWL's own docs+media tables ≡ scalar recompute") {
    import graft.crawl.{CrawlConfig, FrontierEngine, LeafPipeline, PageStore, WebSpec}
    val store = new PageStore(WebSpec(nCats = 20, nArticles = 40))
    val cfg = CrawlConfig(workDir = tmpDir("ixcrawl"), useBloom = false)
    val fe = new FrontierEngine(spark, store, cfg)
    fe.run()
    val lp = new LeafPipeline(spark, store, cfg)
    assert(lp.run(LeafPipeline.workList(fe.frontier.read())) > 0)
    assert(lp.fetchMedia() >= 0)

    val docsTable = lp.docs.read()
    val mediaTable = lp.media.read()
    val got = Interleave
      .assembleDocs(docsTable, Interleave.crawlMediaStore(mediaTable))
      .select("doc_id", "n_spans", "n_media", "n_missing",
        "patch_tokens", "content_md5")
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

    // scalar recompute from the two tables' collected rows
    val mediaOk: Map[String, Array[Byte]] = mediaTable
      .filter(org.apache.spark.sql.functions.col("status") === "ok")
      .select("wiki_url", "payload").as[(String, Array[Byte])]
      .collect().toMap
    def md5OfBytes(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    val want = docsTable.selectExpr("doc_id", "spans")
      .as[(String, Seq[(String, String, String, Int)])].collect()
    assert(want.nonEmpty && got.keySet === want.map(_._1).toSet)
    var sawImage = false
    want.foreach { case (id, spans) =>
      val ordered = spans.sortBy(_._4)
      val pieces = ordered.map {
        case ("image", t, ref, _) =>
          sawImage = true
          val resolved = mediaOk.get(ref).map(md5OfBytes).getOrElse("∅")
          Seq("image", t, ref, resolved).mkString("\u0002")
        case (k, t, ref, _) => Seq(k, t, ref, "").mkString("\u0002")
      }
      val patch = ordered.collect { case ("image", _, ref, _) =>
        mediaOk.get(ref).map { b =>
          val (w, h, _, _) = Multimodal.decodeBytes(b)
          (math.ceil(w / 16.0) * math.ceil(h / 16.0)).toLong
        }.getOrElse(0L)
      }.sum
      val (_, nSpans, nMedia, nMissing, patchToks, md5) = got(id)
      assert(nSpans === ordered.size.toLong, s"$id n_spans")
      assert(nMedia === ordered.count(_._1 == "image").toLong, s"$id n_media")
      assert(nMissing ===
        ordered.count(s => s._1 == "image" && !mediaOk.contains(s._3)).toLong,
        s"$id n_missing")
      assert(patchToks === patch, s"$id patch_tokens")
      assert(md5 === md5Hex(pieces.mkString("\u0001")), s"$id content_md5")
    }
    assert(sawImage, "crawl produced no image spans — test vacuous")
  }

  test("packRecords obeys the greedy offset rule and conserves tokens") {
    val flat = Interleave.spanizeFlat(docs)
    val recs = Interleave.assemble(flat, Interleave.mediaStore(flat))
    val packed = Interleave.packRecords(recs, maxTokens = 512)
      .select("doc_id", "shard", "total_tokens", "bin")
      .as[(Long, Int, Long, Long)].collect()
    assert(packed.map(_._3).sum ===
      recs.agg(org.apache.spark.sql.functions.sum("total_tokens"))
        .as[Long].head())
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, toks, bin) =>
        assert(bin === cum / 512, s"doc $id start-offset bin")
        cum += toks
      }
    }
    val manifest = Interleave.packManifest(recs, maxTokens = 512)
      .select("n_docs", "seq_tokens").as[(Long, Long)].collect()
    assert(manifest.map(_._1).sum === packed.length.toLong)
  }
}
