package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved text+media training-record assembly — the downstream
  * consumer of the crawl's span schema (`BASELINE.json` input_hint:
  * `doc_id, spans:array<struct<kind,text,media_ref,offset>>`, the
  * shape `LeafPipeline` writes; reference record layout
  * `zhwiki_leafs.py` `get_zhwiki_contents` ordered span list).
  *
  * A multimodal pretraining pipeline (MMC4/OBELICS-style) takes those
  * documents, resolves each media span against the fetched media store,
  * prices images in patch tokens and text in whitespace tokens, and
  * packs whole documents into fixed-budget training sequences. The ops
  * here do exactly that, Spark-first:
  *
  *   - `spanize` — DETERMINISTIC generator of a span table of exactly
  *     the input_hint shape from the driver's flat `documents` table
  *     (chunk the text, interleave synthetic image refs), so the
  *     assembly ops are oracle-checkable at small scale with no
  *     external data. At 100 TB the real input is the crawl `docs`
  *     table itself — `assemble` consumes either.
  *   - `mediaStore` — deterministic stand-in for the fetched media
  *     table (payload = unhex(md5(ref)×4), same stub family as
  *     `Multimodal.withPayload`); ~1/16 of refs are deliberately
  *     absent to exercise the missing-media accounting.
  *   - `assemble` — spans ⋈ media → one row per document: span/token
  *     accounting (text tokens + ViT-style 16×16 patch tokens) and an
  *     order-sensitive content fingerprint.
  *   - `packRecords` — greedy fixed-budget sequence packing over the
  *     assembled records (`Sampling.packSequences`' shard/offset rule,
  *     priced in multimodal tokens).
  *
  * Scale shape: spanize/mediaStore are zero-shuffle scan-side
  * projections (dense offsets come from a closed form, not a window;
  * crawl spans already carry offsets). assemble is one explode,
  * one equi-join on media_ref (media store ≪ corpus → AQE broadcast;
  * else a co-partitioned shuffle join), and one groupBy(doc_id) — the
  * single corpus-sized exchange. packRecords adds one shard-partitioned
  * window, parallel across shards. No collects, no cartesian products.
  */
object Interleave {

  /** Tokens per text span in the synthetic spanization. */
  val ChunkTokens = 8

  /** Record separator for the content fingerprint (cannot occur in
    * whitespace-tokenized text). */
  private val Sep = "\u0001"

  /** Field separator WITHIN a span's fingerprint piece (U+0002 — like
    * [[Sep]], cannot occur in whitespace-tokenized text). */
  private val FieldSep = "\u0002"

  /** Deterministic span table of exactly the north-rule FLAT shape
    * `(doc_id, offset, kind, text, media_ref)` from the driver's
    * `documents` table: the text is chunked into `ChunkTokens`-token
    * spans, and after chunk `c` an image span with ref
    * `media://<doc_id>/<c>` is interleaved whenever
    * `c % 3 == doc_id % 3` (so every doc interleaves ~⅓ images at
    * doc-dependent positions). Offsets are dense per document in
    * interleave order, computed in CLOSED FORM (text chunk c sits at
    * c + the count of media spans before it, which is
    * `floor((c - r - 1)/3) + 1` for `c > r = doc_id % 3`, else 0) —
    * the whole generator is a zero-shuffle scan-side projection, no
    * row_number window. Mirrored verbatim in the `ix_spans` oracle
    * SQL; the dense-offset property and the interleave order are
    * pinned by the scalar-reference spec. */
  def spanizeFlat(documents: DataFrame): DataFrame = {
    // r6: ONE typed flatMap pass. The declarative chunker inlined
    // `filter(split(text))` into the slice lambda (no CSE inside
    // lambdas — the re-split ran once per chunk position), and the
    // text/media union branches re-evaluated the whole explode subtree
    // each, so every consumer scanned + exploded `documents` twice.
    // The kernel tokenizes once and emits both span kinds in one
    // emission; offsets follow the SAME closed form (running
    // media-before counter ≡ floor((c - r - 1)/3) + 1 for c > r, else
    // 0), so the output set is identical to the declarative form the
    // ix_spans oracle mirrors.
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val w = graft.functions.TextKernels.words(t)
        val nChunks = math.max(1, (w.length + ChunkTokens - 1) / ChunkTokens)
        val r = (id % 3).toInt
        val out = new scala.collection.mutable.ArrayBuffer[
          (Long, Int, String, String, String)](nChunks + nChunks / 3 + 2)
        var mb = 0
        var c = 0
        while (c < nChunks) {
          val start = c * ChunkTokens
          val chunk =
            if (w.length == 0) ""
            else {
              val end = math.min(start + ChunkTokens, w.length)
              val sb = new java.lang.StringBuilder
              var j = start
              while (j < end) {
                if (j > start) sb.append(' ')
                sb.append(w(j))
                j += 1
              }
              sb.toString
            }
          out += ((id, c + mb, "text", chunk, ""))
          if (c % 3 == r) {
            out += ((id, c + mb + 1, "image", "", s"media://$id/$c"))
            mb += 1
          }
          c += 1
        }
        out
      }
      .toDF("doc_id", "offset", "kind", "text", "media_ref")
  }

  /** The nested north-rule form `(doc_id, spans:array<struct<kind,text,
    * media_ref,offset>>)` — the exact input_hint schema. */
  def spanize(documents: DataFrame): DataFrame =
    spanizeFlat(documents)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(
        col("offset"), col("kind"), col("text"), col("media_ref"))))
        .as("raw"))
      .select(col("doc_id"),
        transform(col("raw"), s => struct(
          s("kind").as("kind"), s("text").as("text"),
          s("media_ref").as("media_ref"), s("offset").as("offset"))).as("spans"))

  /** Explode the nested input_hint shape back to the flat span table
    * `assemble` consumes — array order is authoritative when offsets
    * are absent-equivalent (crawl docs carry them; this keeps both). */
  def flatten(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"))

  /** Deterministic fetched-media store for a span table: one row per
    * distinct media_ref that "fetched ok" — refs whose md5 starts with
    * 'f' (1/16) are absent, standing in for fetch failures. Carries the
    * decode-stub metadata (`Multimodal.decodeBytes` on the md5-derived
    * payload: width = 64 + b0 % 192, height = 64 + b1 % 192 where
    * b0/b1 are the first two payload bytes = the first two md5 bytes)
    * and the payload content hash the fingerprint uses. Scan-side +
    * one distinct on the exploded refs. */
  def mediaStore(spansFlat: DataFrame): DataFrame = {
    val h = md5(col("media_ref"))
    spansFlat
      .filter(col("kind") === "image")
      .select("media_ref").distinct()
      .withColumn("h", h)
      .filter(substring(col("h"), 1, 1) =!= "f")
      .select(col("media_ref"),
        col("h").as("payload_md5"),
        (lit(64) + conv(substring(col("h"), 1, 2), 16, 10).cast("int") % 192).as("width"),
        (lit(64) + conv(substring(col("h"), 3, 2), 16, 10).cast("int") % 192).as("height"))
  }

  /** Media store derived from the CRAWL's own fetched media table
    * (`LeafPipeline.fetchMedia` output: doc_id, wiki_url, payload,
    * status, …): status='ok' rows → `(media_ref, payload_md5, width,
    * height)` — the resolution shape [[assemble]] consumes, so the
    * engine's crawl output feeds its training-record assembly directly
    * (docs spans' media_ref IS the media table's wiki_url). One typed
    * partition-local pass: real payload bytes hashed and decoded
    * (decode = the `Multimodal.decodeBytes` stub; swap for a codec,
    * nothing else changes). */
  def crawlMediaStore(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("status") === "ok")
      .select(col("wiki_url"), col("payload"))
      .dropDuplicates("wiki_url")
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (ref, payload) =>
          val (w, h, _, _) = Multimodal.decodeBytes(payload)
          md.reset()
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          (ref, hex, w, h)
        }
      }
      .toDF("media_ref", "payload_md5", "width", "height")
  }

  /** ViT-style patch pricing: ceil(w/16) * ceil(h/16) tokens. */
  private def patchTokens(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
    (ceil(w / 16.0) * ceil(h / 16.0)).cast("long")

  /** Assemble interleaved training records: one row per document with
    * span counts, missing-media count, text/patch/total token prices,
    * and an ORDER-SENSITIVE content fingerprint (md5 over the spans'
    * canonical pieces, joined by U+0001 in offset order; each piece is
    * the span's FULL identity `kind ⊕ text ⊕ media_ref ⊕ resolved`
    * joined by U+0002, where `resolved` is the media payload hash for
    * resolved images, "∅" for missing ones, "" for non-image spans).
    * Two docs assemble to the same fingerprint iff their span
    * sequences are equal as (kind, text, media_ref, order) tuples —
    * the north rule's per-row invariant, as a column — AND their
    * resolved media contents agree.
    *
    * Only `kind='image'` spans resolve against the media store — the
    * same rule the crawl's own media fetch applies
    * (`LeafPipeline.fetchMedia`); every OTHER kind (text, and the
    * crawl's toc/thumb/info/link spans) is text-priced on its `text`
    * content, so the full six-kind crawl span vocabulary assembles
    * without loss.
    *
    * Plan: media-span slice left-joins the store on media_ref
    * (broadcast under AQE when the store is small; co-partitioned
    * shuffle otherwise — text-like spans NEVER shuffle on the
    * degenerate empty media_ref key), unions back the text slice, then
    * one groupBy(doc_id). */
  def assemble(spansFlat: DataFrame, media: DataFrame): DataFrame = {
    val mediaSide = spansFlat.filter(col("kind") === "image")
      .join(media, Seq("media_ref"), "left")
      .select(col("doc_id"), col("offset"), col("kind"),
        concat_ws(FieldSep, col("kind"), coalesce(col("text"), lit("")),
          coalesce(col("media_ref"), lit("")),
          coalesce(col("payload_md5"), lit("∅"))).as("piece"),
        lit(0L).as("text_toks"),
        coalesce(patchTokens(col("width"), col("height")), lit(0L)).as("patch_toks"),
        when(col("payload_md5").isNull, 1L).otherwise(0L).as("missing"))
    val textSide = spansFlat.filter(col("kind") =!= "image")
      .select(col("doc_id"), col("offset"), col("kind"),
        concat_ws(FieldSep, col("kind"), coalesce(col("text"), lit("")),
          coalesce(col("media_ref"), lit("")), lit("")).as("piece"),
        size(TextDedup.tokens(col("text"))).cast("long").as("text_toks"),
        lit(0L).as("patch_toks"), lit(0L).as("missing"))
    textSide.unionAll(mediaSide)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("kind") === "text", 1L).otherwise(0L)).as("n_text"),
        sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_media"),
        sum("missing").as("n_missing"),
        sum("text_toks").as("text_tokens"),
        sum("patch_toks").as("patch_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("offset"), col("piece")))),
            s => s("piece")), Sep)).as("content_md5"))
      .withColumn("total_tokens", col("text_tokens") + col("patch_tokens"))
  }

  /** `assemble` over the nested input_hint shape. */
  def assembleDocs(docs: DataFrame, media: DataFrame): DataFrame =
    assemble(flatten(docs), media)

  /** Greedy fixed-budget packing of assembled records into training
    * sequences — `Sampling.packSequences`' deterministic shard/offset
    * rule priced in multimodal `total_tokens`: records are routed to
    * `nShards` shards by doc_id hash, laid out in doc_id order, and a
    * record starts the bin its cumulative start offset falls in. The
    * only orderBy is per shard partition — at cluster scale every
    * executor packs its shards independently, one exchange total. */
  def packRecords(records: DataFrame, maxTokens: Int = 512, nShards: Int = 8): DataFrame =
    Sampling.packBy(records, col("total_tokens"), maxTokens, nShards)
      .withColumnRenamed("n_toks", "total_tokens")

  /** Per-sequence manifest: how many docs and tokens each packed
    * training sequence holds (the shard/bin grain a data loader reads). */
  def packManifest(records: DataFrame, maxTokens: Int = 512, nShards: Int = 8): DataFrame =
    packRecords(records, maxTokens, nShards)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("total_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"))
}
