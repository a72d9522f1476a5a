package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables._
import graft.ops.{CorpusPipeline, DedupGraph, Interleave, Multimodal, Relational, Sampling, Similarity, TextAnalysis, TextDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one implemented operator class from
  * SURVEY.md §2 (or a training-pipeline op), expressed over the driver's
  * test tables; `oracleSql` holds the DuckDB-equivalent ANSI SQL the
  * driver runs on the same parquet files. Column names are aliased
  * identically on both sides (the compare hashes by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoinAgg(
      orders(spark, "/root/testdata/sf0.001"),
      customer(spark, "/root/testdata/sf0.001"),
      nation(spark, "/root/testdata/sf0.001"),
      region(spark, "/root/testdata/sf0.001")
    )

  private val keywords = Seq("red", "blue", "green")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg" -> ((s, d) => Relational.groupedAgg(lineitem(s, d))),
    "q_filter_project" -> ((s, d) => Relational.filterProject(lineitem(s, d))),
    "q_count_distinct" -> ((s, d) => Relational.countDistinctByKey(lineitem(s, d))),
    // HLL sketches differ across engines, so the query emits exact
    // counts + Spark-side within-5% booleans — fully hash-comparable
    "q_approx_distinct" -> ((s, d) => Relational.approxDistinctChecked(lineitem(s, d))),
    "q_group_first" -> ((s, d) => Relational.groupFirst(orders(s, d))),
    "q_anti_join" -> ((s, d) => Relational.antiJoin(customer(s, d), orders(s, d))),
    "q_semi_join" -> ((s, d) => Relational.semiJoin(part(s, d), lineitem(s, d))),
    "q_star_join" -> ((s, d) =>
      Relational.starJoinAgg(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "q_union_distinct" -> ((s, d) => Relational.unionDistinct(customer(s, d), supplier(s, d))),
    "q_keyword_filter" -> ((s, d) => Relational.keywordFilter(part(s, d), keywords)),
    "q_topk_window" -> ((s, d) => Relational.topKPerGroup(customer(s, d), 3)),
    "q_events_tumbling" -> ((s, d) => Relational.eventsTumbling(events(s, d))),
    "q_sessionize" -> ((s, d) => Relational.sessionize(events(s, d))),
    // training-data pipeline ops
    "dedup_exact" -> ((s, d) => TextDedup.exactDedup(documents(s, d))),
    "dedup_minhash_sigs" -> ((s, d) => TextDedup.minhashSignatures(documents(s, d))),
    "dedup_minhash_pairs" -> ((s, d) => TextDedup.minhashCandidatePairs(documents(s, d))),
    "dedup_jaccard_pairs" -> ((s, d) => TextDedup.ngramJaccardPairs(documents(s, d), 0.8)),
    "dedup_simhash" -> ((s, d) => TextDedup.simhash(documents(s, d))),
    "dedup_simhash_pairs" -> ((s, d) => TextDedup.simhashPairs(documents(s, d))),
    "dedup_dup_spans" -> ((s, d) => TextDedup.dupSpanFraction(documents(s, d))),
    "dedup_components" -> ((s, d) =>
      DedupGraph.connectedComponents(
        TextDedup.minhashCandidatePairs(documents(s, d)).select("doc_a", "doc_b"))),
    "dedup_survivors" -> ((s, d) =>
      DedupGraph.survivors(documents(s, d),
        TextDedup.minhashCandidatePairs(documents(s, d)).select("doc_a", "doc_b"))),
    // incremental dedup: new batch = top-20 md5 buckets, corpus = rest
    "dedup_incremental_pairs" -> ((s, d) => {
      val docs = documents(s, d)
      val b = Sampling.hashBucket(org.apache.spark.sql.functions.col("doc_id"))
      TextDedup.incrementalMinhashPairs(
        docs.filter(b >= 80),
        TextDedup.minhashBandRows(docs.filter(b < 80)))
    }),
    "dedup_incremental_exact" -> ((s, d) => {
      val docs = documents(s, d)
      val b = Sampling.hashBucket(org.apache.spark.sql.functions.col("doc_id"))
      TextDedup.incrementalExactSurvivors(docs.filter(b >= 80), docs.filter(b < 80))
    }),
    "q_hash_split" -> ((s, d) => Sampling.hashSplit(documents(s, d))),
    "q_hash_sample" -> ((s, d) =>
      Sampling.hashSample(documents(s, d), 10).select("doc_id", "n_chars")),
    "q_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedHashSample(documents(s, d),
          org.apache.spark.sql.functions.col("lang"),
          Map("en" -> 50, "zh" -> 20), defaultPct = 5)
        .select("doc_id", "lang")),
    "q_mixture_sample" -> ((s, d) =>
      Sampling.mixtureSample(documents(s, d),
          org.apache.spark.sql.functions.col("lang"),
          Map("en" -> 0.4, "zh" -> 0.3, "fr" -> 0.2, "de" -> 0.1),
          org.apache.spark.sql.functions.col("n_chars"))
        .select("doc_id", "lang", "n_chars")),
    "q_mixture_epochs" -> ((s, d) =>
      Sampling.mixtureEpochs(documents(s, d),
          org.apache.spark.sql.functions.col("lang"),
          Map("en" -> 0.3, "zh" -> 0.5, "fr" -> 0.2),
          org.apache.spark.sql.functions.col("n_chars"),
          budgetTokens = 200000.0)
        .select("doc_id", "lang", "n_chars", "epoch")),
    "q_shuffle_shards" -> ((s, d) =>
      Sampling.shuffleShards(documents(s, d).select("doc_id"),
          org.apache.spark.sql.functions.col("doc_id"), nShards = 8,
          seed = "epoch0")
        .select("doc_id", "shard", "pos")),
    "q_pack_sequences" -> ((s, d) => Sampling.packSequences(documents(s, d))),
    "text_decontaminate" -> ((s, d) => CorpusPipeline.decontaminate(documents(s, d))),
    "corpus_build" -> ((s, d) => CorpusPipeline.corpusBuild(documents(s, d))),
    "corpus_build_neardup" -> ((s, d) =>
      CorpusPipeline.corpusBuildNearDup(documents(s, d))),
    "text_vocabulary" -> ((s, d) => TextAnalysis.vocabulary(documents(s, d))),
    "corpus_stats" -> ((s, d) => TextAnalysis.corpusStats(documents(s, d))),
    "text_lm_bits" -> ((s, d) => TextAnalysis.unigramLogLoss(documents(s, d))),
    "text_scrub" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, concat, lit}
      // synthetic PII appended deterministically (mirrored in the
      // oracle SQL) so the regex parity check is non-trivial even on a
      // PII-free corpus
      TextAnalysis.scrubPii(documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact doc"), col("doc_id"),
          lit("@example.com or https://h.example/p/"), col("doc_id"))
          .as("text")))
    }),
    "text_langid" -> ((s, d) => TextAnalysis.langId(documents(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(documents(s, d))),
    "text_tokens" -> ((s, d) => TextAnalysis.tokenStats(documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(documents(s, d))),
    "text_repetition" -> ((s, d) => TextAnalysis.repetition(documents(s, d))),
    "emb_cosine_pairs" -> ((s, d) => Similarity.cosinePairs(embeddings(s, d), 0.4)),
    "dedup_semantic_pairs" -> ((s, d) =>
      Similarity.semanticPairs(embeddings(s, d), 0.35)),
    "dedup_semantic_survivors" -> ((s, d) =>
      Similarity.semanticSurvivors(embeddings(s, d), 0.35)),
    "ann_brute_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    }),
    "ann_lsh_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.lshTopK(e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    }),
    "ann_lsh_multiprobe" -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.lshTopKMultiProbe(
        e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    }),
    "ann_lsh_multitable" -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.lshTopKMultiTable(
        e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    }),
    "ann_ivf_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      Similarity.ivfTopK(
        e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    }),
    "media_meta" -> ((s, d) => Multimodal.mediaMeta(s, documents(s, d))),
    "media_resize" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, expr}
      Multimodal.resize(documents(s, d), 128, 128).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("payload_md5"),
          expr("length(payload)").cast("int").as("n_bytes"))
    }),
    "media_features" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, round}
      Multimodal.extractFeatures(documents(s, d)).toDF()
        .select(col("doc_id"), col("i"),
          round(col("v") / 1000.0, 4).as("feat"))
    }),
    "media_frames" -> ((s, d) =>
      Multimodal.sampleFrames(documents(s, d)).toDF()
        .select("doc_id", "frame_idx", "frame_md5")),
    // interleaved text+media record assembly (north-rule span schema)
    "ix_spans" -> ((s, d) => Interleave.spanizeFlat(documents(s, d))),
    "ix_records" -> ((s, d) => {
      val flat = Interleave.spanizeFlat(documents(s, d))
      // goes through the NESTED input_hint shape (spanize → flatten)
      // so the oracle also pins the array round-trip
      Interleave.assembleDocs(
        Interleave.spanize(documents(s, d)), Interleave.mediaStore(flat))
    }),
    "ix_pack" -> ((s, d) => {
      val flat = Interleave.spanizeFlat(documents(s, d))
      Interleave.packManifest(
        Interleave.assemble(flat, Interleave.mediaStore(flat)))
    })
  )

  // ---- shared DuckDB SQL fragments (must mirror the Spark ops above) ----

  /** whitespace tokens, empties dropped */
  private val TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** distinct 3-word shingles over TOKS (as a SQL expression over `w`) */
  private def shinglesSql(w: String) =
    s"""CASE WHEN len($w) >= 3
        THEN list_distinct(list_transform(range(1, len($w)-1),
             i -> array_to_string(($w)[i:i+2], ' ')))
        ELSE [] END"""

  /** one md5 per shingle → 31-bit value → universal hash per k with
    * the SAME coefficient constants as TextDedup.minhashA/B */
  private val minhashSigsSql = {
    val coefRows = (0 until 16).map { k =>
      s"(${k}, ${graft.ops.TextDedup.minhashA(k)}, ${graft.ops.TextDedup.minhashB(k)})"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, ${shinglesSql(TOKS)} AS sh FROM documents),
        hv AS (SELECT doc_id,
                 list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT & 2147483647) AS hs
               FROM d WHERE len(sh) > 0),
        coef(k, a, b) AS (VALUES $coefRows)
        SELECT doc_id, k::INT AS k,
               list_min(list_transform(hs, v -> (v * a + b) % 2147483647)) AS minhash
        FROM hv, coef"""
  }

  /** LSH candidate pairs from the banded minhash signatures — shared by
    * the pairs oracle and the component/survivor closures over it */
  private val minhashPairsSql =
    s"""WITH sigs AS ($minhashSigsSql),
        bands AS (
          SELECT doc_id, (k // 4)::INT AS band,
                 md5(string_agg(minhash::VARCHAR, '|' ORDER BY k)) AS band_hash
          FROM sigs GROUP BY 1, 2)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2"""

  /** incremental dedup split: band join between new (bucket ≥ 80) and
    * corpus (bucket < 80) sides; signatures computed over ALL docs
    * (per-doc, so the split is a pure filter) */
  private val incrementalPairsSql =
    s"""WITH sigs AS ($minhashSigsSql),
        bands AS (
          SELECT doc_id, (k // 4)::INT AS band,
                 md5(string_agg(minhash::VARCHAR, '|' ORDER BY k)) AS band_hash
          FROM sigs GROUP BY 1, 2),
        bk AS (
          SELECT doc_id, band, band_hash,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 AS bucket
          FROM bands)
        SELECT n.doc_id AS doc_new, o.doc_id AS doc_old, count(*) AS n_bands
        FROM bk n JOIN bk o
          ON n.band = o.band AND n.band_hash = o.band_hash
        WHERE n.bucket >= 80 AND o.bucket < 80
        GROUP BY 1, 2"""

  /** transitive closure of the minhash pairs → per-node component min
    * (the recursive CTE is the oracle for large-star/small-star) */
  private val componentsSql =
    s"""mp AS ($minhashPairsSql),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM mp
                  UNION SELECT doc_b, doc_a FROM mp),
        reach(src, dst) AS (
          SELECT u, u FROM edges
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst)"""

  private val dotSql = (a: String, b: String) =>
    s"list_sum(list_transform(range(1, len($a)+1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE))"

  /** IVF cell assignment CTEs (mirrors Similarity.assignIvfCells):
    * pivots = 32 lowest vec_ids, cell = argmax-cosine pivot with the
    * lowest-pivot tie-break via row_number. Yields `e(vec_id,
    * embedding, nrm)` and `cells(vec_id, cell)`. */
  private val ivfCellsSql =
    s"""e AS (SELECT vec_id, embedding,
              sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
        piv AS (SELECT vec_id AS pvt, embedding, nrm FROM e WHERE vec_id < 32),
        pc AS (SELECT e.vec_id, p.pvt,
                ${dotSql("e.embedding", "p.embedding")} / (e.nrm * p.nrm) AS pcos
               FROM e, piv p),
        cellr AS (SELECT vec_id, pvt,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY pcos DESC, pvt ASC) AS r FROM pc),
        cells AS (SELECT vec_id, pvt AS cell FROM cellr WHERE r = 1),
        semj AS (SELECT ca.vec_id AS vec_a, cb.vec_id AS vec_b,
                  ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
                 FROM cells ca JOIN cells cb
                   ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
                 JOIN e a ON a.vec_id = ca.vec_id
                 JOIN e b ON b.vec_id = cb.vec_id)"""

  private val stopwords = TextAnalysis.langProfiles.flatMap(_._2).distinct
  private def inList(v: String, ws: Seq[String]) =
    ws.map(w => s"$v = '$w'").mkString(" OR ")

  /** corpus-build pipeline CTEs (mirror CorpusPipeline.corpusBuild):
    * gates → exact-dedup keeper → decontamination → `base(doc_id,
    * bucket)` = the exact-pipeline survivors. Shared by the
    * corpus_build and corpus_build_neardup oracles. */
  private val corpusBuildCtes = {
    val bucket = "('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100"
    val scores = TextAnalysis.langProfiles.map { case (lang, ws) =>
      s"len(list_filter(tk, t -> ${inList("t", ws)}))::INT AS s_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.langProfiles.map(_._1)
    val pred = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$r")
      val ge = if (rest.size == 1) s"s_$l >= ${rest.head}"
               else s"s_$l >= greatest(${rest.mkString(", ")})"
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"""t AS (
          SELECT doc_id, text, $TOKS AS tk, $bucket AS bucket FROM documents),
        scored AS (SELECT doc_id, text, tk, bucket, $scores FROM t),
        filtered AS (
          SELECT doc_id, text, tk, bucket FROM scored
          WHERE bucket < 98 AND len(tk) >= 10
            AND round(least(len(tk)::DOUBLE / 100.0, 1.0) * 0.5 +
                  (len(list_filter(tk, t -> ${inList("t", stopwords)}))::DOUBLE
                   / len(tk)) * 0.5, 6) >= 0.3
            AND (CASE $pred ELSE '${langs.last}' END) IN ('en', 'zh')),
        bsh AS (
          SELECT DISTINCT unnest(${shinglesSql(TOKS)}) AS s FROM documents
          WHERE $bucket >= 98),
        contam AS (
          SELECT doc_id FROM (
            SELECT f.doc_id, any_value(f.n_sh) AS n_sh, count(*) AS n_hits
            FROM (SELECT doc_id, len(${shinglesSql("tk")}) AS n_sh,
                         unnest(${shinglesSql("tk")}) AS s FROM filtered) f
            JOIN bsh USING (s) GROUP BY f.doc_id)
          WHERE n_hits >= n_sh * 0.5),
        kept AS (
          SELECT doc_id, bucket,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
          FROM filtered),
        base AS (
          SELECT doc_id, bucket FROM kept
          WHERE doc_id = keep_id
            AND doc_id NOT IN (SELECT doc_id FROM contam))"""
  }

  private val splitCaseSql =
    """CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split"""

  def oracleSql: Map[String, String] = Map(
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "q_count_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",
    "q_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts_exact,
         count(DISTINCT l_suppkey) AS n_supps_exact,
         true AS parts_within_5pct,
         true AS supps_within_5pct
         FROM lineitem GROUP BY l_returnflag""",
    "q_group_first" ->
      """SELECT o_custkey, min(o_orderdate) AS first_order, count(*) AS n_orders
         FROM orders GROUP BY o_custkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity >= 49)""",
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL
           SELECT s_nationkey AS nationkey FROM supplier)""",
    "q_keyword_filter" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
         WHERE p_name LIKE '%red%' OR p_name LIKE '%blue%' OR p_name LIKE '%green%'
         GROUP BY p_brand""",
    "q_topk_window" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
           FROM customer) WHERE rnk <= 3""",
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), sess AS (
           SELECT user_id, ts,
                  (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts) AS sess_start, max(ts) AS sess_end
         FROM sess GROUP BY user_id, session_id""",
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS text_hash,
         doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
         FROM documents""",
    "dedup_minhash_sigs" -> minhashSigsSql,
    "dedup_minhash_pairs" -> minhashPairsSql,
    "dedup_components" ->
      s"""WITH RECURSIVE $componentsSql
          SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src""",
    "dedup_survivors" ->
      s"""WITH RECURSIVE $componentsSql,
          comp AS (SELECT src AS doc_id, min(dst) AS component
                   FROM reach GROUP BY src)
          SELECT d.doc_id,
                 coalesce(c.component, d.doc_id) AS component,
                 (c.component IS NULL OR d.doc_id = c.component) AS keep
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""",
    "q_hash_split" ->
      """SELECT doc_id,
              (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100) AS bucket,
              CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 < 90
                     THEN 'train'
                   WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 < 95
                     THEN 'val'
                   ELSE 'test' END AS split
         FROM documents""",
    "q_hash_sample" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 < 10""",
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 <
               CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 20 ELSE 5 END""",
    "q_mixture_sample" ->
      """WITH tot AS (
           SELECT lang AS d, SUM(n_chars) AS toks FROM documents GROUP BY 1
         ),
         tgt(d, f) AS (VALUES ('en', 0.4), ('zh', 0.3), ('fr', 0.2), ('de', 0.1)),
         b AS (
           SELECT MIN(toks / f) AS budget FROM tot JOIN tgt USING (d)
           WHERE f > 0 AND toks > 0
         ),
         r AS (
           SELECT d,
                  CAST(FLOOR(LEAST(1.0, f * budget / toks) * 1000000) AS BIGINT) AS thr
           FROM tot JOIN tgt USING (d) CROSS JOIN b
           WHERE f > 0 AND toks > 0
         )
         SELECT doc_id, lang, n_chars
         FROM documents JOIN r ON r.d = lang
         WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 1000000) < r.thr""",
    "q_mixture_epochs" ->
      """WITH tot AS (
           SELECT lang AS d, SUM(n_chars) AS toks FROM documents GROUP BY 1
         ),
         tgt(d, f) AS (VALUES ('en', 0.3), ('zh', 0.5), ('fr', 0.2)),
         r AS (
           SELECT d,
                  CAST(FLOOR(f * 200000 / toks) AS BIGINT) AS nfull,
                  CAST(FLOOR((f * 200000 / toks - FLOOR(f * 200000 / toks))
                             * 1000000) AS BIGINT) AS fppm
           FROM tot JOIN tgt USING (d) WHERE f > 0 AND toks > 0
         ),
         c AS (
           SELECT doc_id, lang, n_chars,
                  nfull + CASE
                    WHEN (('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT
                          % 1000000) < fppm
                    THEN 1 ELSE 0 END AS n_copies
           FROM documents JOIN r ON r.d = lang
         )
         SELECT doc_id, lang, n_chars, unnest(range(0, n_copies)) AS epoch
         FROM c WHERE n_copies > 0""",
    "q_shuffle_shards" ->
      """WITH s AS (
           SELECT doc_id,
                  md5('epoch0' || '|' || doc_id::VARCHAR) AS sk
           FROM documents
         )
         SELECT doc_id,
                (('0x' || substr(sk, 1, 4))::INT % 8) AS shard,
                ROW_NUMBER() OVER (
                  PARTITION BY (('0x' || substr(sk, 1, 4))::INT % 8)
                  ORDER BY sk) - 1 AS pos
         FROM s""",
    "q_pack_sequences" ->
      s"""WITH t AS (
            SELECT doc_id,
                   (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100) % 8
                     AS shard,
                   len($TOKS)::BIGINT AS n_toks
            FROM documents)
          SELECT doc_id, shard, n_toks,
                 floor((sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_toks) / 256.0)::BIGINT AS bin
          FROM t""",
    "text_decontaminate" -> {
      val bucket = "('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100"
      s"""WITH b AS (
            SELECT DISTINCT unnest(${shinglesSql(TOKS)}) AS s FROM documents
            WHERE $bucket >= 98),
          t AS (
            SELECT doc_id, unnest(${shinglesSql(TOKS)}) AS s FROM documents
            WHERE $bucket < 98)
          SELECT doc_id, count(*)::BIGINT AS n_hits
          FROM t JOIN b USING (s)
          GROUP BY 1"""
    },
    "corpus_build" ->
      s"""WITH $corpusBuildCtes
          SELECT doc_id, $splitCaseSql FROM base""",
    "corpus_build_neardup" ->
      s"""WITH RECURSIVE $corpusBuildCtes,
          mp AS ($minhashPairsSql),
          edges0 AS (
            SELECT doc_a, doc_b FROM mp
            WHERE doc_a IN (SELECT doc_id FROM base)
              AND doc_b IN (SELECT doc_id FROM base)),
          edges AS (SELECT doc_a AS u, doc_b AS v FROM edges0
                    UNION SELECT doc_b, doc_a FROM edges0),
          reach(src, dst) AS (
            SELECT u, u FROM edges
            UNION
            SELECT r.src, e2.v FROM reach r JOIN edges e2 ON e2.u = r.dst),
          comp AS (SELECT src AS doc_id, min(dst) AS component
                   FROM reach GROUP BY src)
          SELECT b.doc_id, $splitCaseSql
          FROM base b LEFT JOIN comp c ON b.doc_id = c.doc_id
          WHERE c.component IS NULL OR b.doc_id = c.component""",
    "dedup_jaccard_pairs" ->
      s"""WITH sh AS (
            SELECT doc_id, unnest(${shinglesSql(TOKS)}) AS s FROM documents),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT doc_a, doc_b,
                 round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.8""",
    "dedup_simhash" ->
      s"""WITH d AS (SELECT doc_id, list_distinct($TOKS) AS tk FROM documents),
          b AS (SELECT doc_id, list_transform(range(0,64), i ->
                 CASE WHEN list_sum(list_transform(tk, t ->
                   CASE WHEN (('0x' || substr(md5(t), (1 + i//4)::INT, 1))::INT
                              >> (3 - (i%4))::INT) & 1 = 1
                   THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS bits
               FROM d)
          SELECT doc_id, array_to_string(list_transform(range(0,16), j ->
                 substr('0123456789abcdef',
                        (1 + bits[(4*j+1)::INT]*8 + bits[(4*j+2)::INT]*4
                           + bits[(4*j+3)::INT]*2 + bits[(4*j+4)::INT])::INT, 1)), '')
                 AS simhash
          FROM b""",
    // quadratic all-pairs oracle for the banded Spark join; hamming is
    // computed bitwise from the same 64-bit profile as dedup_simhash
    // (permutation-invariant, so no BIGINT assembly needed)
    "dedup_simhash_pairs" ->
      s"""WITH d AS (SELECT doc_id, list_distinct($TOKS) AS tk FROM documents),
          b AS (SELECT doc_id, list_transform(range(0,64), i ->
                 CASE WHEN list_sum(list_transform(tk, t ->
                   CASE WHEN (('0x' || substr(md5(t), (1 + i//4)::INT, 1))::INT
                              >> (3 - (i%4))::INT) & 1 = 1
                   THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS bits
               FROM d)
          SELECT doc_a, doc_b, hamming FROM (
            SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                   list_sum(list_transform(range(1, 65), i ->
                     CASE WHEN a.bits[i::INT] <> b2.bits[i::INT]
                          THEN 1 ELSE 0 END))::INT AS hamming
            FROM b a JOIN b b2 ON a.doc_id < b2.doc_id)
          WHERE hamming <= 3""",
    "dedup_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS w FROM documents),
          g AS (SELECT doc_id, unnest(
                  CASE WHEN len(w) >= 8
                  THEN list_transform(range(1, len(w)-6),
                       i -> md5(array_to_string(w[i:i+7], ' ')))
                  ELSE [] END) AS g FROM t),
          occ AS (SELECT doc_id, g, count(*) AS occ FROM g GROUP BY 1, 2),
          dpg AS (SELECT g, count(*) AS n_docs FROM occ GROUP BY 1)
          SELECT doc_id, sum(occ)::BIGINT AS n_grams,
                 sum(CASE WHEN n_docs >= 2 THEN occ ELSE 0 END)::BIGINT
                   AS n_dup_grams,
                 round(sum(CASE WHEN n_docs >= 2 THEN occ ELSE 0 END)::DOUBLE
                       / sum(occ), 4) AS dup_frac
          FROM occ JOIN dpg USING (g) GROUP BY doc_id""",
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS w FROM documents),
          tc AS (SELECT doc_id, tok, count(*) AS c FROM
                   (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY 1, 2),
          topt AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                          max(c)::BIGINT AS top_token_count FROM tc GROUP BY 1),
          bc AS (SELECT doc_id, bg, count(*) AS c FROM
                   (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                      i -> w[i::INT] || ' ' || w[(i+1)::INT])) AS bg FROM t)
                 GROUP BY 1, 2),
          topb AS (SELECT doc_id, max(c)::BIGINT AS top_bigram_count
                   FROM bc GROUP BY 1)
          SELECT topt.doc_id, topt.n_tokens, topt.top_token_count,
                 coalesce(topb.top_bigram_count, 0)::BIGINT AS top_bigram_count,
                 round(topt.top_token_count::DOUBLE / topt.n_tokens, 4)
                   AS top_token_frac,
                 round(coalesce(topb.top_bigram_count, 0)::DOUBLE
                       / greatest(topt.n_tokens - 1, 1), 4) AS top_bigram_frac
          FROM topt LEFT JOIN topb ON topt.doc_id = topb.doc_id""",
    "text_langid" -> {
      val scores = TextAnalysis.langProfiles.map { case (lang, ws) =>
        s"len(list_filter($TOKS, t -> ${inList("t", ws)}))::INT AS s_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1).map(r => s"s_$r")
        val ge = if (rest.size == 1) s"s_$l >= ${rest.head}"
                 else s"s_$l >= greatest(${rest.mkString(", ")})"
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""WITH scored AS (
            SELECT doc_id, lang AS labeled_lang, $scores FROM documents)
          SELECT doc_id, labeled_lang,
                 CASE $pred ELSE '${langs.last}' END AS pred_lang,
                 greatest(${langs.map(l => s"s_$l").mkString(", ")})::INT AS score
          FROM scored"""
    },
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents)
          SELECT doc_id,
                 len(tk)::INT AS n_tokens,
                 round(list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk), 4)
                   AS avg_token_len,
                 round(len(list_filter(tk, t -> ${inList("t", stopwords)}))::DOUBLE
                       / len(tk), 4) AS stopword_ratio,
                 round(least(len(tk)::DOUBLE / 100.0, 1.0) * 0.5 +
                       (len(list_filter(tk, t -> ${inList("t", stopwords)}))::DOUBLE
                        / len(tk)) * 0.5, 6) AS quality
          FROM t""",
    "text_vocabulary" ->
      s"""SELECT token, count(*)::BIGINT AS freq
          FROM (SELECT unnest($TOKS) AS token FROM documents)
          GROUP BY 1
          ORDER BY freq DESC, token ASC
          LIMIT 100""",
    "corpus_stats" -> {
      val scores = TextAnalysis.langProfiles.map { case (lang, ws) =>
        s"len(list_filter(tk, t -> ${inList("t", ws)}))::INT AS s_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1).map(r => s"s_$r")
        val ge = if (rest.size == 1) s"s_$l >= ${rest.head}"
                 else s"s_$l >= greatest(${rest.mkString(", ")})"
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT $TOKS AS tk FROM documents),
          scored AS (
            SELECT tk, $scores,
                   len(tk)::BIGINT AS n_tok,
                   round(least(len(tk)::DOUBLE / 100.0, 1.0) * 0.5 +
                     (len(list_filter(tk, t -> ${inList("t", stopwords)}))::DOUBLE
                      / len(tk)) * 0.5, 6) AS q
            FROM t),
          p AS (SELECT CASE $pred ELSE '${langs.last}' END AS pred_lang,
                       n_tok, q FROM scored)
          SELECT pred_lang,
                 count(*)::BIGINT AS n_docs,
                 sum(n_tok)::BIGINT AS total_tokens,
                 min(n_tok)::BIGINT AS min_tokens,
                 max(n_tok)::BIGINT AS max_tokens,
                 round(avg(q), 4) AS avg_quality,
                 round(min(q), 4) AS min_quality,
                 round(max(q), 4) AS max_quality
          FROM p GROUP BY 1"""
    },
    "text_lm_bits" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS token FROM documents),
          cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
          v AS (SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT 1000),
          n AS (SELECT sum(c)::DOUBLE AS n FROM cnt)
          SELECT doc_id,
                 round(avg(-log2(coalesce(v.c, 1)::DOUBLE / n.n)), 4)
                   AS bits_per_token
          FROM tok LEFT JOIN v USING (token) CROSS JOIN n
          GROUP BY 1""",
    "text_scrub" -> {
      val email = TextAnalysis.EmailRe
      val url = TextAnalysis.UrlRe
      s"""WITH t AS (
            SELECT doc_id,
                   text || ' contact doc' || doc_id::VARCHAR ||
                   '@example.com or https://h.example/p/' || doc_id::VARCHAR
                     AS text
            FROM documents)
          SELECT doc_id,
                 len(regexp_extract_all(text, '$email'))::INT AS n_emails,
                 len(regexp_extract_all(text, '$url'))::INT AS n_urls,
                 regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
                                '$url', '<URL>', 'g') AS text_scrubbed
          FROM t"""
    },
    "text_tokens" ->
      s"""SELECT doc_id,
                 len($TOKS)::INT AS n_tokens,
                 len(list_distinct($TOKS))::INT AS n_distinct,
                 len(regexp_extract_all(text, '[a-z]+'))::INT AS n_alpha_runs,
                 length(text)::INT AS n_chars
          FROM documents""",
    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS w FROM documents),
          h AS (SELECT doc_id,
                 CASE WHEN len(w) >= 3
                 THEN list_transform(range(1, len(w)-1),
                      i -> md5(array_to_string(w[i:i+2], ' ')))
                 ELSE [] END AS hs FROM t),
          wm AS (SELECT doc_id,
                 CASE WHEN len(hs) >= 4
                 THEN list_transform(range(1, len(hs)-2), p -> list_min(hs[p:p+3]))
                 ELSE hs END AS wins FROM h)
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(wins)), '')) AS fingerprint,
                 len(list_distinct(wins))::INT AS n_grams
          FROM wm""",
    "emb_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, label, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 4) AS cos
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4""",
    "dedup_incremental_pairs" -> incrementalPairsSql,
    "dedup_incremental_exact" ->
      """WITH d AS (
           SELECT doc_id, md5(text) AS h,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 AS bucket
           FROM documents),
         newb AS (SELECT doc_id, h,
                    min(doc_id) OVER (PARTITION BY h) AS keep_id
                  FROM d WHERE bucket >= 80),
         oldh AS (SELECT DISTINCT h FROM d WHERE bucket < 80)
         SELECT doc_id, h AS text_hash FROM newb
         WHERE doc_id = keep_id AND h NOT IN (SELECT h FROM oldh)""",
    "dedup_semantic_pairs" ->
      s"""WITH $ivfCellsSql
          SELECT vec_a, vec_b, round(cos, 4) AS cos FROM semj
          WHERE cos >= 0.35""",
    "dedup_semantic_survivors" ->
      s"""WITH RECURSIVE $ivfCellsSql,
          sp AS (SELECT vec_a, vec_b FROM semj WHERE cos >= 0.35),
          edges AS (SELECT vec_a AS u, vec_b AS v FROM sp
                    UNION SELECT vec_b, vec_a FROM sp),
          reach(src, dst) AS (
            SELECT u, u FROM edges
            UNION
            SELECT r.src, e2.v FROM reach r JOIN edges e2 ON e2.u = r.dst),
          comp AS (SELECT src AS vec_id, min(dst) AS component
                   FROM reach GROUP BY src)
          SELECT emb.vec_id,
                 coalesce(c.component, emb.vec_id) AS component,
                 (c.component IS NULL OR emb.vec_id = c.component) AS keep
          FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.vec_id""",
    "ann_brute_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
          j AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
                FROM e q JOIN e c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < 8)
          SELECT query_id, vec_id, cos, rnk::INT AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rnk FROM j)
          WHERE rnk <= 5""",
    "ann_lsh_topk" -> {
      val bucket = (e: String) =>
        s"""list_sum(list_transform(range(0,8), p ->
            CASE WHEN list_sum(list_transform(range(1, len($e)+1),
                 i -> ($e)[i]::DOUBLE *
                      (CASE WHEN ('0x' || substr(md5(concat('plane', p::VARCHAR, '|',
                            (i-1)::VARCHAR)), 1, 1))::INT >= 8
                       THEN 1.0 ELSE -1.0 END))) > 0
            THEN (1 << p::INT) ELSE 0 END))"""
      s"""WITH e AS (SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm,
                 ${bucket("embedding")} AS bucket FROM embeddings),
          j AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
                FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
                WHERE q.vec_id < 8)
          SELECT query_id, vec_id, cos, rnk::INT AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rnk FROM j)
          WHERE rnk <= 5"""
    },
    "ann_lsh_multiprobe" -> {
      val bucket = (e: String) =>
        s"""list_sum(list_transform(range(0,8), p ->
            CASE WHEN list_sum(list_transform(range(1, len($e)+1),
                 i -> ($e)[i]::DOUBLE *
                      (CASE WHEN ('0x' || substr(md5(concat('plane', p::VARCHAR, '|',
                            (i-1)::VARCHAR)), 1, 1))::INT >= 8
                       THEN 1.0 ELSE -1.0 END))) > 0
            THEN (1 << p::INT) ELSE 0 END))"""
      s"""WITH e AS (SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm,
                 ${bucket("embedding")} AS bucket FROM embeddings),
          qp AS (SELECT vec_id, embedding, nrm,
                 CASE WHEN pr = 0 THEN bucket
                      ELSE xor(bucket, (1 << (pr - 1)::INT)) END AS bucket
                 FROM e, range(0, 9) t(pr) WHERE vec_id < 8),
          j AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
                FROM qp q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id)
          SELECT query_id, vec_id, cos, rnk::INT AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rnk FROM j)
          WHERE rnk <= 5"""
    },
    // multi-table OR-construction: 8 tables × 6 planes. The sign matrix
    // CTE is computed once (8×6 rows, 64 md5s each — same per-(t,p,i)
    // seed recipe as LshExpressions.signs: table 0 keeps the bare
    // "plane<p>|<i>" seed, t>0 prepends "t<t>|"); buckets then follow
    // by ordered list_sum (left-to-right double, ≡ the codegen'd
    // kernel). DISTINCT replaces the Spark side's first-matching-table
    // join residual — same pair set.
    "ann_lsh_multitable" ->
      s"""WITH smat AS (
            SELECT tt.t AS t, pp.p AS p,
              list_transform(range(0, 64), i ->
                CASE WHEN ('0x' || substr(md5(concat(
                       CASE WHEN tt.t = 0 THEN '' ELSE 't' || tt.t::VARCHAR || '|' END,
                       'plane', pp.p::VARCHAR, '|', i::VARCHAR)), 1, 1))::INT >= 8
                     THEN 1.0 ELSE -1.0 END) AS sv
            FROM range(0, 8) tt(t), range(0, 6) pp(p)),
          e AS (SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
          bits AS (
            SELECT e.vec_id, m.t,
              sum(CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1),
                    i -> (e.embedding)[i]::DOUBLE * (m.sv)[i])) > 0
                  THEN (1 << m.p::INT) ELSE 0 END)::INT AS bucket
            FROM e, smat m GROUP BY 1, 2),
          cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
            FROM bits qb JOIN bits cb
              ON qb.t = cb.t AND qb.bucket = cb.bucket AND qb.vec_id <> cb.vec_id
            WHERE qb.vec_id < 8),
          j AS (SELECT cand.query_id, cand.vec_id,
                 round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
                FROM cand JOIN e q ON q.vec_id = cand.query_id
                          JOIN e c ON c.vec_id = cand.vec_id)
          SELECT query_id, vec_id, cos, rnk::INT AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rnk FROM j)
          WHERE rnk <= 5""",
    // IVF: pivots = vec_id < 32 (deterministic), cell = argmax cosine
    // with first-pivot tie-break (row_number ≡ the Spark side's
    // array_position-of-array_max), queries probe their 4 best cells.
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                 sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings),
          piv AS (SELECT vec_id AS pvt, embedding, nrm FROM e WHERE vec_id < 32),
          pc AS (SELECT e.vec_id, p.pvt,
                  ${dotSql("e.embedding", "p.embedding")} / (e.nrm * p.nrm) AS pcos
                 FROM e, piv p),
          cellr AS (SELECT vec_id, pvt,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY pcos DESC, pvt ASC) AS r FROM pc),
          cells AS (SELECT vec_id, pvt AS cell FROM cellr WHERE r = 1),
          probes AS (SELECT vec_id, pvt AS cell FROM cellr WHERE r <= 4 AND vec_id < 8),
          j AS (SELECT qp.vec_id AS query_id, cc.vec_id AS vec_id,
                 round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
                FROM probes qp JOIN cells cc
                  ON qp.cell = cc.cell AND cc.vec_id <> qp.vec_id
                JOIN e q ON q.vec_id = qp.vec_id
                JOIN e c ON c.vec_id = cc.vec_id)
          SELECT query_id, vec_id, cos, rnk::INT AS rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rnk FROM j)
          WHERE rnk <= 5""",
    "media_meta" ->
      """SELECT doc_id,
                64 + (('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT % 192) AS width,
                64 + (('0x' || substr(md5(doc_id::VARCHAR), 3, 2))::INT % 192) AS height,
                CASE (('0x' || substr(md5(doc_id::VARCHAR), 5, 2))::INT % 3)
                  WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
                64::INT AS n_bytes
         FROM documents""",
    "media_resize" ->
      """SELECT doc_id, 128::INT AS width, 128::INT AS height,
                md5(repeat(md5(concat(doc_id::VARCHAR, '|128x128')), 3)) AS payload_md5,
                48::INT AS n_bytes
         FROM documents""",
    "media_features" ->
      """SELECT doc_id, i::INT AS i,
                round((('0x' || substr(md5(concat(doc_id::VARCHAR, '|e', i::VARCHAR)),
                        1, 4))::INT % 1000) / 1000.0, 4) AS feat
         FROM documents, range(0, 64) t(i)""",
    "media_frames" ->
      """SELECT doc_id, idx::INT AS frame_idx,
                md5(md5(concat(doc_id::VARCHAR, '|f', idx::VARCHAR))) AS frame_md5
         FROM documents, range(0, 4) t(idx)""",
    "ix_spans" ->
      s"""$IX_SPANS_CTE
          SELECT doc_id, "offset", kind, text, media_ref FROM sp""",
    "ix_records" -> s"$IX_SPANS_CTE $IX_RECORDS_TAIL SELECT * FROM rec",
    "ix_pack" ->
      s"""$IX_SPANS_CTE $IX_RECORDS_TAIL,
          routed AS (
            SELECT doc_id,
                   (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100) % 8
                     AS shard,
                   total_tokens
            FROM rec),
          packed AS (
            SELECT shard, doc_id, total_tokens,
                   floor((sum(total_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - total_tokens) / 512.0)::BIGINT AS bin
            FROM routed)
          SELECT shard, bin, count(*)::BIGINT AS n_docs,
                 sum(total_tokens)::BIGINT AS seq_tokens,
                 min(doc_id) AS first_doc
          FROM packed GROUP BY shard, bin"""
  )

  /** Shared CTEs for the ix_* oracles: the deterministic spanization
    * (`Interleave.spanizeFlat` mirrored — 8-token chunks, image span
    * after chunk c iff c % 3 == doc_id % 3, dense offsets in CLOSED
    * form: chunk c's text span sits at c + mb(c) where mb(c) = the
    * media spans before it = floor((c - r - 1)/3) + 1 for c > r =
    * doc_id % 3, else 0). */
  private val IX_SPANS_CTE =
    s"""WITH t AS (SELECT doc_id, $TOKS AS w FROM documents),
        ch AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(0, greatest(1, ceil(len(w) / 8.0)::BIGINT)),
                   c -> struct_pack(c := c,
                          chunk := array_to_string(w[c*8+1:c*8+8], ' ')))) AS u
          FROM t),
        chx AS (
          SELECT doc_id, u.c AS c, u.chunk AS chunk,
                 CASE WHEN u.c > doc_id % 3
                      THEN floor((u.c - doc_id % 3 - 1) / 3.0)::BIGINT + 1
                      ELSE 0 END AS mb
          FROM ch),
        sp AS (
          SELECT doc_id, (c + mb)::INT AS "offset", 'text' AS kind,
                 chunk AS text, '' AS media_ref
          FROM chx
          UNION ALL
          SELECT doc_id, (c + mb + 1)::INT AS "offset", 'image' AS kind,
                 '' AS text,
                 'media://' || doc_id::VARCHAR || '/' || c::VARCHAR AS media_ref
          FROM chx WHERE c % 3 = doc_id % 3)"""

  /** Record-assembly tail over `sp` (`Interleave.assemble` +
    * `mediaStore` mirrored — md5-derived media meta, 1/16 refs absent,
    * ViT 16×16 patch pricing, chr(1)-joined order-sensitive
    * fingerprint whose pieces are chr(2)-joined (kind, text,
    * media_ref, resolved) tuples). */
  private val IX_RECORDS_TAIL =
    s""", media AS (
          SELECT media_ref, md5(media_ref) AS payload_md5,
                 64 + (('0x' || substr(md5(media_ref), 1, 2))::INT % 192) AS width,
                 64 + (('0x' || substr(md5(media_ref), 3, 2))::INT % 192) AS height
          FROM (SELECT DISTINCT media_ref FROM sp WHERE kind = 'image')
          WHERE substr(md5(media_ref), 1, 1) <> 'f'),
        pieced AS (
          SELECT s.doc_id, s."offset", s.kind,
                 concat_ws(chr(2), s.kind, coalesce(s.text, ''),
                           coalesce(s.media_ref, ''),
                           CASE WHEN s.kind = 'image'
                                THEN coalesce(m.payload_md5, '∅')
                                ELSE '' END) AS piece,
                 CASE WHEN s.kind = 'text'
                      THEN len(list_filter(string_split(s.text, ' '),
                               x -> x <> ''))::BIGINT ELSE 0 END AS text_toks,
                 CASE WHEN s.kind = 'image' AND m.media_ref IS NOT NULL
                      THEN (ceil(m.width / 16.0) * ceil(m.height / 16.0))::BIGINT
                      ELSE 0 END AS patch_toks,
                 CASE WHEN s.kind = 'image' AND m.media_ref IS NULL
                      THEN 1 ELSE 0 END AS missing
          FROM sp s LEFT JOIN media m ON s.media_ref = m.media_ref),
        rec AS (
          SELECT doc_id,
                 count(*)::BIGINT AS n_spans,
                 sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END)::BIGINT AS n_text,
                 sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END)::BIGINT AS n_media,
                 sum(missing)::BIGINT AS n_missing,
                 sum(text_toks)::BIGINT AS text_tokens,
                 sum(patch_toks)::BIGINT AS patch_tokens,
                 md5(string_agg(piece, chr(1) ORDER BY "offset")) AS content_md5,
                 (sum(text_toks) + sum(patch_toks))::BIGINT AS total_tokens
          FROM pieced GROUP BY doc_id)"""
}
