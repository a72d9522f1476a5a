package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{TextAnalysis, TextDedup}
import graft.tables.IceLite

/** Streaming corpus ingest — the curation pipeline run CONTINUOUSLY:
  * each micro-batch of raw documents is quality-gated, exact-deduped
  * both within the batch and against the ever-growing curated table
  * itself, and appended exactly-once.
  *
  * Composition of three already-pinned pieces, no new machinery:
  * scan-side gates (TextAnalysis), `incrementalExactSurvivors`
  * (TextDedup — the batch dedups against the PRE-batch snapshot of the
  * very table it appends to), and `IceLiteSink.appendBatch` batch-id
  * idempotence. Exactly-once composes with the dedup because the
  * batch-id check short-circuits BEFORE any read: a replayed batch
  * never re-dedups against a snapshot that already contains it.
  *
  * THE SIMPLE BASELINE: `curateBatch` re-reads the whole curated table
  * every micro-batch — O(corpus) corpus-side work per batch, fine for
  * small tables and as the semantic oracle, wrong at scale. The
  * production path is [[CuratedCorpus]]: the same gates + exactly-once
  * recipe, but cross-batch dedup probes persisted hash/band indexes
  * through sharded blooms and partition-pruned mirrors
  * ([[graft.tables.ProbedKeyIndex]]) — O(batch) corpus-side work per
  * batch, plus cross-batch NEAR-dup dedup this baseline doesn't do.
  */
object CurationStream {

  /** Gate + dedup + idempotent append for one micro-batch. Returns
    * true when rows were appended. */
  def curateBatch(table: IceLite, batch: DataFrame, batchId: Long,
      minTokens: Int, minQuality: Double): Boolean = {
    if (batchId <= IceLiteSink.lastCommittedBatch(table)) return false
    val toks = TextDedup.tokens(col("text"))
    val gated = batch
      .filter(size(toks) >= minTokens)
      .filter(TextAnalysis.qualityScore(toks) >= minQuality)
    val corpus =
      if (table.isEmpty) gated.filter(lit(false)) else table.read()
    val survivors = gated.join(
      TextDedup.incrementalExactSurvivors(gated, corpus).select("doc_id"),
      Seq("doc_id"), "left_semi")
    IceLiteSink.appendBatch(table, survivors, batchId)
  }

  /** Start the continuous ingest: `docs` must carry (doc_id, text). */
  def start(docs: DataFrame, table: IceLite, checkpointDir: String,
      minTokens: Int = 3, minQuality: Double = 0.0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(table, batch, batchId, minTokens, minQuality)
        ()
      }
      .start()
}
