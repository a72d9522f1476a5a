package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{TextAnalysis, TextDedup}
import graft.tables.{IceLite, ProbedKeyIndex}

/** INDEX-BACKED streaming corpus curation — the production shape of
  * [[CurationStream]]: per micro-batch, corpus-side work is O(batch),
  * not an O(corpus) rescan, no matter how large the curated table has
  * grown.
  *
  * Two [[ProbedKeyIndex]]es ride along with the curated table:
  *  - `text_hash` (md5 of the text) — EXACT cross-batch dedup: batch
  *    hashes are bloom-prefiltered, only candidate buckets of the
  *    index mirror are scanned (partition-pruned), plus the small
  *    un-mirrored delta;
  *  - `(band, band_hash)` MinHash band rows — NEAR-dup dedup: the
  *    batch is shingled once (`TextDedup.minhashBandRows` — the same
  *    persisted-band-index shape as `incrementalMinhashPairs`, probed
  *    through the sharded blooms instead of a full index join), and a
  *    batch doc sharing ANY band with an already-curated doc is
  *    dropped. The corpus is never re-shingled.
  *
  * Exactly-once: the curated table's batch-id snapshot prop
  * (IceLiteSink) short-circuits replays BEFORE any read. The indexes
  * commit AFTER the table with an `indexed.batch` prop; a crash
  * between the two is healed by [[CuratedCorpus#reconcile]], which
  * walks the table's stream-tagged versions and re-derives the missing
  * index rows from exactly those delta files — so the indexes are
  * always caught up to the table before a batch is judged against
  * them (a doc can never duplicate-survive because its dup's index
  * rows got lost in a crash).
  *
  * Index refreshes (mirror + bloom shards) trigger by delta-bytes
  * policy — one full rewrite per `refreshDeltaBytes` of growth, the
  * LSM-style amortization that keeps per-row maintenance O(1).
  */
final class CuratedCorpus(
    spark: SparkSession,
    dir: String,
    minTokens: Int = 3,
    minQuality: Double = 0.0,
    nSig: Int = 16,
    rowsPerBand: Int = 4,
    refreshDeltaBytes: Long = 64L << 20,
    buckets: Int = 32,
    targetIndexPartitionBytes: Long = 0,
    indexFpp: Double = 0.001
) {

  val table = new IceLite(spark, s"$dir/table")
  val hashIdx = new ProbedKeyIndex(spark, s"$dir/hash_idx", Seq("text_hash"),
    buckets, targetIndexPartitionBytes, indexFpp)
  val bandIdx = new ProbedKeyIndex(spark, s"$dir/band_idx", Seq("band", "band_hash"),
    buckets, targetIndexPartitionBytes, indexFpp)

  private val IndexedBatchProp = "indexed.batch"
  private val IndexedVersionProp = "indexed.version"
  private val StreamTag = "stream batch="

  import ProbedKeyIndex.LookupStats

  /** One batch's probe evidence (the O(batch) pin): what each index
    * actually scanned, plus what was appended. */
  final case class BatchReport(
      appended: Boolean,
      appendedRows: Long,
      exactDropped: Long,
      nearDupDropped: Long,
      hashStats: LookupStats,
      bandStats: LookupStats,
      refreshed: Boolean)

  private def indexedBatch(idx: ProbedKeyIndex): Long =
    idx.currentProps.get(IndexedBatchProp).map(_.toLong).getOrElse(-1L)

  private def hashRowsOf(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("text_hash"))

  private def bandRowsOf(docs: DataFrame): DataFrame =
    TextDedup.minhashBandRows(docs, nSig, rowsPerBand).select("band", "band_hash")

  /** Catch the indexes up to the curated table (crash between the
    * table commit and an index commit): re-derive key rows from the
    * table versions whose stream tag exceeds the index's
    * `indexed.batch`. No-op on the healthy path — and O(1) on it: the
    * walk starts at the index's `indexed.version` (the table version
    * its last append covered, carried forward in the snapshot props),
    * not at version 1, so per-batch driver metadata work stays
    * O(new versions), never O(all versions ever committed) — at 10^4
    * micro-batches a from-the-start walk would be quadratic in the
    * stream's lifetime. */
  def reconcile(): Unit = {
    val tableBatch = IceLiteSink.lastCommittedBatch(table)
    if (tableBatch < 0) return
    Seq[(ProbedKeyIndex, DataFrame => DataFrame)](
      (hashIdx, hashRowsOf), (bandIdx, bandRowsOf)
    ).foreach { case (idx, derive) =>
      val have = indexedBatch(idx)
      if (have < tableBatch) {
        val fromV = idx.currentProps.get(IndexedVersionProp)
          .map(_.toInt).getOrElse(0)
        ((fromV + 1) to table.currentVersion).foreach { v =>
          val lin = table.lineageAt(v)
          if (lin.startsWith(StreamTag)) {
            val b = lin.stripPrefix(StreamTag).toLong
            if (b > have) {
              val fresh = table.filesAt(v).toSet -- table.filesAt(v - 1).toSet
              if (fresh.nonEmpty) {
                idx.append(derive(spark.read.parquet(fresh.toSeq: _*)),
                  s"reconcile batch=$b",
                  Map(IndexedBatchProp -> b.toString,
                    IndexedVersionProp -> v.toString))
                ()
              }
            }
          }
        }
      }
    }
  }

  /** Gate + exact dedup + near-dup dedup + idempotent append for one
    * micro-batch; returns the probe evidence. `docs` carries
    * (doc_id, text). */
  def curateBatch(batch: DataFrame, batchId: Long): BatchReport = {
    val noStats = LookupStats(0, 0, 0, 0, 0, 0, 0)
    if (batchId <= IceLiteSink.lastCommittedBatch(table))
      return BatchReport(appended = false, 0, 0, 0, noStats, noStats, refreshed = false)
    reconcile()
    // typed gate kernel (r6): the declarative size/quality filters ran
    // interpreted higher-order functions that re-split the text per
    // gate expression (the corpusBuild lesson); one tokenization pass,
    // identical decisions (qualityKernel reproduces the Column form's
    // arithmetic incl. the NaN-fails-gate empty-doc case)
    val gated = {
      import spark.implicits._
      // locals, not fields: the closure must not capture `this`
      val (minT, minQ) = (minTokens, minQuality)
      batch.select(col("doc_id"), col("text")).as[(Long, String)]
        .filter { r =>
          val w = graft.functions.TextKernels.words(r._2)
          w.length >= minT && TextAnalysis.qualityKernel(w) >= minQ
        }
        .toDF("doc_id", "text")
        .persist()
    }
    try {
      // within-batch exact first-wins, then the indexed cross-batch check
      val hashed = gated.withColumn("text_hash", md5(col("text")))
      val batchKept = hashed
        .withColumn("__keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
        .filter(col("doc_id") === col("__keep"))
        .drop("__keep")
      val (hashHits, hashStats) = hashIdx.hits(batchKept)
      val exactSurvivors = batchKept
        .join(hashHits.select("doc_id"), Seq("doc_id"), "left_anti")
        .persist()
      val nExact = batchKept.count() - exactSurvivors.count()
      // near-dup: batch band rows (doc_id rides through) vs the band index
      val batchBands = TextDedup.minhashBandRows(
        exactSurvivors.select("doc_id", "text"), nSig, rowsPerBand)
        .persist()
      val (bandHits, bandStats) = bandIdx.hits(batchBands)
      // within-batch near-dups: first-wins per shared band group — the
      // lowest doc_id of every (band, band_hash) bucket survives. On
      // chain-shaped clusters this can keep more than the one-per-
      // component survivor (LSH-candidate granularity, not transitive
      // closure); batch-local chains needing exact component resolution
      // go through corpusBuildNearDup before ingest.
      val withinBatchDropped = batchBands
        .withColumn("__m", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
        .filter(col("doc_id") =!= col("__m"))
        .select("doc_id").distinct()
      val survivors = exactSurvivors
        .join(bandHits.select("doc_id").unionAll(withinBatchDropped).distinct(),
          Seq("doc_id"), "left_anti")
        .select("doc_id", "text")
        .persist()
      val nSurv = survivors.count()
      batchBands.unpersist() // only after survivors materialized — its
      // plan reads batchBands; unpersisting earlier re-shingles the batch
      val nNear = exactSurvivors.count() - nSurv
      val appended = IceLiteSink.appendBatch(table, survivors, batchId)
      if (appended) {
        val tableV = table.currentVersion
        val idxProps = Map(IndexedBatchProp -> batchId.toString,
          IndexedVersionProp -> tableV.toString)
        hashIdx.append(hashRowsOf(survivors), s"index batch=$batchId", idxProps)
        bandIdx.append(bandRowsOf(survivors), s"index batch=$batchId", idxProps)
      }
      // refresh LAST: it deletes the superseded index generation's
      // mirror/shard files, which survivors' lineage (through bandHits)
      // still references — nothing may re-execute that plan afterwards
      // (on a cluster a lost cached partition would otherwise recompute
      // against deleted files)
      val refreshed =
        hashIdx.maybeRefresh(refreshDeltaBytes) | bandIdx.maybeRefresh(refreshDeltaBytes)
      val n = if (appended) nSurv else 0L
      exactSurvivors.unpersist()
      survivors.unpersist()
      BatchReport(appended, n, nExact, nNear, hashStats, bandStats, refreshed)
    } finally {
      gated.unpersist()
      ()
    }
  }

  /** Start the continuous indexed ingest of `docs` (doc_id, text). */
  def start(docs: DataFrame, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(batch, batchId)
        ()
      }
      .start()
}
