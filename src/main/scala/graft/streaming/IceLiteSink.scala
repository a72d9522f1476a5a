package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.tables.IceLite

/** Exactly-once streaming append into an IceLite snapshot table.
  *
  * Structured Streaming's `foreachBatch` delivers each batch id
  * AT-LEAST-once (a crash between the sink write and the checkpoint
  * commit replays the batch on restart) with deterministic content per
  * id. Tagging each append with its batch id and skipping ids already
  * committed upgrades that to exactly-once — the same idempotence
  * recipe as the crawl's appendOnce supersteps (FrontierEngine), so a
  * streaming ingest and a batch crawl share one table format, one
  * resume story, and one compaction/vacuum lifecycle.
  */
object IceLiteSink {

  private val TagPrefix = "stream batch="
  private val BatchProp = "stream.batch"

  /** Highest stream batch id committed to `table`, −1 if none. Read
    * from the CURRENT manifest's snapshot props — the batch id commits
    * atomically with the batch's data and every later commit (compact,
    * vacuum survivor, batch-crawl append) carries it forward, so the
    * lookup is O(1) and never walks version history. A history scan
    * here would die on vacuumed manifests: a compact + vacuum cycle on
    * the shared table lifecycle can expire every stream-tagged commit
    * while the stream is down, and the restart path must still resume
    * exactly-once. */
  def lastCommittedBatch(table: IceLite): Long =
    table.currentProps.get(BatchProp).map(_.toLong).getOrElse(-1L)

  /** Idempotent per-batch append: a replayed batch id is a no-op.
    * Returns true when the batch was appended (false = replay skip or
    * empty batch). */
  def appendBatch(table: IceLite, batch: DataFrame, batchId: Long, coalesceTo: Int = 1): Boolean = {
    if (batchId <= lastCommittedBatch(table)) return false
    if (batch.isEmpty) return false
    table.append(batch, s"$TagPrefix$batchId", coalesceTo,
      props = Map(BatchProp -> batchId.toString))
    true
  }

  /** Start a streaming append of `df` into `table`. The checkpoint dir
    * carries source offsets; the lineage tags carry sink idempotence —
    * together they make kill/restart exactly-once end to end. */
  def start(
      df: DataFrame,
      table: IceLite,
      checkpointDir: String,
      coalesceTo: Int = 1
  ): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(table, batch, batchId, coalesceTo)
        ()
      }
      .start()
}
