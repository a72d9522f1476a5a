package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.tables.IceLite

/** Continuous corpus curation: gates, within-batch dedup, dedup
  * against the growing table itself, and exactly-once restart — the
  * streaming twin of corpusBuild.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed batches are gated, cross-batch-deduped, and restart exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val table = new IceLite(spark, tmpDir("curation"))
    val ckpt = tmpDir("curation_ckpt")

    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")

    // batch 0: 10 kept, 11 fails the gate (<3 tokens), 13 dups 12
    in.addData((10L, "alpha beta gamma"), (11L, "too short"),
      (12L, "delta epsilon zeta"), (13L, "delta epsilon zeta"))
    val q1 = CurationStream.start(docs, table, ckpt)
    q1.processAllAvailable()
    // batch 1: 20 dups a batch-0 TABLE row, 21 is new
    in.addData((20L, "alpha beta gamma"), (21L, "eta theta iota"))
    q1.processAllAvailable()
    q1.stop()
    assert(table.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 12L, 21L))

    // crash/restart on the same checkpoint: batch 2 arrives, nothing replays
    in.addData((30L, "kappa lambda mu"), (31L, "alpha beta gamma"))
    val q2 = CurationStream.start(docs, table, ckpt)
    q2.processAllAvailable()
    q2.stop()
    val got = table.read().select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 12L, 21L, 30L), s"lost/duplicated: $got")

    // replayed batch id: a no-op even though its rows would re-survive
    val replay = Seq((40L, "nu xi omicron")).toDF("doc_id", "text")
    assert(!CurationStream.curateBatch(table, replay, batchId = 0,
      minTokens = 3, minQuality = 0.0))
    assert(table.read().count() == 4)
  }

  test("an all-filtered batch leaves the table untouched and stays idempotent") {
    val table = new IceLite(spark, tmpDir("curation2"))
    val seed = Seq((1L, "one two three")).toDF("doc_id", "text")
    assert(CurationStream.curateBatch(table, seed, 0, 3, 0.0))
    val junk = Seq((2L, "x"), (3L, "one two three")).toDF("doc_id", "text")
    // 2 fails the gate, 3 dups the table → nothing appended, id 1 not burned
    assert(!CurationStream.curateBatch(table, junk, 1, 3, 0.0))
    assert(table.read().count() == 1)
    assert(IceLiteSink.lastCommittedBatch(table) == 0)
    // the same id later with real content still lands (at-least-once replay)
    val real = Seq((4L, "four five six")).toDF("doc_id", "text")
    assert(CurationStream.curateBatch(table, real, 1, 3, 0.0))
    assert(table.read().count() == 2)
  }
}
