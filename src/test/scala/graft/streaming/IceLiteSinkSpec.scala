package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.tables.IceLite
import EventStreams.Event

/** Exactly-once streaming append: kill/restart must neither lose nor
  * duplicate rows, and a replayed foreachBatch delivery must be a
  * no-op — the streaming twin of the crawl's appendOnce idempotence.
  */
class IceLiteSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("kill/restart with a shared checkpoint appends each row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val table = new IceLite(spark, tmpDir("sink"))
    val ckpt = tmpDir("sink_ckpt")

    val in = MemoryStream[Event]
    in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    val q1 = IceLiteSink.start(in.toDF(), table, ckpt)
    q1.processAllAvailable()
    q1.stop()
    assert(table.read().count() == 2)

    // "crash" happened: restart from the same checkpoint, more data
    in.addData(Event(3, ts(2), 2, "click", 3.0))
    val q2 = IceLiteSink.start(in.toDF(), table, ckpt)
    q2.processAllAvailable()
    q2.stop()

    val ids = table.read().select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"lost/duplicated rows: $ids")
  }

  test("a replayed batch id is a no-op even with compaction commits on top") {
    val table = new IceLite(spark, tmpDir("sink2"))
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(IceLiteSink.appendBatch(table, batch, batchId = 0))
    // replay of the same id: skipped
    assert(!IceLiteSink.appendBatch(table, batch, batchId = 0))
    assert(table.read().count() == 2)
    assert(IceLiteSink.appendBatch(table, batch.filter("id = 1"), batchId = 1))
    assert(IceLiteSink.appendBatch(table, batch.filter("id = 2"), batchId = 2))
    // a REAL compaction commit above the stream tags (3 files → 1)
    val vBefore = table.currentVersion
    assert(table.compact(1L << 30, "compact") == vBefore + 1)
    assert(table.lineageAt(table.currentVersion) == "compact")
    // the top-down scan skips the compact lineage and finds batch 2
    assert(IceLiteSink.lastCommittedBatch(table) == 2)
    assert(!IceLiteSink.appendBatch(table, batch, batchId = 2))
    assert(IceLiteSink.appendBatch(table, batch.filter("id = 1"), batchId = 3))
    assert(table.read().count() == 5)
    // empty batches advance nothing
    assert(!IceLiteSink.appendBatch(table, batch.filter("id > 99"), batchId = 4))
    assert(IceLiteSink.lastCommittedBatch(table) == 3)
  }

  test("the high-water mark survives compact + vacuum expiring every stream-tagged manifest") {
    val dir = tmpDir("sink3")
    val table = new IceLite(spark, dir)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(IceLiteSink.appendBatch(table, batch, batchId = 0))
    assert(IceLiteSink.appendBatch(table, batch, batchId = 1))
    assert(IceLiteSink.appendBatch(table, batch.filter("id = 1"), batchId = 2))
    // maintenance cycle on the shared table lifecycle: compaction
    // rewrites, then vacuum(keep=1) expires EVERY manifest that carried
    // a stream lineage tag — the retained history is maintenance-only
    val vBefore = table.currentVersion
    assert(table.compact(1L << 30, "compact") == vBefore + 1)
    assert(table.vacuum(keepVersions = 1) > 0)
    assert((1 until table.currentVersion).forall(v =>
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "snapshots", f"v$v%05d.json"))),
      "vacuum(keep=1) should have expired all prior manifests")
    // restart path: must resume (not throw), and replay must stay a no-op
    assert(IceLiteSink.lastCommittedBatch(table) == 2)
    assert(!IceLiteSink.appendBatch(table, batch, batchId = 2), "replayed batch re-appended after vacuum")
    assert(table.read().count() == 5)
    assert(IceLiteSink.appendBatch(table, batch.filter("id = 1"), batchId = 3))
    assert(table.read().count() == 6)
    assert(IceLiteSink.lastCommittedBatch(table) == 3)
  }
}
