package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import EventStreams._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("tumbling window aggregation with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    val out = runToMemory(spark, tumblingCounts(in.toDF()), "tumbling", OutputMode.Complete())
    val rows = out.select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("streaming dedup drops repeated event_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = dedupStream(in.toDF()).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(2), 1, "click", 1.0), Event(3, ts(3), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 3)
  }

  test("mapGroupsWithState sessionization accumulates and splits on gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = sessionizeStream(spark, in.toDS())
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("update").start()
    in.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 2.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(10), 7, "view", 3.0))
    q.processAllAvailable()
    // gap > 30 min → new session
    in.addData(Event(4, ts(60), 7, "view", 10.0))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("sessions").as[SessionUpdate].collect()
    val last = updates.last
    assert(updates.exists(u => u.n_events == 3 && u.total_value == 6.0))
    assert(last.n_events == 1 && last.total_value == 10.0) // post-gap restart
  }
}
