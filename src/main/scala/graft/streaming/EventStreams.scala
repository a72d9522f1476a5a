package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9): the reference's
  * epoch-batched loop (ST1/ST2) expressed as streaming transforms.
  * These operate on any streaming Dataset with the `events` schema —
  * tests drive them with MemoryStream; production would use a
  * file/kafka `readStream` with the identical transform chain.
  */
object EventStreams {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double
  )

  final case class SessionUpdate(
      user_id: Long,
      session_start: Timestamp,
      n_events: Long,
      total_value: Double,
      expired: Boolean
  )

  /** Watermarked tumbling-window aggregation: events/hour per type.
    * Late events beyond the 10-minute watermark are dropped — the
    * streaming twin of Relational.eventsTumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Custom keyed state: per-user session tracking via
    * mapGroupsWithState — the streaming home of the reference's
    * pickle-checkpointed loop state. Sessions split on EVENT-TIME gaps
    * (> gapMinutes between consecutive events restarts the window).
    * NoTimeout: a processing-time timeout makes the micro-batch engine
    * schedule no-data batches indefinitely, so `processAllAvailable`
    * (and AvailableNow triggers) never quiesce — expiry is instead
    * derivable from the emitted session_start changes. */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int = 30
  ): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Timestamp, Timestamp, Long, Double), SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[(Timestamp, Timestamp, Long, Double)]) =>
          val evs = it.toSeq.sortBy(_.ts.getTime)
          val gapMs = gapMinutes * 60000L
          var (start, last, n, v) = state.getOption
            .getOrElse((evs.head.ts, evs.head.ts, 0L, 0.0))
          evs.foreach { e =>
            if (e.ts.getTime - last.getTime > gapMs) {
              // gap exceeded: restart the session window
              start = e.ts; n = 0L; v = 0.0
            }
            last = e.ts; n += 1; v += e.value
          }
          state.update((start, last, n, v))
          SessionUpdate(userId, start, n, v, expired = false)
      }
  }

  /** Streaming dedup on event_id within the watermark horizon — the
    * streaming analog of the frontier seen-set (J1). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Run a streaming transform over a memory sink until idle; test
    * helper mirroring Trigger.AvailableNow semantics. */
  def runToMemory(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      outputMode: OutputMode
  ): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
