package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface (SURVEY §2.6); this module is
  * the Spark-native extension: file-source micro-batches → windowed
  * aggregation, and custom session state via flatMapGroupsWithState.
  * Event times are handled as integer epoch-microseconds end-to-end so
  * gap comparisons are exact (java.sql.Timestamp.getTime would truncate
  * to milliseconds).
  */
object EventStreams {

  /** Event with microsecond event time (exact arithmetic). */
  case class Event(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  /** State carried between micro-batches (must be public for the state
    * encoder's generated code). */
  case class OpenSession(start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  /** File-source stream over the driver-generated events parquet (the
    * file-source path must be a directory, so glob-filter to the one
    * table file). A file stream cannot infer its schema, so `ts` is read
    * as the raw int64 and converted per the ts-unit sniff
    * ([[graft.Tables.eventsTsIsMicros]], one batch footer read); the
    * returned stream always carries `ts` as a microsecond TimestampType,
    * same as [[graft.Tables.events]]. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.tsRawToMicros(
      spark.readStream.option("pathGlobFilter", "events.parquet")
        .schema(graft.Tables.eventsSchema).parquet(sfDir),
      graft.Tables.eventsTsIsMicros(spark, sfDir))

  /** Tumbling-window counts/sums per event type. With `watermark` set the
    * query can run in append mode at scale (state eviction); complete
    * mode gives the deterministic full answer for the verification run. */
  def windowedCounts(events: DataFrame, windowDuration: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))

  def withWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)

  /** Streaming OHLC bars — the live twin of
    * [[graft.ops.Temporal.ohlcBars]] (graded as tp07): per (tumbling
    * bar, user), open/close picked under the total (event time, id)
    * order via min_by/max_by STRUCT keys, extremes and count alongside.
    * The min_by buffer (candidate value + its ordering key) is
    * mergeable state, so micro-batch boundaries can never change a
    * bar — the batch and streaming answers are value-identical, which
    * is what the shared oracle pins. Complete mode gives the
    * deterministic verification answer; production appends with a
    * watermark so closed bars emit once and state stays bounded. */
  def ohlcBars(events: DataFrame, barDuration: String): DataFrame = {
    val ord = struct(unix_micros(col("ts")), col("event_id"))
    events
      .groupBy(window(col("ts"), barDuration), col("user_id"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): events are merged into the user's open
    * session; a gap larger than `gapMinutes` closes it. Closed sessions
    * are emitted; the open session stays in state (so the final session
    * of each user is intentionally never emitted — it has not ended).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000L

    def fn(userId: Long, it: Iterator[Event],
        state: GroupState[OpenSession]): Iterator[Session] = {
      val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      var open = state.getOption.orNull
      val closed = Vector.newBuilder[Session]
      sorted.foreach { e =>
        if (open == null) {
          open = OpenSession(e.ts_us, e.ts_us, 1, e.value)
        } else if (e.ts_us - open.end_us > gapUs) {
          closed += Session(userId, open.start_us, open.end_us,
            open.n_events, open.total_value)
          open = OpenSession(e.ts_us, e.ts_us, 1, e.value)
        } else {
          open = OpenSession(open.start_us, e.ts_us,
            open.n_events + 1, open.total_value + e.value)
        }
      }
      state.update(open)
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Events DataFrame (normalized `ts`: microsecond TimestampType) →
    * typed stream with exact integer microsecond times, so gap arithmetic
    * never touches floating point or millisecond-truncating java.sql
    * types. */
  def toTypedEvents(events: DataFrame): Dataset[Event] = {
    import events.sparkSession.implicits._
    events.select(
      col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value")).as[Event]
  }
}
