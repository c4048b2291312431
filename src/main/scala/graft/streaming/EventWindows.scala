package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over the `events` stream — the
  * third Structured Streaming shape next to the stateful timeline
  * (`jobhistory/Streaming`) and the LSH ingest-dedup state
  * ([[IngestDedup]]). All three SURVEY §2.9 window kinds: tumbling
  * ([[windowedCounts]]), sliding ([[slidingCounts]]) and session
  * ([[sessionCounts]]) — per-window aggregates whose state is BOUNDED
  * by a watermark, the property that makes an unbounded stream
  * runnable at all.
  *
  * Append-mode semantics: a window's row is emitted exactly once, when
  * the watermark passes its end (for sessions: when no more events can
  * extend the session); events arriving later than the watermark
  * allows are dropped (the documented trade — the batch query over the
  * same data includes them, and the spec pins both sides of that
  * difference).
  *
  * Scale design: the aggregation state is (window, key) keyed — its
  * size is O(active windows × keys) regardless of event volume
  * (sliding windows multiply state by length/slide, sessions by
  * active-sessions-per-key), and partial aggregation combines map-side
  * within each micro-batch before the state-store shuffle. Every
  * function works unchanged on a batch DataFrame (same plan minus the
  * watermark operator), which is what the batch ≡ stream specs pin.
  */
object EventWindows {

  private def withEventTime(events: DataFrame, watermark: String): DataFrame = {
    val timed = events
      .withColumn("event_time", expr("timestamp_micros(ts DIV 1000)"))
    if (events.isStreaming) timed.withWatermark("event_time", watermark)
    else timed
  }

  /** Per (1-minute tumbling window, event_type) counts and rounded
    * value sums. `events` needs `ts` (BIGINT nanos — the parquet
    * nanosAsLong reading), `event_type`, `value`. */
  def windowedCounts(events: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    withEventTime(events, watermark)
      .groupBy(window(col("event_time"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per (2-minute window sliding every 1 minute, event_type) counts —
    * each event lands in length/slide = 2 overlapping windows, the
    * state-size multiplier a sliding window costs over a tumbling
    * one. */
  def slidingCounts(events: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    withEventTime(events, watermark)
      .groupBy(window(col("event_time"), "2 minutes", "1 minute"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows with a 30-minute inactivity gap (the
    * same sessionization rule as q19, expressed as the engine's
    * streaming-native `session_window`): dynamic-length windows that
    * merge while events keep arriving within the gap. A session's row
    * emits once the watermark passes its close — state per key is the
    * set of OPEN sessions only. `events` needs `ts`, `user_id`,
    * `value`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 minutes"): DataFrame =
    withEventTime(events, watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"),
        col("n_events"), col("sum_value"))
}
