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

  /** Stream-stream inner INTERVAL join: each click joined to the same
    * user's purchases within `[click_time, click_time + horizon]` —
    * the attribution join an event pipeline runs continuously. Both
    * inputs need `event_id`, `user_id`, `ts` (BIGINT nanos).
    *
    * State bound (the reason this is runnable on unbounded streams):
    * from the equi-key + the two event-time range predicates + the
    * watermarks, the engine derives a per-side eviction threshold — a
    * buffered click can stop matching once the watermark passes
    * `click_time + horizon`, a buffered purchase once it passes
    * `purchase_time` — so each side's join state holds only
    * `horizon + watermark` worth of events per key, independent of
    * stream length. The join itself hash-partitions both sides on
    * `user_id` (one co-partitioned exchange each, no broadcast,
    * no driver state), the same shape a 1000-executor deployment
    * shards. Works unchanged on batch inputs (no watermark node),
    * which is what the spec's batch ≡ stream assertion pins. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "2 hours",
      watermark: String = "10 minutes"): DataFrame =
    clickPurchaseJoin(clicks, purchases, horizon, watermark, "inner")

  /** [[clickPurchaseJoin]] with an explicit join type. `left_outer` is
    * the production attribution shape: a click with NO purchase inside
    * the horizon must still EMIT (null purchase columns) — but only
    * once the watermark proves no future purchase can match, i.e. when
    * it passes `click_time + horizon`. That is a STATE-EVICTION
    * emission: the engine holds the unmatched click in join state
    * until the global watermark (min across both sides) clears its
    * match window, then emits the null-extended row exactly once and
    * frees the state — the same bound the inner join already derives,
    * so outer state stays O(horizon + watermark) per key. Matched rows
    * emit when found, identical to the inner join. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String, watermark: String, joinType: String): DataFrame = {
    val a = withEventTime(clicks, watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_time").as("click_time"))
    val b = withEventTime(purchases, watermark)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("event_time").as("purchase_time"))
    a.join(b, col("user_id") === col("p_user") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_time"), col("purchase_time"))
  }
}
