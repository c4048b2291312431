package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over the `events` stream —
  * the third Structured Streaming shape next to the stateful timeline
  * (`jobhistory/Streaming`) and the LSH ingest-dedup state
  * ([[IngestDedup]]): per-window per-type counts/sums whose state is
  * BOUNDED by a watermark, the property that makes an unbounded
  * stream runnable at all.
  *
  * Append-mode semantics: a window's row is emitted exactly once, when
  * the watermark passes its end; events arriving later than the
  * watermark allows are dropped (the documented trade — the batch
  * query over the same data includes them, and the spec pins both
  * sides of that difference).
  *
  * Scale design: the aggregation state is (window, event_type) keyed —
  * its size is O(active windows × types) regardless of event volume,
  * and partial aggregation combines map-side within each micro-batch
  * before the state-store shuffle.
  */
object EventWindows {

  /** Per (1-minute tumbling window, event_type) counts and rounded
    * value sums. `events` needs `ts` (BIGINT nanos — the parquet
    * nanosAsLong reading), `event_type`, `value`; works unchanged on
    * a batch DataFrame (same plan minus the watermark operator). */
  def windowedCounts(events: DataFrame,
      watermark: String = "2 minutes"): DataFrame = {
    val timed = events
      .withColumn("event_time", expr("timestamp_micros(ts DIV 1000)"))
    val marked =
      if (events.isStreaming) timed.withWatermark("event_time", watermark)
      else timed
    marked
      .groupBy(window(col("event_time"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
  }
}
