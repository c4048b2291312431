package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window top-k — the "trending now" shape: for each
  * tumbling event-time window, the k most frequent event types, kept
  * LIVE as events arrive rather than recomputed by a batch rank after
  * the fact.
  *
  * Dataflow: events keyed by their window start feed
  * `flatMapGroupsWithState`; per-window state is the (type → count)
  * histogram — CARDINALITY OF THE TYPE DOMAIN, not of the events — and
  * each micro-batch re-emits that window's current top-k (Update
  * mode: later batches supersede earlier emissions of the same
  * window). Ranking is on integer counts with the type string as the
  * tiebreak — a total order, so any engine reproduces it; no float
  * accumulates in state.
  *
  * Scale design (100 TB ingest): state shards by window key like any
  * keyed aggregation; per-key state is bounded by the type-domain
  * size. An unbounded deployment composes the same handler with an
  * event-time timeout so windows past the watermark drop their
  * histogram — the same dial as [[IngestDedup]]'s TTL.
  */
object WindowTopK {

  /** One emitted ranking row. */
  final case class Ranked(w_start_us: Long, rnk: Long, event_type: String,
      n: Long)

  private[streaming] def handler(k: Int)(key: Long,
      rows: Iterator[(Long, String)],
      state: GroupState[Map[String, Long]]): Iterator[Ranked] = {
    var m = state.getOption.getOrElse(Map.empty[String, Long])
    rows.foreach { case (_, t) => m = m.updated(t, m.getOrElse(t, 0L) + 1L) }
    state.update(m)
    m.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
      .map { case ((t, n), i) => Ranked(key, i + 1L, t, n) }
      .iterator
  }

  /** Top-`k` event types per 1-minute tumbling window over a
    * `(ts: long nanos, event_type)` stream. Update-mode compatible —
    * each batch re-emits the windows it touched. */
  def topKPerWindow(events: DataFrame, k: Int = 2): Dataset[Ranked] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(expr("(ts DIV 1000) DIV 60000000 * 60000000")
        .as("w_start_us"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(handler(k))
  }
}
