package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermarked windowed aggregation, all three window kinds: a stream
  * fed in time order must converge to the batch aggregation of the
  * same rows (tumbling, sliding, session), and a row arriving later
  * than the watermark allows must be DROPPED by the stream while the
  * batch query still counts it — both sides of the append-mode trade
  * pinned.
  */
class EventWindowsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run[T <: Product : Encoder](batches: Seq[Seq[T]], name: String,
      cols: Seq[String])(f: DataFrame => DataFrame): DataFrame = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[T]
    val stream = f(input.toDF().toDF(cols: _*))
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  private def typedRows(): Seq[(Long, String, Double)] = {
    val events = graft.Tables(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    events.collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
  }

  private def assertConverged(streamed: DataFrame, batch: DataFrame): Unit = {
    assert(batch.count() > 1)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("in-order stream converges to the batch windowed aggregation") {
    val spark2 = spark
    import spark2.implicits._
    val rows = typedRows()
    // time-ordered micro-batches, then one far-future row so the
    // watermark passes every fixture window and append emits them all
    val flushTs = rows.last._1 + 3600L * 1000 * 1000 * 1000
    val streamed = run(
      rows.grouped(400).toSeq :+ Seq((flushTs, "flush", 0.0)), "win_conv",
      Seq("ts", "event_type", "value"))(EventWindows.windowedCounts(_))
      .filter(col("event_type") =!= "flush")
    val batch = EventWindows.windowedCounts(
      graft.Tables(spark, dir, "events")
        .select(col("ts"), col("event_type"), col("value")))
    assertConverged(streamed, batch)
  }

  test("sliding windows: stream converges to batch; each event lands in 2 windows") {
    val spark2 = spark
    import spark2.implicits._
    val rows = typedRows()
    val flushTs = rows.last._1 + 3600L * 1000 * 1000 * 1000
    val streamed = run(
      rows.grouped(400).toSeq :+ Seq((flushTs, "flush", 0.0)), "win_slide",
      Seq("ts", "event_type", "value"))(EventWindows.slidingCounts(_))
      .filter(col("event_type") =!= "flush")
    val batch = EventWindows.slidingCounts(
      graft.Tables(spark, dir, "events")
        .select(col("ts"), col("event_type"), col("value")))
    assertConverged(streamed, batch)
    // length/slide = 2: summed sliding counts double the event total
    val total = batch.agg(sum(col("n"))).head.getLong(0)
    assert(total === 2 * rows.length,
      s"every event must appear in exactly 2 sliding windows ($total)")
  }

  test("session windows: stream converges to batch; gap merges and splits sessions") {
    val spark2 = spark
    import spark2.implicits._
    val events = graft.Tables(spark, dir, "events")
      .select(col("ts"), col("user_id"), col("value"))
    val rows = events.collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
    val flushTs = rows.last._1 + 24L * 3600 * 1000 * 1000 * 1000
    val streamed = run(
      rows.grouped(400).toSeq :+ Seq((flushTs, -1L, 0.0)), "win_sess",
      Seq("ts", "user_id", "value"))(EventWindows.sessionCounts(_))
      .filter(col("user_id") =!= -1L)
    val batch = EventWindows.sessionCounts(events)
    assertConverged(streamed, batch)
    // cross-check against q19's window-based sessionization: same
    // 30-minute gap rule, so per-user session counts must agree
    val q19 = graft.queries.Relational.q19Sessionize(spark, dir)
      .select(col("user_id"), col("n_sessions"))
    val fromWindows = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions_sw"))
    val diff = q19.join(fromWindows, "user_id")
      .filter(col("n_sessions") =!= col("n_sessions_sw"))
    assert(diff.count() === 0,
      "session_window disagrees with the q19 sessionization rule")
  }

  test("session windows merge within the gap and split beyond it") {
    val spark2 = spark
    import spark2.implicits._
    val min = 60L * 1000 * 1000 * 1000 // ns
    val t0 = 1000000L * min
    // user 1: events 10 min apart merge into ONE session; user 2: a
    // 31-min silence splits TWO sessions
    val batches = Seq(
      Seq((t0, 1L, 1.0), (t0 + 10 * min, 1L, 2.0), (t0 + 20 * min, 1L, 3.0),
        (t0, 2L, 1.0), (t0 + 31 * min, 2L, 1.0)),
      Seq((t0 + 600 * min, -1L, 0.0))) // flush
    val streamed = run(batches, "win_sess_merge",
      Seq("ts", "user_id", "value"))(EventWindows.sessionCounts(_))
      .filter(col("user_id") =!= -1L).collect()
    val u1 = streamed.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length === 1, "user 1's events must merge into one session")
    assert(u1.head.getAs[Long]("n_events") === 3L)
    assert(u1.head.getAs[Double]("sum_value") === 6.0)
    val u2 = streamed.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 2, "user 2's silence must split two sessions")
  }

  test("a row later than the watermark is dropped by the stream, kept by batch") {
    val spark2 = spark
    import spark2.implicits._
    val hour = 3600L * 1000 * 1000 * 1000 // ns
    val t0 = 1000L * hour
    val late = (t0 + 30L * 1000 * 1000 * 1000, "click", 1.0) // back in window 0
    val batches = Seq(
      Seq((t0, "click", 1.0), (t0 + 10L * 1000 * 1000 * 1000, "click", 2.0)),
      Seq((t0 + hour, "view", 1.0)), // advances the watermark an hour
      Seq(late),                     // > 2 min behind: dropped
      Seq((t0 + 2 * hour, "flush", 0.0)))
    val streamed = run(batches, "win_late",
      Seq("ts", "event_type", "value"))(EventWindows.windowedCounts(_))
    val w0 = streamed
      .filter(col("event_type") === "click").collect()
    assert(w0.length === 1)
    assert(w0.head.getAs[Long]("n") === 2L, "late row must not be counted")
    // the batch query over the identical rows DOES count it
    val all = batches.flatten.toDF("ts", "event_type", "value")
    val batchW0 = EventWindows.windowedCounts(all)
      .filter(col("event_type") === "click").collect()
    assert(batchW0.head.getAs[Long]("n") === 3L)
  }
}
