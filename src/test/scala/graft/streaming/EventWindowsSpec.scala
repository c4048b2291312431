package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermarked windowed aggregation: the stream fed in time order must
  * converge to the batch aggregation of the same rows, and a row
  * arriving later than the watermark allows must be DROPPED by the
  * stream while the batch query still counts it — both sides of the
  * append-mode trade pinned.
  */
class EventWindowsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(batches: Seq[Seq[(Long, String, Double)]],
      name: String): org.apache.spark.sql.DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val stream = EventWindows.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"))
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("in-order stream converges to the batch windowed aggregation") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("ts"), col("event_type"), col("value"))
    val rows = events.collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
    // time-ordered micro-batches, then one far-future row so the
    // watermark passes every fixture window and append emits them all
    val flushTs = rows.last._1 + 3600L * 1000 * 1000 * 1000
    val streamed = run(
      rows.grouped(400).toSeq :+ Seq((flushTs, "flush", 0.0)), "win_conv")
      .filter(col("event_type") =!= "flush")
    val batch = EventWindows.windowedCounts(events)
    assert(batch.count() > 1)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("a row later than the watermark is dropped by the stream, kept by batch") {
    val hour = 3600L * 1000 * 1000 * 1000 // ns
    val t0 = 1000L * hour
    val late = (t0 + 30L * 1000 * 1000 * 1000, "click", 1.0) // back in window 0
    val batches = Seq(
      Seq((t0, "click", 1.0), (t0 + 10L * 1000 * 1000 * 1000, "click", 2.0)),
      Seq((t0 + hour, "view", 1.0)), // advances the watermark an hour
      Seq(late),                     // > 2 min behind: dropped
      Seq((t0 + 2 * hour, "flush", 0.0)))
    val streamed = run(batches, "win_late")
    val w0 = streamed
      .filter(col("event_type") === "click").collect()
    assert(w0.length === 1)
    assert(w0.head.getAs[Long]("n") === 2L, "late row must not be counted")
    // the batch query over the identical rows DOES count it
    val spark2 = spark
    import spark2.implicits._
    val all = batches.flatten.toDF("ts", "event_type", "value")
    val batchW0 = EventWindows.windowedCounts(all)
      .filter(col("event_type") === "click").collect()
    assert(batchW0.head.getAs[Long]("n") === 3L)
  }
}
