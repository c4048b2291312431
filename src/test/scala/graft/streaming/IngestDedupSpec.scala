package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.SparkSpec

/** Streaming ≡ batch for ingest-time MinHash dedup: the sf0.001
  * documents fed through MemoryStream in id-ordered micro-batches must
  * flag exactly the docs the batch bucket rule flags (a doc is a
  * near-dup iff some LSH band bucket holds a smaller doc_id).
  */
class IngestDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucket-state dedup over micro-batches converges to the batch bucket rule") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val stream = IngestDedup.bucketCollisions(
      input.toDF().withColumnRenamed("_1", "doc_id")
        .withColumnRenamed("_2", "text"))
    val q = stream.writeStream
      .format("memory").queryName("collisions").outputMode("append").start()
    try {
      docs.grouped(170).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val streamed = IngestDedup.flaggedDocs(spark.table("collisions"))
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Int]("band"), r.getAs[Long]("dup_of"))).toSet
      val batch = IngestDedup.batchFlagged(spark,
        spark.read.parquet(s"$dir/documents.parquet")).collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Int]("band"), r.getAs[Long]("dup_of"))).toSet
      assert(batch.nonEmpty, "fixture corpus should contain near-dups")
      assert(streamed === batch)
      // every flag points at a strictly earlier canonical doc
      assert(streamed.forall { case (d, _, c) => c < d })
    } finally q.stop()
  }

  test("bucket TTL handler: timeout removes state so a post-expiry duplicate re-seeds") {
    import org.apache.spark.sql.streaming.TestGroupState
    val key = (0, "sig")
    def rows(ids: Long*) = ids.iterator.map(id => (id, 0, "sig"))
    val ttl = Some("1 hour")

    // arrival seeds the bucket and registers a timeout
    val s1 = TestGroupState.create[Long](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(), false)
    assert(IngestDedup.bucketHandler(ttl)(key, rows(7L), s1).toSeq === Nil)
    assert(s1.getOption.contains(7L) && s1.getTimeoutTimestampMs.isPresent)

    // within the TTL: duplicate flagged against the held canonical
    val s2 = TestGroupState.create[Long](Optional.of(7L),
      GroupStateTimeout.ProcessingTimeTimeout, 2000L, Optional.empty(), false)
    assert(IngestDedup.bucketHandler(ttl)(key, rows(9L), s2).toSeq ===
      Seq(IngestDedup.Collision(9L, 0, 7L)))

    // timeout fires: state dropped, nothing emitted
    val s3 = TestGroupState.create[Long](Optional.of(7L),
      GroupStateTimeout.ProcessingTimeTimeout, 9999L, Optional.empty(), true)
    assert(IngestDedup.bucketHandler(ttl)(key, Iterator.empty, s3).toSeq === Nil)
    assert(s3.isRemoved)

    // post-expiry re-arrival seeds fresh (no flag against doc 7)
    val s4 = TestGroupState.create[Long](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 10000L, Optional.empty(), false)
    assert(IngestDedup.bucketHandler(ttl)(key, rows(9L), s4).toSeq === Nil)
    assert(s4.getOption.contains(9L))
  }

  test("a later re-arrival of a bucket's canonical doc is not self-flagged") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val q = IngestDedup.bucketCollisions(
      input.toDF().withColumnRenamed("_1", "doc_id")
        .withColumnRenamed("_2", "text"))
      .writeStream
      .format("memory").queryName("selfdup").outputMode("append").start()
    try {
      val text = "alpha beta gamma delta epsilon zeta"
      input.addData(Seq((1L, text))); q.processAllAvailable()
      input.addData(Seq((1L, text), (2L, text))); q.processAllAvailable()
      val rows = spark.table("selfdup")
        .select(col("doc_id"), col("dup_of")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((2L, 1L)))
    } finally q.stop()
  }
}
