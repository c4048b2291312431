package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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
