package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection at ingest — the t7 MinHash+LSH
  * operator run over an unbounded document stream, the shape a
  * training-data pipeline needs when documents arrive continuously
  * and duplicates must be flagged before they land in the corpus.
  *
  * Dataflow: the map-only banded-signature projection
  * ([[graft.queries.DedupOps.bandedSignaturesOf]] — shared verbatim
  * with the batch operator, so stream and batch agree by
  * construction) feeds a `groupByKey((band, sig))` +
  * `flatMapGroupsWithState`: each LSH bucket keeps the first document
  * it ever saw; every later arrival in the same bucket emits a
  * `(doc_id, band, dup_of)` collision row. A document is a near-dup
  * iff ANY of its bands collides — the same bucket rule the batch
  * join applies.
  *
  * Scale design (100 TB ingest): state is partitioned by the bucket
  * key, so a 1000-executor cluster shards the bucket table the same
  * way the batch self-join shards its shuffle; per-bucket state is
  * one long (the canonical doc), not the documents themselves. State
  * is unbounded by default (dedup-against-all-history semantics);
  * production bounds it with `stateTtl` — buckets idle longer than
  * the TTL are dropped, degrading gracefully to
  * dedup-within-recent-history (the standard ingest trade-off).
  */
object IngestDedup {

  /** One emitted bucket collision. */
  final case class Collision(doc_id: Long, band: Int, dup_of: Long)

  /** The per-bucket state transition — extracted so the TTL path is
    * unit-testable with `TestGroupState` (a streaming query with
    * ProcessingTimeTimeout keeps scheduling timeout-check batches,
    * which `processAllAvailable` never sees drain). */
  private[streaming] def bucketHandler(stateTtl: Option[String])(
      key: (Int, String), rows: Iterator[(Long, Int, String)],
      state: GroupState[Long]): Iterator[Collision] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // deterministic within a micro-batch: the smallest id in the
      // batch claims a fresh bucket, matching the batch operator's
      // min-id canonical choice
      val ids = rows.map(_._1).toVector.sorted
      val canon = state.getOption.getOrElse(ids.head)
      if (!state.exists) state.update(canon)
      stateTtl.foreach(state.setTimeoutDuration)
      ids.iterator.filter(_ != canon)
        .map(Collision(_, key._1, canon))
    }

  /** Per-(band, sig) bucket collision stream. Append-mode compatible
    * (emits only on arrival; nothing is retracted). `stateTtl` None =
    * keep every bucket forever (exact vs all history). */
  def bucketCollisions(docs: DataFrame,
      stateTtl: Option[String] = None): Dataset[Collision] = {
    val s = docs.sparkSession
    import s.implicits._
    val bands = graft.queries.DedupOps.bandedSignaturesOf(docs)
      .select(col("doc_id").cast("long"), col("band").cast("int"),
        col("sig"))
      .as[(Long, Int, String)]
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bands.groupByKey { case (_, band, sig) => (band, sig) }
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        bucketHandler(stateTtl))
  }

  /** Convenience: distinct flagged near-duplicate docs with one
    * witness bucket each (min band, then min canonical) — what an
    * ingest filter joins against to drop arrivals. Batch-queryable
    * per micro-batch sink; the streaming equivalence spec asserts it
    * converges to the batch bucket rule. */
  def flaggedDocs(collisions: DataFrame): DataFrame =
    collisions.groupBy(col("doc_id"))
      .agg(min(col("band")).as("band"), min(col("dup_of")).as("dup_of"))

  /** Batch reference for the spec: docs flagged by the identical
    * bucket rule evaluated all-at-once — a doc is a near-dup iff some
    * band bucket contains a smaller doc_id. */
  def batchFlagged(s: SparkSession, docs: DataFrame): DataFrame = {
    val bands = graft.queries.DedupOps.bandedSignaturesOf(docs)
    val canon = bands.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("canon"))
    bands.join(canon, Seq("band", "sig"))
      .filter(col("doc_id") > col("canon"))
      .groupBy(col("doc_id"))
      .agg(min(col("band")).as("band"), min(col("canon")).as("dup_of"))
  }
}
