package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-bucket candidate cap ([[DedupOps.LshBucketCap]]) on the t7
  * (band, sig) join and the t8 pigeonhole-block join: a degenerate
  * corpus of mass-identical documents previously collapsed into one
  * unbounded bucket, making the self-join O(B²) with B = corpus size.
  * With the cap, every bucket splits into ⌈cnt/cap⌉ sub-buckets of
  * ≤ ~cap docs, so pair work is O(buckets · cap²) — linear in the
  * corpus at fixed cap.
  *
  * The adversarial test lowers the cap via `graft.lsh.bucketCap` so
  * the split semantics are exercised at a size that runs in seconds;
  * the arithmetic is identical at the default cap (the 50k-identical
  * corpus completes because pair count drops from ~1.25 × 10⁹ per
  * band to ~cap²/2 per sub-bucket).
  */
class LshBucketCapSpec extends SparkSpec {

  test("t7/t8: 50k identical docs complete with bounded per-bucket pairs") {
    import spark.implicits._
    val n = 50000L
    val cap = 32
    spark.conf.set("graft.lsh.bucketCap", cap.toString)
    try {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        lit("alpha beta gamma delta epsilon zeta eta theta").as("text"))
      // every doc shares every (band, sig) bucket; sub-bucketing by
      // doc_id % ⌈n/cap⌉ bounds each block at ≤ cap docs, so the
      // distinct pair count is at most ⌈n/cap⌉ · cap·(cap−1)/2
      val subs = math.ceil(n.toDouble / cap).toLong
      val pairBound = subs * (cap.toLong * (cap - 1) / 2)
      val t7 = DedupOps.minhashPairsOf(docs)
      val nT7 = t7.count()
      assert(nT7 > 0L && nT7 <= pairBound,
        s"t7 pairs $nT7 outside (0, $pairBound]")
      // identical docs agree on the full signature
      assert(t7.agg(min(col("est_jaccard"))).head.getDouble(0) === 1.0)
      val t8 = DedupOps.simhashCandidates(docs)
      val nT8 = t8.count()
      assert(nT8 > 0L && nT8 <= pairBound,
        s"t8 pairs $nT8 outside (0, $pairBound]")
      assert(t8.agg(max(col("hamming"))).head.getLong(0) === 0L)
      // m6's pigeonhole blocks share the cap: 50k IDENTICAL hashes
      // collapse into one (k, blk) per k — without the sub-split the
      // edge join would be O(n²)
      val m6 = MultimodalOps.ahashHammingEdges(
        spark.range(n).select(col("id").as("doc_id"),
          lit(0x0123456789abcdefL).as("ahash")))
      val nM6 = m6.count()
      assert(nM6 > 0L && nM6 <= pairBound,
        s"m6 edges $nM6 outside (0, $pairBound]")
    } finally spark.conf.unset("graft.lsh.bucketCap")
  }

  test("default cap is a no-op at correctness-gate scale (sf0.01)") {
    // the driver's DuckDB compare runs at sf0.01 with UNCAPPED oracle
    // SQL — sound only while no real bucket reaches the default cap
    // there (⌈cnt/cap⌉ = 1 → sub ≡ 0 → the join is bitwise the
    // uncapped one). Pin that premise against the actual data.
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val maxBand = DedupOps.bandedSignaturesOf(d)
      .groupBy(col("band"), col("sig")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxBand < DedupOps.LshBucketCap,
      s"largest (band, sig) bucket $maxBand reaches the default cap " +
        s"${DedupOps.LshBucketCap}: the sf0.01 oracles would diverge")
    val maxBlk = DedupOps.simhashFingerprints(d)
      .select(col("doc_id"), explode(expr("transform(sequence(0, 3), " +
        "k -> struct(k AS k, shiftright(fp, 8 * k) & 255 AS blk))")).as("b"))
      .groupBy(col("b.k"), col("b.blk")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxBlk < DedupOps.LshBucketCap,
      s"largest simhash block bucket $maxBlk reaches the default cap")
    val maxAhashBlk = MultimodalOps.mediaAhash(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), explode(expr("transform(sequence(0, 3), " +
        "k -> struct(k AS k, shiftright(ahash, 16 * k) & 65535 AS blk))")).as("b"))
      .groupBy(col("b.k"), col("b.blk")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxAhashBlk < DedupOps.LshBucketCap,
      s"largest ahash block bucket $maxAhashBlk reaches the default cap")
  }
}
