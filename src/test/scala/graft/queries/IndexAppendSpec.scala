package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** t35 write-back contract: appending a delta tranche into the rw band
  * index is (1) EXACT — serve-after-append equals a from-scratch
  * rebuild over base+delta, because canon = min is merge-associative;
  * (2) idempotent — an absorbed tranche re-appends as a no-op (nonce
  * untouched); (3) crash-safe — the marker-last contract degrades a
  * mid-append crash to a rebuild, never to serving half-appended state;
  * and (4) LIVING — a later batch's duplicates of an EARLIER appended
  * batch flag through the updated index (probe → append → probe), the
  * property t34's read-only artifact cannot provide.
  */
class IndexAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rebuildOverFullCorpus(d: String) =
    DedupOps.bandedSignaturesOf(Tables(spark, d, "documents"))
      .groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("canon"))
      .orderBy(col("band"), col("sig"))
      .collect().map(_.toSeq.toVector).toSeq

  test("t35 serve-after-append equals the from-scratch rebuild exactly") {
    val served = DedupOps.indexAppendServe(spark, dir)
      .collect().map(_.toSeq.toVector).toSeq
    assert(served === rebuildOverFullCorpus(dir))
    // after the append, _CUT sits at the corpus max: the whole tail is
    // absorbed, nothing remains unindexed
    val idx = DedupOps.rwBandIndexPath(spark, dir)
    val hi = Tables(spark, dir, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(new String(Files.readAllBytes(idx.resolve("_CUT")), "UTF-8")
      .trim.toLong === hi)
    // and the bucket dir holds BOTH generations: the base build's part
    // files and the appended tranche's (the O(batch) LSM write — the
    // base relation was not rewritten)
    val names = idx.resolve("buckets").toFile.listFiles().map(_.getName)
    assert(names.exists(_.startsWith("part-")), "base build files missing")
    assert(names.exists(_.startsWith("append-")), "appended files missing")
  }

  test("t35 is idempotent: a second serve re-appends nothing (nonce untouched)") {
    DedupOps.indexAppendServe(spark, dir).collect()
    val marker =
      DedupOps.rwBandIndexPath(spark, dir).resolve("_INDEX_READY")
    val nonce0 = new String(Files.readAllBytes(marker), "UTF-8")
    assert(nonce0.nonEmpty, "the marker must carry a nonce")
    val again = DedupOps.indexAppendServe(spark, dir).collect()
    assert(new String(Files.readAllBytes(marker), "UTF-8") === nonce0,
      "an absorbed tranche must re-append as a no-op")
    assert(again.nonEmpty)
  }

  test("t35 crash-safety: a marker-less (mid-append-crash) artifact rebuilds, never serves") {
    DedupOps.indexAppendServe(spark, dir).collect()
    val idx = DedupOps.rwBandIndexPath(spark, dir)
    val marker = idx.resolve("_INDEX_READY")
    // simulate the crash window: the append removed the nonce and died
    // before re-stamping — the artifact is on disk but NOT ready
    Files.delete(marker)
    val served = DedupOps.indexAppendServe(spark, dir)
      .collect().map(_.toSeq.toVector).toSeq
    // the recovery path rebuilt from scratch (fresh nonce) and the
    // result is still exactly the full-corpus relation
    assert(Files.exists(marker) && Files.size(marker) > 0,
      "recovery must re-stamp a fresh nonce")
    assert(served === rebuildOverFullCorpus(dir))
  }

  test("t35 probe → append → probe: a batch-2 duplicate of a batch-1 doc flags via the UPDATED index") {
    // three tranches: base {1, 2}, batch 1 {100 (dup of base 1),
    // 101 (new)}, batch 2 {151 (dup of batch-1 101!), 152 (new)}.
    // midpoint cut = (1 + 152) / 2 = 76 → the build indexes {1, 2}.
    val tmp = Files.createTempDirectory("t35_spec_").toString
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "quick brown foxes vault lazy hounds"),
      (151L, "quick brown foxes vault lazy hounds"),
      (152L, "planets orbit the bright distant star"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    DedupOps.buildRwBandIndex(spark, tmp)
    // probe batch 1 against the base index: 100 flags against base 1
    val p1 = DedupOps.rwIndexProbe(spark, tmp, upTo = 150L).collect()
    assert(p1.map(_.getAs[Long]("doc_id")).toSeq === Seq(100L), p1.toSeq)
    assert(p1.head.getAs[Long]("dup_of") === 1L)
    // absorb batch 1; _CUT advances to its max id
    assert(DedupOps.appendBandIndex(spark, tmp, upTo = 150L) === 101L)
    // probe batch 2: 151's only twin is batch-1's 101 — flagging it is
    // possible ONLY because the append wrote 101's buckets back
    val p2 = DedupOps.rwIndexProbe(spark, tmp).collect()
    assert(p2.map(_.getAs[Long]("doc_id")).toSeq === Seq(151L), p2.toSeq)
    assert(p2.head.getAs[Long]("dup_of") === 101L,
      "the batch-2 duplicate must resolve to the APPENDED batch-1 canon")
    // t34's read-only artifact is untouched by the write-back family:
    // its probe still answers from the base-tranche buckets alone
    val t34 = DedupOps.incrementalDedup(spark, tmp).collect()
    assert(t34.map(_.getAs[Long]("doc_id")).toSeq === Seq(100L),
      "t34's read-only gate must be unaffected by t35 appends")
    // absorbing batch 2 converges the living index on the full corpus
    DedupOps.appendBandIndex(spark, tmp)
    val served = DedupOps.servedBandBuckets(spark, tmp)
      .orderBy(col("band"), col("sig"))
      .collect().map(_.toSeq.toVector).toSeq
    assert(served === rebuildOverFullCorpus(tmp))
  }

  test("m9 media write-back: serve-after-append equals the rebuild; nonce-idempotent") {
    val served = MultimodalOps.mediaIndexAppendServe(spark, dir)
      .collect().map(_.toSeq.toVector).toSeq
    val rebuild = MultimodalOps
      .mediaAhashOf(MultimodalOps.mediaTable(spark, dir)
        .select(col("doc_id"), col("payload")))
      .groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("canon"))
      .orderBy(col("ahash"))
      .collect().map(_.toSeq.toVector).toSeq
    assert(served === rebuild)
    val idx = MultimodalOps.rwMediaIndexPath(spark, dir)
    val names = idx.resolve("buckets").toFile.listFiles().map(_.getName)
    assert(names.exists(_.startsWith("append-")),
      "the delta generation must be on disk as appended files")
    // absorbed tranche ⇒ the next serve re-appends nothing
    val marker = idx.resolve("_INDEX_READY")
    val nonce0 = new String(Files.readAllBytes(marker), "UTF-8")
    MultimodalOps.mediaIndexAppendServe(spark, dir).collect()
    assert(new String(Files.readAllBytes(marker), "UTF-8") === nonce0)
    // and the m8 read-only artifact still carries the BASE cut — the
    // write-back family never touches it
    val hi = Tables(spark, dir, "documents")
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(new String(Files.readAllBytes(idx.resolve("_CUT")), "UTF-8")
      .trim.toLong === hi)
    MultimodalOps.buildMediaIndex(spark, dir)
    val roCut = new String(Files.readAllBytes(
      MultimodalOps.mediaIndexPath(spark, dir).resolve("_CUT")),
      "UTF-8").trim.toLong
    assert(roCut < hi, "m8's read-only index must keep the base cut")
  }

  test("q35/q36 partials write-back: the appended artifact serves exactly what the read-only families serve") {
    // q35's folded artifact must publish q33's aggregate exactly (the
    // cent partials merge associatively — append ≡ rebuild)
    val q35 = Relational.q35AggAppend(spark, dir)
      .collect().map(_.toSeq.toVector).toSeq
    val q33 = Relational.q33IncrementalAgg(spark, dir)
      .collect().map(_.toSeq.toVector).toSeq
    assert(q35 === q33)
    // q36's folded sketches must estimate EXACTLY what q34's
    // merge-at-read path estimates (union is register-wise max —
    // folding it into the artifact is invisible)
    val q36est = Relational.q36MergedEstimates(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val q34est = Relational.q34MergedEstimates(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(q36est === q34est)
    assert(Relational.q36SketchAppend(spark, dir).collect()
      .forall(_.getAs[Boolean]("within_err")))
    // both artifacts carry the advanced watermark and the appended
    // generation as their own files; nonce idempotency on re-serve
    Seq(Relational.q35RwPath(spark, dir),
        Relational.q36RwPath(spark, dir)).foreach { idx =>
      val hi = Tables(spark, dir, "events")
        .agg(max(col("ts"))).head().getLong(0)
      assert(new String(Files.readAllBytes(idx.resolve("_CUT")), "UTF-8")
        .trim.toLong === hi, s"$idx: _CUT must sit at the data max")
      val names = idx.resolve("partials").toFile.listFiles().map(_.getName)
      assert(names.exists(_.startsWith("append-")),
        s"$idx: appended generation missing")
      assert(names.exists(_.startsWith("part-")),
        s"$idx: base generation missing")
    }
    val marker = Relational.q35RwPath(spark, dir).resolve("_INDEX_READY")
    val nonce0 = new String(Files.readAllBytes(marker), "UTF-8")
    Relational.q35AggAppend(spark, dir).collect()
    assert(new String(Files.readAllBytes(marker), "UTF-8") === nonce0,
      "an absorbed tranche must re-append as a no-op")
  }

  // plan pins live HERE, not in PlanSpec: t35 mutates its artifact, and
  // the crash-safety test above rebuilds it — a parallel suite probing
  // the same directory would race the rebuild's rm
  test("t35 plans: probe pushes the cut to the delta scan; serve reads only the artifact") {
    DedupOps.indexAppendServe(spark, dir).collect()
    val serve = DedupOps.servedBandBuckets(spark, dir)
      .queryExecution.executedPlan.toString
    assert(serve.contains("band_index_rw_"),
      "serve must read the persisted artifact")
    assert(!serve.contains("documents.parquet"),
      s"serve must never re-scan the corpus:\n$serve")
    val probe = DedupOps.rwIndexProbe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(probe.contains(
      "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,"),
      s"the _CUT watermark must push to the documents scan:\n$probe")
    assert("documents\\.parquet".r.findAllIn(probe).size <= 1,
      s"the probe must scan the corpus once (delta only):\n$probe")
  }
}
