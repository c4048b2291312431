package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t42 — incremental connected components on the cluster shelf.
  *
  * The contract under pin: APPEND-THEN-SERVE ≡ REBUILD, exactly — the
  * merge-graph update (delta docs + touched current labels, converged
  * by the same CC loop) must reproduce the full-corpus
  * bucket-connectivity clusters including the hard cases: a delta
  * chain BRIDGING two base clusters (their members relabel to the
  * merged min), an absorbed base SINGLETON that becomes its new
  * cluster's canon (it had no labels row at all — the append must
  * create one), and delta-only clusters. The min fold keeps every
  * mutation associative: relabels only ever decrease.
  */
class CcIncrementalSpec extends SparkSpec {

  private val tA = "alpha beta gamma delta epsilon zeta"
  private val tB = "one two three four five six"
  private val tC = "quick brown foxes vault lazy hounds"

  /** lo=1 hi=163 → cut=82. Base: cluster A {1, 2}, cluster B
    * {10, 11}, singleton 50. Delta: 100 = A++B (the bridge — it
    * shares buckets with BOTH sides iff some band's min-hashes all
    * come from A's shingles and another's all from B's), 120 = tC
    * (absorbs the base singleton 50, which becomes the canon),
    * 163 = unique text (a delta singleton — must emit nothing). */
  private def craftCorpus(): java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory("t42_spec_")
    import spark.implicits._
    val stage = tmp.resolve("stage")
    Seq(
      (1L, tA), (2L, tA),
      (10L, tB), (11L, tB),
      (50L, tC),
      (100L, tA + " " + tB),
      (120L, tC),
      (163L, "planets orbit the bright distant star"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, tmp.resolve("documents.parquet"))
    tmp
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("cluster_id"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_size"),
      r.getAs[Boolean]("keep"))).toSeq

  test("t42 append ≡ rebuild: bridge merge, singleton absorption, canon relabel") {
    val tmp = craftCorpus()
    val served = rows(DedupOps.ccIncrementalServe(spark, tmp.toString))
    // the ground truth: the same bucket-connectivity CC rebuilt over
    // the FULL corpus through the identical engine pieces
    val expected = rows(DedupOps.rebuildBucketClusters(spark, tmp.toString))
    assert(served === expected)
    val byDoc = served.map(r => r._2 -> r._1).toMap
    // the fixture really exercised the merge: the bridge put A and B
    // in ONE cluster labeled by A's min — B's members RELABELED
    assert(byDoc.get(1L).contains(1L) && byDoc.get(10L).contains(1L) &&
      byDoc.get(11L).contains(1L) && byDoc.get(100L).contains(1L),
      s"the bridge must merge A and B under canon 1: $served")
    // the absorbed base singleton is its new cluster's CANON — it had
    // no labels row in the base artifact at all
    assert(byDoc.get(50L).contains(50L) && byDoc.get(120L).contains(50L),
      s"singleton 50 must absorb 120 as canon: $served")
    // the delta singleton emits nothing
    assert(!byDoc.contains(163L), s"163 has no bucket-mate: $served")
    // the relabel landed as ONE append generation beside the base
    val out = DedupOps.t42IndexPath(spark, tmp.toString)
    val names = out.resolve("labels").toFile.listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(names.exists(_.startsWith("append-163-")), names.toSeq)
    assert(names.exists(_.startsWith("part-")),
      "the base generation must be untouched (LSM append, no rewrite)")
    // idempotent: everything is absorbed — a re-append is a no-op
    val names0 = names.sorted.toSeq
    DedupOps.t42Append(spark, tmp.toString)
    assert(out.resolve("labels").toFile.listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq ===
      names0, "an absorbed corpus must not re-append")
    DedupOps.deleteRecursively(tmp.toFile)
  }

  test("t42 two-tranche composition: a second append merges against state the FIRST append wrote") {
    val tmp = craftCorpus()
    DedupOps.buildT42Index(spark, tmp.toString)
    // tranche 1: the bridge and the tC twin; tranche 2: 163
    DedupOps.t42Append(spark, tmp.toString, upTo = 130L)
    val mid = rows(ccAssembled(tmp))
    assert(mid.map(r => r._2 -> r._1).toMap.get(11L).contains(1L),
      s"the first tranche's merge must already serve: $mid")
    DedupOps.t42Append(spark, tmp.toString)
    val fin = rows(ccAssembled(tmp))
    val expected = rows(DedupOps.rebuildBucketClusters(spark, tmp.toString))
    assert(fin === expected,
      "two staged appends must land exactly where one does")
    DedupOps.deleteRecursively(tmp.toFile)
  }

  private def ccAssembled(tmp: java.nio.file.Path) = {
    val out = DedupOps.requireReady(DedupOps.t42IndexPath(spark,
      tmp.toString))
    DedupOps.ccClustersOfFolded(spark, out)
  }
}
