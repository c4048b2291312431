package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t13 — connected-components near-dup clustering. The chain graph
  * forces multi-round label propagation (diameter 9: a single
  * propagate round would mislabel the tail), so the discovery loop's
  * convergence detection is load-bearing, not decorative. */
class DedupClustersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CC core: chain + pair + triangle resolve to min-labeled components") {
    import spark.implicits._
    // chain 1..10 (diameter 9), isolated pair, triangle with a chord
    val edges = (
      (1L to 9L).map(i => (i, i + 1)) ++
        Seq((100L, 101L)) ++
        Seq((50L, 51L), (51L, 52L), (50L, 52L))
      ).toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponentsOf(spark, edges).collect()
    val byDoc = cc.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
        r.getAs[Boolean]("keep"))).toMap
    assert(byDoc.size === 15)
    (1L to 10L).foreach { d => assert(byDoc(d) === ((1L, 10L, d == 1L))) }
    Seq(100L, 101L).foreach { d => assert(byDoc(d) === ((100L, 2L, d == 100L))) }
    Seq(50L, 51L, 52L).foreach { d => assert(byDoc(d) === ((50L, 3L, d == 50L))) }
  }

  test("CC core: a 150-node chain (diameter >> round cap) resolves correctly") {
    import spark.implicits._
    val edges = (1L to 149L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // BOTH convergence paths must label the chain identically: the
    // driver union-find (the default at this size) and the doubling
    // loop (forced — its pointer-jump round cap is what this chain
    // exists to exercise)
    def check(cc: Array[org.apache.spark.sql.Row]): Unit = {
      assert(cc.length === 150)
      cc.foreach { r =>
        assert(r.getAs[Long]("cluster_id") === 1L,
          s"node ${r.getAs[Long]("doc_id")} mislabeled")
        assert(r.getAs[Long]("cluster_size") === 150L)
      }
    }
    check(DedupOps.connectedComponentsOf(spark, edges).collect())
    spark.conf.set("graft.cc.localEdgeMax", "0")
    try check(DedupOps.connectedComponentsOf(spark, edges).collect())
    finally spark.conf.unset("graft.cc.localEdgeMax")
  }

  test("CC: overlapping invocations keep private checkpoints (big-graph path)") {
    import spark.implicits._
    // force the distributed spill/checkpoint path on tiny graphs —
    // past BOTH small-graph escapes (the driver union-find fast path
    // and the local-relation lineage cut)
    spark.conf.set("graft.cc.smallGraphMaxNodes", "0")
    spark.conf.set("graft.cc.localEdgeMax", "0")
    try {
      val e1 = (1L to 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val e2 = Seq((100L, 101L), (101L, 102L)).toDF("doc_a", "doc_b")
      // hold the first result lazily while the second invocation runs:
      // with shared checkpoint paths the second overwrote the files the
      // first result's scan still referenced
      val cc1 = DedupOps.connectedComponentsOf(spark, e1)
      val cc2 = DedupOps.connectedComponentsOf(spark, e2)
      val r1 = cc1.collect()
      assert(r1.length === 10 && r1.forall(_.getAs[Long]("cluster_id") === 1L))
      val r2 = cc2.collect()
      assert(r2.length === 3 && r2.forall(_.getAs[Long]("cluster_id") === 100L))
      // loop spills from this app are deleted once the final labels land
      val appId = spark.sparkContext.applicationId
      val stale = Option(new java.io.File("target/graft_ckpt").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.contains(appId) && f.getName.contains("_loop"))
      assert(stale.isEmpty,
        s"stale loop spills: ${stale.map(_.getName).mkString(",")}")
      // the final checkpoints survive the session (both results above
      // stayed readable) but are REGISTERED for the end-of-application
      // sweep — a long-lived session must not leak one dir per
      // invocation forever
      val registered = DedupOps.ccFinalCheckpoints
      assert(registered.size >= 2 &&
        registered.stream().allMatch(p => p.contains(appId)),
        s"final checkpoints not registered for shutdown sweep: $registered")
    } finally {
      spark.conf.unset("graft.cc.smallGraphMaxNodes")
      spark.conf.unset("graft.cc.localEdgeMax")
    }
  }

  test("CC core: empty edge list yields empty clustering") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupOps.connectedComponentsOf(spark, empty).count() === 0)
  }

  test("t13: clusters are consistent with the MinHash edge set") {
    val edges = DedupOps.minhashPairsOf(
      spark.read.parquet(s"$dir/documents.parquet"))
      .filter(col("est_jaccard") >= 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val rows = DedupOps.nearDupClusters(spark, dir).collect()
    val cluster = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // exactly the docs with at least one near-dup edge are clustered
    assert(cluster.keySet === edges.flatMap(e => Seq(e._1, e._2)).toSet)
    // both endpoints of every edge land in the same component
    edges.foreach { case (a, b) => assert(cluster(a) === cluster(b)) }
    // component invariants: id = min member, one keep per component,
    // size = member count
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === cid)
      assert(members.count(_.getAs[Boolean]("keep")) === 1)
      members.foreach(m =>
        assert(m.getAs[Long]("cluster_size") === members.length))
      assert(members.length >= 2)
    }
    assert(rows.nonEmpty)
    // leak check is CacheLifecycleSpec's job: t13 is part of its sweep
  }

  test("t29: no near-dup edge straddles the split; every doc assigned exactly once") {
    val rows = DedupOps.leakageSafeSplit(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length.toLong === total, "one split row per document")
    val split = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(split.values.toSet.subsetOf(Set("train", "eval")))
    // the leakage property: both endpoints of every near-dup edge get
    // the SAME split — a per-doc hash split fails this on any corpus
    // with near-duplicates
    DedupOps.minhashPairsOf(
      spark.read.parquet(s"$dir/documents.parquet"))
      .filter(col("est_jaccard") >= 0.5)
      .collect()
      .foreach { r =>
        val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        assert(split(a) === split(b),
          s"near-dup pair ($a, $b) straddles the split")
      }
    // the hash threshold actually splits (not all-train / all-eval)
    assert(split.values.toSet.size === 2)
  }

  test("t13: the label memo is action-stable and isolated per input dir") {
    val first = DedupOps.nearDupClusters(spark, dir).collect()
    // second invocation hits the (session, dir) memo: identical rows
    val again = DedupOps.nearDupClusters(spark, dir).collect()
    assert(again.map(_.toSeq.toVector).toSeq ===
      first.map(_.toSeq.toVector).toSeq)
    // a different corpus keys a different memo entry, not a stale hit:
    // compare the (cluster_id, doc_id) CONTENT sets, not row counts — a
    // count comparison is a data coincidence (two corpora can cluster
    // to equal counts with different members) and would also pass on a
    // stale hit of equal size
    val key = (rows: Array[org.apache.spark.sql.Row]) =>
      rows.map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("doc_id")))
        .toSet
    val other = DedupOps.nearDupClusters(spark, "/root/testdata/sf0.01")
      .collect()
    assert(key(other) !== key(first),
      "sf0.01 must not serve sf0.001's memoized labels")
  }
}
