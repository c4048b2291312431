package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-checks between the dedup family and the multimodal stub on
  * sf0.001 (fast) — the DuckDB oracles cover exact parity; these pin
  * the semantics the oracles can't see (consistency across operators,
  * JVM-side decode values).
  */
class ScaleOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t7: exact duplicate docs get identical MinHash signatures (est_jaccard = 1.0)") {
    val dups = TextOps.dedupExact(spark, dir)
      .filter(col("n_copies") > 1)
    if (dups.count() > 0) {
      val top = DedupOps.minhashLsh(spark, dir).collect()
      assert(top.nonEmpty && top.head.getAs[Double]("est_jaccard") === 1.0)
    }
  }

  test("t8: exact duplicate docs are hamming-0 SimHash pairs") {
    val nDups = TextOps.dedupExact(spark, dir)
      .filter(col("n_copies") > 1).count()
    val pairs = DedupOps.simhashPairs(spark, dir).collect()
    if (nDups > 0) {
      assert(pairs.nonEmpty && pairs.head.getAs[Long]("hamming") === 0L)
    }
    // pigeonhole guarantee: reported pairs are within the block bound
    assert(pairs.forall(_.getAs[Long]("hamming") <= 3L))
  }

  test("t8 pigeonhole completeness: block join finds every hamming<=3 pair (brute force)") {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    val fp = DedupOps.simhashFingerprints(
      spark.read.parquet(s"$dir/documents.parquet"))
    val brute = fp.as("a").crossJoin(fp.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.fp ^ b.fp)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("a.doc_id"), col("b.doc_id"), col("hamming"))
      .collect().map(_.toSeq).toSet
    val viaBlocks = DedupOps.simhashCandidates(
      spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(_.toSeq).toSet
    assert(brute.nonEmpty)
    assert(viaBlocks === brute)
  }

  test("t6 stop-shingle df filter: a hot shingle stops generating quadratic candidates") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // 40 docs share a boilerplate prefix (3 hot shingles, df=40 each);
    // the rest of every doc is unique (df=1 shingles)
    val docs = (1 to 40).map(i =>
      (i.toLong, s"common boiler plate phrase u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    // key column: "shingle" (string) for the raw pairs, "sh" (60-bit
    // hash key) for the df-filtered pairs
    def candidates(sh: DataFrame, key: String): Long = sh.as("a")
      .join(sh.as("b"), col(s"a.$key") === col(s"b.$key") &&
        col("a.doc_id") < col("b.doc_id")).count()
    val unfiltered = candidates(DedupOps.shinglesOf(docs), "shingle")
    val filtered = candidates(TextOps.rareShinglesOf(docs, maxDf = 5), "sh")
    // 2 boilerplate-only shingles x 40·39/2 pairs each, plus the
    // doc-unique tail — the df filter removes all of the quadratic part
    assert(unfiltered >= 2L * (40L * 39 / 2))
    assert(filtered === 0L)
    // end-to-end: t6 on the hot corpus emits no boilerplate-only pairs
    assert(TextOps.ngramJaccardOf(docs, maxDf = 5).count() === 0L)
  }

  test("v4 IVF multi-probe: recall@3 vs brute force is monotone in nprobe, ~1.0 at full probe") {
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val brute = top3(VectorOps.cosineTopK(spark, dir)
      .filter(col("rnk") <= 3).collect())
    def recall(np: Int): Double = {
      val got = top3(VectorOps.annIvfProbes(spark, dir, np).collect())
      val hits = brute.toSeq
        .map { case (q, t) => (t & got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / brute.values.map(_.size).sum
    }
    val nCells = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().count().toInt
    val r1 = recall(1)
    val r3 = recall(3)
    val rAll = recall(nCells)
    assert(r3 >= r1, s"recall@3 must not drop when widening: $r1 -> $r3")
    // probing every cell is brute force (rounded-cos ties aside)
    assert(rAll >= 0.9, s"full probe recall was $rAll")
  }

  test("t9: near-dup pairs are valid cosines within one k-means cell") {
    val rows = DedupOps.embeddingNearDup(spark, dir).collect()
    assert(rows.length === 20)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.000001))
  }

  test("t9: planted near-duplicates co-assign to a shared cell (blocking recall)") {
    graft.functions.VectorDotProduct.register(spark)
    // the fixture has NO true near-duplicates (max pairwise cosine
    // 0.48 — isotropic noise with faint label structure), so blocking
    // recall is pinned on PLANTED ones: a copy of every vector with
    // dim 0 shifted by 1e-4 (cosine ≈ 1). Multi-probe assignment must
    // put ≥ 95% of the planted pairs in at least one shared cell —
    // the property that makes the operator a near-dup detector.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = e
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> CAST(x + IF(i = 0, 1e-4, 0D) AS FLOAT))"))
    val cells = DedupOps.nearDupAssign(e.union(planted))
      .select(col("vec_id"), col("cluster")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val base = cells.keys.filter(_ < 100000L).toSeq
    val hit = base.count(v => (cells(v) & cells(v + 100000L)).nonEmpty)
    assert(hit >= (base.size * 95) / 100,
      s"only $hit/${base.size} planted near-dup pairs share a cell")
  }

  test("t9: past the brute cap, hierarchical routing keeps blocking recall") {
    graft.functions.VectorDotProduct.register(spark)
    // force the past-cap path at toy scale: bruteKMax 4 < k = ceil(
    // 1000/50) = 20, so assignment routes through ~sqrt(20) coarse
    // groups instead of scanning all 20 centroids. Planted near-dups
    // (cosine ~ 1) follow near-identical routes, so the co-cell
    // property that makes the operator a detector must survive the
    // approximation (slightly looser than the brute 95% bar: a
    // boundary pair can now ALSO split at the coarse level).
    spark.conf.set("graft.neardup.bruteKMax", "4")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val planted = e
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn("embedding", expr(
          "transform(embedding, (x, i) -> CAST(x + IF(i = 0, 1e-4, 0D) AS FLOAT))"))
      val cells = DedupOps.nearDupAssign(e.union(planted))
        .select(col("vec_id"), col("cluster")).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val base = cells.keys.filter(_ < 100000L).toSeq
      val hit = base.count(v => (cells(v) & cells(v + 100000L)).nonEmpty)
      assert(hit >= (base.size * 90) / 100,
        s"only $hit/${base.size} planted pairs share a cell on the routed path")
    } finally spark.conf.unset("graft.neardup.bruteKMax")
  }

  test("t9: k grows with the corpus and a skewed cell sub-buckets under the cap") {
    import spark.implicits._
    graft.functions.VectorDotProduct.register(spark)
    // one degenerate 250-vector cell: without the cap this is
    // 250·249/2 = 31125 pairs; with cap=100 it must split into
    // ceil(250/100)=3 sub-buckets, so only same-(vec_id%3) pairs
    // survive and the pair count is bounded by the sub-bucket sizes
    val assigned = (0L until 250L)
      .map(i => (0L, i, Array(1.0f, i.toFloat / 250f)))
      .toDF("cluster", "vec_id", "embedding")
    val pairs = DedupOps.cellBlockedPairs(assigned, cap = 100).collect()
    assert(pairs.forall(r =>
      r.getAs[Long]("vec_a") % 3 === r.getAs[Long]("vec_b") % 3),
      "pairs must never cross a sub-bucket")
    val expect = Seq(84L, 83L, 83L).map(n => n * (n - 1) / 2).sum
    assert(pairs.length === expect.toInt,
      s"sub-bucketed pair count must be ${expect}, was ${pairs.length}")

    // k scales: 500 vectors -> ceil(500/50) = 10 seed cells at sf0.001,
    // never fewer than the corpus-size floor of 8
    val cellsUsed = DedupOps.nearDupAssign(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")))
      .select("cluster").distinct().count()
    assert(cellsUsed > 1 && cellsUsed <= 10,
      s"expected up to ceil(500/50)=10 populated cells, got $cellsUsed")
  }

  test("v3: ANN candidates are a subset of same-bucket pairs and ranked by cosine") {
    val rows = VectorOps.annLsh(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { g =>
      val ranked = g.sortBy(_.getAs[Long]("rnk"))
      assert(ranked.map(_.getAs[Double]("cos")).toSeq ===
        ranked.map(_.getAs[Double]("cos")).sortBy(-(_: Double)).toSeq)
    }
  }

  test("m1/m2: payload plumbing — 64-byte payloads, exact fake-decode features") {
    val schema = MultimodalOps.mediaSchema(spark, dir).collect()
    assert(schema.forall(_.getAs[Long]("n_bytes") === 64L))

    val feats = MultimodalOps.mediaFeatures(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("byte_mean"), r.getAs[Long]("thumb_sum"))).toMap

    // independent reference computation for a few docs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").limit(5).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { d =>
      val one = md.digest(d.getAs[String]("text").getBytes("UTF-8"))
      val payload = Array.fill(4)(one).flatten
      val unsigned = payload.map(b => (b & 0xff).toLong)
      val mean = math.rint(unsigned.sum.toDouble / unsigned.length * 1e6) / 1e6
      val thumb = unsigned.take(4).sum
      assert(feats(d.getAs[Long]("doc_id")) === ((mean, thumb)))
    }
  }

  test("m3/m4: pooled pixels and sampled frames match an independent computation") {
    val resized = MultimodalOps.mediaResize(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("x"), r.getAs[Long]("y")) ->
        r.getAs[Long]("v")).toMap
    val frames = MultimodalOps.frameSample(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("frame_sum"), r.getAs[String]("frame_md5"))).toMap

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").limit(3).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.foreach { d =>
      val id = d.getAs[Long]("doc_id")
      val one = md.digest(d.getAs[String]("text").getBytes("UTF-8"))
      val p = Array.fill(4)(one).flatten
      def b(i: Int): Long = (p(i) & 0xff).toLong
      for (y <- 0 until 4; x <- 0 until 4) {
        val want = (b(2 * y * 8 + 2 * x) + b(2 * y * 8 + 2 * x + 1) +
          b((2 * y + 1) * 8 + 2 * x) + b((2 * y + 1) * 8 + 2 * x + 1)) / 4
        assert(resized((id, x.toLong, y.toLong)) === want, s"pixel ($x,$y) of $id")
      }
      Seq(0, 4, 8, 12).foreach { f =>
        val frame = p.slice(f * 4, f * 4 + 4)
        val hex = frame.map("%02x".format(_)).mkString
        val wantMd5 = md.digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(frames((id, f.toLong)) ===
          ((frame.map(x => (x & 0xff).toLong).sum, wantMd5)), s"frame $f of $id")
      }
    }
    // every doc contributes 16 pixels and 4 frames
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(resized.size === 16 * nDocs)
    assert(frames.size === 4 * nDocs)
  }

  test("m1 plan: payload column pruned when only metadata is projected") {
    val plan = MultimodalOps.mediaTable(spark, dir)
      .select("doc_id", "meta").queryExecution.executedPlan.toString
    assert(plan.contains("doc_id"))
    assert(!plan.contains("payload"), "payload must not survive pruning")
  }

  test("t14: repetition stats match a hand computation on crafted docs") {
    import spark.implicits._
    val crafted = Seq(
      // "x x x x" — top token 4/4, trigrams [xxx, xxx]: dup frac 1/2
      (1L, "x x x x"),
      // all-distinct words: top 1/4, trigrams distinct: dup 0
      (2L, "a b c d"),
      // 2 words — no trigram window: dup frac 0 by convention
      (3L, "a a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val rows = TextOps.repetitionStatsOf(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("top_tok_frac"), r.getAs[Double]("dup_trigram_frac"),
          r.getAs[Boolean]("repetitive"))).toMap
    assert(rows(1L) === ((1.0, 0.5, true)))
    assert(rows(2L) === ((0.25, 0.0, true))) // top_tok_frac 0.25 > 0.125
    assert(rows(3L) === ((1.0, 0.0, true)))
  }

  test("t16: hash-threshold sample is deterministic and near the target rate") {
    val a = TextOps.stratifiedSample(spark, dir).collect()
    val b = TextOps.stratifiedSample(spark, dir).collect()
    // reproducible across executions — the property rand() lacks
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach(r => assert(r.getAs[Long]("bucket") < 20))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val rate = a.length.toDouble / total
    assert(rate > 0.10 && rate < 0.30, s"sample rate $rate far from 20%")
  }

  test("t17: packing offsets are per-source prefix sums; boundary flags exact") {
    val rows = TextOps.contextPacking(spark, dir).collect()
    val budget = TextOps.PackBudget
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var off = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_off") === off, "prefix sum")
        val n = r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("pack_id") === off / budget)
        assert(r.getAs[Boolean]("spans_boundary") ===
          (off / budget != (off + n - 1) / budget))
        off += n
      }
    }
    assert(rows.nonEmpty)
  }

  test("t15: contaminated docs share an 8-gram with the holdout; plan broadcasts") {
    val df = TextOps.decontaminate(spark, dir)
    val rows = df.collect()
    // every flagged doc really shares a verbatim 8-gram with src0
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("text"))).toMap
    def grams8(t: String): Set[String] =
      t.split(" ").sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val holdGrams = docs.values.collect { case ("src0", t) => grams8(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(docs(id)._1 != "src0", "holdout docs must not be flagged")
      val shared = grams8(docs(id)._2) intersect holdGrams
      assert(shared.size.toLong === r.getAs[Long]("n_shared"),
        s"doc $id shared-gram count")
    }
    // scale shape: the holdout side reaches the join as a broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "holdout n-gram set must broadcast, not shuffle the corpus")
  }

  test("m5: ahash matches an independent computation; one keeper per group") {
    val rows = MultimodalOps.phashDedup(spark, dir).collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def ahashOf(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bytes = (hex * 4).grouped(2).map(Integer.parseInt(_, 16).toLong).toArray
      val total = bytes.sum
      (0 until 64).foldLeft(0L)((h, i) =>
        if (bytes(i) * 64L > total) h | (1L << i) else h)
    }
    assert(rows.length === texts.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("ahash") === ahashOf(texts(r.getAs[Long]("doc_id"))))
    }
    // group invariants: sizes consistent, exactly one keeper per hash,
    // and the keeper is the group's min doc id
    rows.groupBy(_.getAs[Long]("ahash")).foreach { case (_, g) =>
      assert(g.forall(_.getAs[Long]("group_n") === g.length.toLong))
      val keepers = g.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length === 1)
      assert(keepers.head.getAs[Long]("doc_id") ===
        g.map(_.getAs[Long]("doc_id")).min)
    }
    // identical texts (t2's exact duplicates) necessarily share a group
    val dupGroups = texts.groupBy(_._2).values.filter(_.size > 1)
    val hashByDoc = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("ahash")).toMap
    dupGroups.foreach { fam =>
      assert(fam.keys.map(hashByDoc).toSet.size === 1)
    }
  }

  test("m6: hamming-ball clusters subsume m5's exact-hash groups; t13 invariants hold") {
    val m5 = MultimodalOps.phashDedup(spark, dir).collect()
    val rows = MultimodalOps.mediaDupClusters(spark, dir).collect()
    val cluster = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every m5 exact-equal group (hamming 0) is inside ONE m6 cluster
    m5.groupBy(_.getAs[Long]("ahash")).values
      .filter(_.length > 1).foreach { g =>
        val cs = g.map(r => cluster(r.getAs[Long]("doc_id"))).toSet
        assert(cs.size === 1, "an exact-hash group split across clusters")
      }
    // component invariants (t13's shape)
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === cid)
      assert(members.count(_.getAs[Boolean]("keep")) === 1)
      members.foreach(m =>
        assert(m.getAs[Long]("cluster_size") === members.length))
      assert(members.length >= 2)
    }
  }

  test("v7: kmAssign picks the true nearest centroid (brute force) and is map-only") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val seeds = e.filter(col("vec_id") < VectorOps.KmeansK)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cvec"))
    val assigned = VectorOps.kmAssign(e, seeds)
    // brute force: every (vector, centroid) distance via a plain join
    val d2 = "round(aggregate(zip_with(embedding, cvec, " +
      "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), " +
      "0D, (a, v) -> a + v), 6)"
    val brute = e.crossJoin(seeds)
      .withColumn("d", expr(d2))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("bc"), col("m.d").as("bd"))
    val joined = assigned.join(brute, "vec_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("cluster") === r.getAs[Long]("bc"))
      assert(r.getAs[Double]("dist2") === r.getAs[Double]("bd"))
    }
    // scale shape: assignment must not shuffle the corpus — no exchange
    // between the scan and the argmin projection (the only exchange in
    // the assigned plan is the broadcast of the packed centroid row)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "centroids must reach the corpus as a broadcast")
    assert(!plan.contains("ShuffleExchange"),
      "assignment must be map-only over the corpus")
  }

  test("v8: pruning keeps exactly the closest 90% per cluster") {
    val rows = VectorOps.clusterPrune(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, g) =>
      val n = g.length
      val kept = g.filter(_.getAs[Boolean]("keep"))
      // integer threshold: rank*10 <= n*9 keeps floor(0.9n) vectors,
      // and the centroid-nearest is always kept
      assert(kept.length === math.max(1, (n * 9) / 10))
      // every kept vector is at least as close as every dropped one
      // (ties broken by vec_id inside the rank, so compare by rank)
      val maxKeptRank = if (kept.isEmpty) 0L
        else kept.map(_.getAs[Long]("rnk")).max
      g.filterNot(_.getAs[Boolean]("keep")).foreach { d =>
        assert(d.getAs[Long]("rnk") > maxKeptRank)
      }
    }
    // v8 rows agree with v7's aggregate per-cluster counts
    val v7n = VectorOps.kmeansClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n")).toMap
    val v8n = rows.groupBy(_.getAs[Long]("cluster_id"))
      .map { case (c, g) => c -> g.length.toLong }
    assert(v8n === v7n)
  }

  test("v7/v8: fewer vectors than k — every vector still assigned, pruning keeps floor(0.9n)") {
    // scratch table with n < KmeansK vectors (k>n boundary: every
    // vector is its own seed, distances are 0 to self)
    val tiny = "target/kmeans_tiny"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 3)
      .write.mode("overwrite").parquet(s"$tiny/embeddings.parquet")
    val gate = VectorOps.kmeansClusters(spark, tiny).collect()
    assert(gate.map(_.getAs[Long]("n")).sum === 3L)
    // each vector sits exactly on its own seed: 3 singleton clusters
    assert(gate.length === 3)
    gate.foreach { r =>
      assert(r.getAs[Double]("avg_dist2") === 0.0)
      assert(r.getAs[Long]("min_member") === r.getAs[Long]("cluster_id"))
    }
    val pruned = VectorOps.clusterPrune(spark, tiny).collect()
    // floor(0.9 * 1) = 0, but the centroid-nearest vector is always
    // kept: pruning never empties a cluster
    assert(pruned.length === 3)
    assert(pruned.forall(_.getAs[Boolean]("keep")))
  }

  test("v7: Lloyd iterations never increase the clustering objective") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val seeds = e.filter(col("vec_id") < VectorOps.KmeansK)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cvec"))
    def objective(a: org.apache.spark.sql.DataFrame): Double =
      a.agg(sum(col("dist2"))).head.getDouble(0)
    var assigned = VectorOps.kmAssign(e, seeds)
    var prev = objective(assigned)
    (0 until VectorOps.KmeansIters).foreach { _ =>
      assigned = VectorOps.kmAssign(e, VectorOps.kmRecompute(assigned))
      val cur = objective(assigned)
      // 1e-4 headroom: distances and centroids are rounded to 1e-6
      assert(cur <= prev + 1e-4, s"objective rose: $prev -> $cur")
      prev = cur
    }
    // and the gate query reports exactly those clusters
    val gate = VectorOps.kmeansClusters(spark, dir).collect()
    val nTotal = gate.map(_.getAs[Long]("n")).sum
    assert(nTotal === e.count())
    assert(gate.map(_.getAs[Long]("cluster_id")).toSet
      .subsetOf((0L until VectorOps.KmeansK).toSet))
  }

  test("v14: every kNN edge stays inside its source's learned cell, ranked by cosine") {
    val cellOf = VectorOps.kmFinalAssign(spark, dir)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = VectorOps.knnGraph(spark, dir).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert(cellOf(r.getAs[Long]("src")) === cellOf(r.getAs[Long]("dst")),
        "an edge crossed a cell — the blocking contract broke")
    }
    edges.groupBy(_.getAs[Long]("src")).values.foreach { rs =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("v15: scaled kNN graph ranks per source and agrees with t9's top pair") {
    val edges = VectorOps.knnGraphScaled(spark, dir).collect()
    assert(edges.nonEmpty)
    edges.groupBy(_.getAs[Long]("src")).values.foreach { rs =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // the t9 global-best pair's endpoints can have no better neighbor:
    // each one's rank-1 edge carries exactly that cosine
    val top = DedupOps.embeddingNearDup(spark, dir).limit(1).collect()(0)
    val topCos = top.getAs[Double]("cos")
    Seq(top.getAs[Long]("vec_a"), top.getAs[Long]("vec_b")).foreach { v =>
      val r1 = edges.filter(e =>
        e.getAs[Long]("src") == v && e.getAs[Long]("rnk") == 1L)
      assert(r1.length == 1 && r1.head.getAs[Double]("cos") === topCos)
    }
  }

  test("v16/m7/q30: range ⊇ thresholded top-k; frame groups recur; ranks well-formed") {
    // v16 must contain every v1 top-5 hit that clears the threshold
    // (the two APIs agree where they overlap)
    val range = VectorOps.rangeSearch(spark, dir).collect()
    range.foreach(r =>
      assert(r.getAs[Double]("cos") >= VectorOps.RangeTau))
    val rset = range.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    VectorOps.cosineTopK(spark, dir).collect()
      .filter(_.getAs[Double]("cos") >= VectorOps.RangeTau)
      .foreach(t => assert(rset(
        (t.getAs[Long]("q_id"), t.getAs[Long]("c_id")))))
    // m7: every reported frame digest genuinely recurs, keeper = min
    val frames = MultimodalOps.frameSample(spark, dir).collect()
      .groupBy(_.getAs[String]("frame_md5"))
    val m7 = MultimodalOps.frameDedup(spark, dir).collect()
    assert(m7.nonEmpty)
    m7.foreach { r =>
      val fam = frames(r.getAs[String]("frame_md5"))
      assert(r.getAs[Long]("n_frames") === fam.length && fam.length >= 2)
      assert(r.getAs[Long]("keeper_doc") ===
        fam.map(_.getAs[Long]("doc_id")).min)
    }
    // q30: percent_rank in [0,1], quartiles 1..4, monotone in value
    // within each (type, user) group
    val q30 = Relational.q30WindowRanks(spark, dir).collect()
    assert(q30.nonEmpty)
    q30.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      .values.foreach { g =>
        val byVal = g.sortBy(r =>
          (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
        val prs = byVal.map(_.getAs[Double]("pr"))
        assert(prs.forall(p => p >= 0.0 && p <= 1.0))
        assert(prs.zip(prs.tail).forall { case (a, b) => a <= b })
        assert(byVal.forall(r => (1L to 4L)
          .contains(r.getAs[Long]("quartile"))))
      }
  }

  test("v13: prefix prefilter + re-rank recovers most of exact top-5 (recall floor)") {
    def top5(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val brute = top5(VectorOps.cosineTopK(spark, dir).collect())
    val rows = VectorOps.prefixRerank(spark, dir).collect()
    val got = top5(rows)
    // every query answers with exactly 5 ranked candidates
    assert(rows.length === brute.size * 5)
    // the fixture's dims are iid (worst case for truncation): the
    // 32-of-64 prefix + keep-50 floor measured 0.74-0.76 — pin 0.6
    // so a refactor can't silently break the prefilter, while box
    // variation in ties stays clear of the bound
    val hits = brute.toSeq
      .map { case (q, t) => (t & got.getOrElse(q, Set.empty)).size }.sum
    val recall = hits.toDouble / brute.values.map(_.size).sum
    assert(recall >= 0.6, s"v13 recall@5 vs exact was $recall")
    // re-ranked scores descend within each query
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
