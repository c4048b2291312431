package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the round-7 pipeline operators (t18-t20, v5, q22) on
  * sf0.001 — the DuckDB oracles cover exact cross-engine parity; these
  * pin the semantics the oracles can't see (idempotence, conservation,
  * algebraic bounds).
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t18: redaction is idempotent and counts match removed spans") {
    val scrubbed = TextOps.piiScrub(spark, dir)
    val redactedTwice = spark.read
      .parquet(s"$dir/documents.parquet")
      .withColumn("r1",
        regexp_replace(col("text"), TextOps.PiiRe, TextOps.PiiRepl))
      .withColumn("r2",
        regexp_replace(col("r1"), TextOps.PiiRe, TextOps.PiiRepl))
      .filter(col("r1") =!= col("r2"))
    // the replacement text can't itself match the pattern
    assert(redactedTwice.count() === 0)
    // the corpus actually exercises the scrub (pattern isn't dead)
    assert(scrubbed.agg(sum(col("n_pii"))).head.getLong(0) > 0)
  }

  test("t19: buckets conserve docs/tokens and caps are tight powers of two") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val buckets = TextOps.lengthBuckets(spark, dir).collect()
    assert(buckets.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(buckets.map(_.getAs[Long]("total_tokens")).sum ===
      docs.agg(sum(col("n_tokens"))).head.getLong(0))
    buckets.foreach { r =>
      val cap = r.getAs[Long]("cap")
      assert((cap & (cap - 1)) === 0L) // power of two
    }
    // tight: every doc fits its cap but not the next one down
    val tight = docs.withColumn("cap", expr(
      "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT) " +
        "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1))) END"))
      .filter(col("n_tokens") > col("cap") ||
        (col("cap") > 1 && col("n_tokens") <= col("cap") / 2))
    assert(tight.count() === 0)
  }

  test("t20: mix weights form a distribution flatter than the raw shares") {
    val rows = TextOps.domainMix(spark, dir).collect()
    val wSum = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4)
    val rawSum = rows.map(_.getAs[Double]("raw_share")).sum
    assert(math.abs(rawSum - 1.0) < 1e-4)
    // sqrt temperature pulls every weight toward uniform: the largest
    // source loses share, the smallest gains
    val byRaw = rows.sortBy(_.getAs[Double]("raw_share"))
    assert(byRaw.last.getAs[Double]("mix_weight") <=
      byRaw.last.getAs[Double]("raw_share"))
    assert(byRaw.head.getAs[Double]("mix_weight") >=
      byRaw.head.getAs[Double]("raw_share"))
  }

  test("v5: codes bounded by [0, 254] and reconstruction error by scale/2") {
    val q = VectorOps.quantizeInt8(spark, dir).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val n = r.getAs[Long]("n_dims")
      val sum = r.getAs[Long]("code_sum")
      assert(sum >= 0 && sum <= 254 * n)
      // |x - dequant(quant(x))| <= scale/2 + rounding slack
      assert(r.getAs[Double]("max_abs_err") <=
        r.getAs[Double]("scale") / 2 + 1e-6)
    }
  }

  test("v10: PQ codes are in-range, deterministic, and actually quantize") {
    val rows = VectorOps.pqQuantize(spark, dir).collect()
    assert(rows.length ===
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    rows.foreach { r =>
      (0 until VectorOps.PqM).foreach { m =>
        val c = r.getAs[Long](s"c$m")
        assert(c >= 0 && c < VectorOps.PqK,
          s"code c$m=$c outside the ${VectorOps.PqK}-entry codebook")
      }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
    // codebooks are learned, not degenerate: each subspace uses more
    // than one code, and quantization is lossy on real vectors
    (0 until VectorOps.PqM).foreach { m =>
      assert(rows.map(_.getAs[Long](s"c$m")).distinct.length > 1)
    }
    assert(rows.exists(_.getAs[Double]("recon_err") > 0.0))
    // second invocation serves the memoized codebooks — identical rows
    val again = VectorOps.pqQuantize(spark, dir).collect()
    assert(again.map(_.toSeq.toVector).toSeq ===
      rows.map(_.toSeq.toVector).toSeq)
  }

  test("t25: reported passages genuinely recur across documents") {
    val rows = TextOps.passageDedup(spark, dir).collect()
    assert(rows.nonEmpty, "rotated corpus must share aligned passages")
    // recompute carriers directly: every reported passage occurs in
    // >= 2 distinct docs, its canon is the minimum carrier, and the
    // occurrence count bounds the doc count
    val P = TextOps.PassageWords
    val carriers = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("words", split(col("text"), " "))
      .withColumn("passage", explode(expr(
        s"transform(filter(sequence(0, size(words) DIV $P), " +
          s"i -> i < size(words) DIV $P), " +
          s"i -> array_join(slice(words, i * $P + 1, $P), ' '))")))
      .select(col("passage"), col("doc_id"))
      .collect()
      .groupBy(_.getAs[String]("passage"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id"))).toMap
    rows.foreach { r =>
      val ids = carriers(r.getAs[String]("passage"))
      assert(ids.distinct.length >= 2)
      assert(r.getAs[Long]("n_docs") === ids.distinct.length.toLong)
      assert(r.getAs[Long]("n_total") === ids.length.toLong)
      assert(r.getAs[Long]("canon_doc") === ids.min)
    }
    // and completeness: no recurring passage is missing
    assert(rows.length === carriers.count(_._2.distinct.length >= 2))
    // every passage is exactly P words (full windows only)
    rows.foreach(r =>
      assert(r.getAs[String]("passage").split(" ").length === P))
  }

  test("v11: ADC ranks are monotone and ADC agrees with codebook reconstruction") {
    val rows = VectorOps.pqAdcSearch(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
      val ds = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("adc"))
      assert(ds.toSeq === ds.sorted.toSeq, "ADC must be monotone by rank")
      assert(ds.forall(_ >= 0.0))
    }
    // code-identity property: ADC is a function of the corpus codes
    // alone, so for any query with a SAME-code twin (another vector
    // sharing all four codes), ADC(q, twin) = the query's own
    // reconstruction error — the top-1 can then never exceed it
    val v10 = VectorOps.pqQuantize(spark, dir).collect()
    val codeOf = v10.map(r => r.getAs[Long]("vec_id") ->
      (0 until VectorOps.PqM).map(m => r.getAs[Long](s"c$m"))).toMap
    val recon = v10.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Double]("recon_err")).toMap
    byQ.foreach { case (qid, rs) =>
      val hasTwin = codeOf.exists { case (id, c) =>
        id != qid && c == codeOf(qid)
      }
      if (hasTwin) {
        val top1 = rs.minBy(_.getAs[Long]("rnk"))
        assert(top1.getAs[Double]("adc") <= recon(qid) + 1e-6,
          s"query $qid: a same-code twin exists but top-1 ADC missed it")
      }
    }
    // deterministic: second invocation serves memoized codebooks
    val again = VectorOps.pqAdcSearch(spark, dir).collect()
    assert(again.map(_.toSeq.toVector).toSeq ===
      rows.map(_.toSeq.toVector).toSeq)
  }

  test("v12: IVF-PQ results come from ONE probed cell and agree with v11's ADC") {
    val rows = VectorOps.pqIvfSearch(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
      val ds = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("adc"))
      assert(ds.toSeq === ds.sorted.toSeq)
    }
    // inverted-file property: all of a query's results share ONE cell
    // (the probed one) — the scan never crossed a cell boundary
    val cellOf = VectorOps.kmFinalAssign(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    byQ.values.foreach { rs =>
      assert(rs.map(r => cellOf(r.getAs[Long]("c_id"))).distinct.length === 1)
    }
    // ADC consistency: any (q, c) pair also surfaced by the
    // whole-corpus v11 scan must carry the identical ADC distance
    // (same codes, same LUTs — the cell restriction changes the
    // candidate set, never the metric)
    val v11 = VectorOps.pqAdcSearch(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) ->
        r.getAs[Double]("adc")).toMap
    rows.foreach { r =>
      v11.get((r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).foreach { a =>
        assert(a === r.getAs[Double]("adc"))
      }
    }
  }

  test("v6: hamming ANN returns 3 ranked rows per query within the code width") {
    val rows = VectorOps.annBinaryHamming(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
      // monotone by rank; 64-dim codes bound the distance
      val hs = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("hamming"))
      assert(hs.toSeq === hs.sorted.toSeq)
      assert(hs.forall(h => h >= 0 && h <= 64))
    }
  }

  test("t21: hash-keyed overlap matrix equals the string-keyed derivation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val g = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(words) - 8), " +
          "i -> concat_ws(' ', slice(words, i + 1, 8)))")).as("g"))
      .distinct()
    val strings = g.as("a")
      .join(g.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val hashed = TextOps.sourceOverlap(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(hashed.nonEmpty)
    assert(hashed === strings)
    assert(hashed.forall { case (a, b, n) => a < b && n > 0 })
  }

  test("q22: every as-of match is a real prior view of the same user") {
    val e = graft.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("us"))
    val asof = Relational.q22AsofJoin(spark, dir)
    // purchases are all present exactly once
    assert(asof.count() === e.filter(col("event_type") === "purchase").count())
    val joined = asof.filter(col("asof_view_id").isNotNull).as("a")
      .join(e.as("v"), col("a.asof_view_id") === col("v.event_id"))
    // matched row is a view by the same user, at or before the purchase
    assert(joined.filter(col("v.event_type") =!= "view").count() === 0)
    assert(joined.filter(col("v.user_id") =!= col("a.user_id")).count() === 0)
    assert(asof.filter(col("asof_gap_us") < 0).count() === 0)
    // and it is the LATEST such view: no other view in the gap interval
    val purch = asof.as("a")
      .join(e.filter(col("event_type") === "purchase").as("p"),
        col("a.event_id") === col("p.event_id"))
      .select(col("a.event_id").as("pid"), col("a.user_id").as("uid"),
        col("p.us").as("p_us"), col("a.asof_gap_us"))
    val better = purch.join(e.filter(col("event_type") === "view").as("w"),
        col("uid") === col("w.user_id") &&
          col("w.us") <= col("p_us") &&
          col("p_us") - col("w.us") < col("asof_gap_us"))
    assert(better.count() === 0)
  }

  test("t22: per-doc logprob matches a driver-side unigram model") {
    val scored = TextOps.unigramLogprob(spark, dir).collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // independent model: plain Scala maps, no Spark
    val all = texts.values.flatMap(_.split(" ")).toSeq
    val cnt = all.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val tot = all.size.toDouble
    assert(scored.length === texts.size)
    scored.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").toSeq
      assert(r.getAs[Long]("n_tokens") === toks.size.toLong)
      val lp = toks.map(t => math.log(cnt(t) / tot)).sum / toks.size
      assert(math.abs(r.getAs[Double]("avg_logprob") - lp) < 1e-5)
      assert(r.getAs[Boolean]("keep") ===
        (r.getAs[Double]("avg_logprob") >= TextOps.KeepLogprob))
    }
    // the threshold actually partitions the corpus both ways at sf0.001
    val keeps = scored.count(_.getAs[Boolean]("keep"))
    assert(keeps > 0 && keeps < scored.length)
  }

  test("t30: a doc quoted inside another scores containment 1.0 where Jaccard stays low") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (11 to 20).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"x$i").mkString(" ")
    val d = Seq((1L, long), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val rows = TextOps.containmentPairsOf(d).collect()
    val pair = rows.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L)
    assert(pair.isDefined, "the quoted excerpt must surface as a pair")
    assert(pair.get.getAs[Double]("containment") === 1.0)
    // the same pair under t6's symmetric measure: |∩|=8 shingles of
    // the excerpt, |∪|=38 — Jaccard ~0.21, invisible at a 0.5-style
    // near-dup threshold; containment is the measure that catches it
    val jac = TextOps.ngramJaccardOf(d).collect()
      .find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(jac.isDefined && jac.get.getAs[Double]("jaccard") < 0.3)
    // the unrelated doc shares nothing
    assert(!rows.exists(r => r.getAs[Long]("doc_b") == 3L ||
      r.getAs[Long]("doc_a") == 3L))
  }

  test("t31: exact-duplicate docs score novelty 0; rates are well-formed") {
    val rows = TextOps.noveltyRate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, nov) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_unique"),
        r.getAs[Double]("novelty"))
      assert(n > 0 && u >= 0 && u <= n)
      assert(nov >= 0.0 && nov <= 1.0)
    }
    assert(rows.exists(_.getAs[Double]("novelty") > 0.5),
      "some doc should be mostly unique")
    // crafted twins: a doc with an exact copy shares EVERY 8-gram
    // with it (df ≥ 2 throughout) → novelty exactly 0; the unrelated
    // doc keeps novelty 1
    import spark.implicits._
    val twin = (1 to 12).map(i => s"w$i").mkString(" ")
    val lone = (50 to 61).map(i => s"y$i").mkString(" ")
    val crafted = TextOps.noveltyRateOf(
        Seq((1L, twin), (2L, twin), (3L, lone)).toDF("doc_id", "text"))
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(crafted(1L) === 0.0 && crafted(2L) === 0.0)
    assert(crafted(3L) === 1.0)
  }

  test("t27: acceptance rate tracks E[q²] and the verdict is repartition-stable") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count().toDouble
    val kept = TextOps.importanceSample(spark, dir).collect()
    // every kept doc passed its own coin: u < q²
    kept.foreach { r =>
      val q = r.getAs[Double]("q_score")
      assert(r.getAs[Double]("accept_u") < q * q + 1e-9)
    }
    // the md5 threshold is a uniform coin, so the sample rate should
    // track the corpus mean of q² (binomial noise: ±5σ at sf0.001)
    val eq2 = docs
      .withColumn("w", split(col("text"), " "))
      .select(avg(pow(
        expr("size(array_distinct(w))").cast("double") /
          size(col("w")).cast("double"), 2)).as("m"))
      .head.getDouble(0)
    val rate = kept.length / n
    val sigma = math.sqrt(eq2 * (1 - eq2) / n)
    assert(math.abs(rate - eq2) <= 5 * sigma,
      s"rate $rate vs E[q^2] $eq2 (sigma $sigma)")
    // determinism across physical layout: same verdicts from a
    // repartitioned input (the anti-rand() property the op exists for)
    val kept2 = TextOps.importanceSample(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept2 === kept.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("t28: the card is one scan — no join — and conserves doc counts") {
    val card = TextOps.datasetCard(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(card.map(_.getAs[Long]("n_docs")).sum === docs.count())
    card.foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 1)
      val dup = r.getAs[Double]("dup_rate")
      assert(dup >= 0d && dup < 1d)
      assert(r.getAs[Double]("avg_uniq") > 0d)
    }
    val plan = TextOps.datasetCard(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "the card must not join")
    assert(plan.sliding("FileScan parquet".length)
      .count(_ == "FileScan parquet") === 1, "the card must scan once")
  }
}
