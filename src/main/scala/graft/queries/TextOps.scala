package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis / dedup operators for a large-scale training-data
  * pipeline, over the `documents` table. All are pure columnar
  * expressions (whole-stage codegen, no UDFs); every query here has an
  * exact DuckDB oracle.
  *
  * Scale notes: token/quality/fingerprint ops are embarrassingly
  * parallel map-only scans. Exact dedup is one hash-shuffle on a
  * 16-byte digest. The n-gram Jaccard join shuffles on the shingle,
  * and candidate rows grow quadratically in any one shingle's
  * document frequency — so shingles with df > [[TextOps.MaxShingleDf]]
  * (stop-shingles: boilerplate that appears everywhere and carries no
  * dedup signal) are dropped *before* the self-join, bounding each
  * shingle's contribution to ≤ MaxShingleDf² candidate rows. The
  * DuckDB oracle applies the identical filter, so the gate stays
  * exact.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Token counting (whitespace tokenizer) — map-only. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** BPE-ish tokenizer pattern: letter runs, digit runs, and single
    * non-alphanumeric marks — the pre-tokenization split a byte-pair
    * encoder runs before merges. Kept to a subset with identical
    * semantics in Java regex and DuckDB's RE2. */
  private[queries] val SubtokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** t12: subword-style token counting — whitespace tokens (t1) vs the
    * BPE-ish regex split, plus their ratio (the "fertility" a tokenizer
    * budget estimate needs). Map-only. */
  def bpeTokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(expr(s"regexp_extract_all(text, '$SubtokenRe', 0)"))
          .cast("long").as("n_subtokens"))
      .withColumn("fertility",
        round(col("n_subtokens").cast("double") /
          col("n_words").cast("double"), 6))
      .orderBy(col("doc_id"))

  /** Exact dedup: keep the lowest doc_id per md5(text) digest.
    * One shuffle on the digest; survivors returned. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic: stopword-ratio scoring (n-gram/stopword
    * style language identification, map-only). */
  def langStopwordRatio(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .select(
        col("doc_id"),
        col("lang"),
        round(
          expr("size(filter(words, w -> w IN ('the', 'a')))").cast("double") /
            size(col("words")).cast("double"), 6).as("stop_ratio"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length / uniqueness / average-token-length
    * signals with a keep flag — map-only. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(expr("size(array_distinct(words))").cast("double") /
          col("n_tokens").cast("double"), 6).as("uniq_ratio"),
        round((col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"), 6).as("avg_token_len"))
      .withColumn("keep",
        col("n_tokens").between(15, 90) && col("uniq_ratio") >= 0.15)
      .orderBy(col("doc_id"))

  /** Document fingerprinting: digest of the normalized text, with
    * per-source dup stats (the 100 TB pre-pass for exact dedup). */
  def fingerprintStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), md5(lower(col("text"))).as("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"))
      .orderBy(col("source"))

  /** Stop-shingle cutoff: a shingle in more than this many documents is
    * corpus boilerplate, not a duplication signal. One hot shingle in d
    * documents otherwise produces d²/2 candidate rows in the self-join
    * — the classic quadratic blow-up at corpus scale. */
  private[queries] val MaxShingleDf = 100L

  /** Map-only hashed shingle generation: each document's 3-word
    * shingles are keyed by `xxhash64` over the three words directly
    * (codegen'd, no md5 and no concatenated-string allocation — the
    * key never leaves the engine, so the hash needs no DuckDB
    * equivalent; the oracle keys on the shingle STRINGS, and a gate
    * hash-match doubles as proof no 64-bit collision altered the
    * result). Keys are de-duplicated *inside the per-document array*
    * (`array_distinct`) before the explode: the per-doc distinct
    * costs no shuffle (vs `explode.distinct()`, which shuffles every
    * (doc, shingle) pair), and a within-doc hash collision can't emit
    * duplicate `(doc_id, sh)` rows — a collision instead merges two
    * shingles, which the string-keyed oracle would surface. */
  private[queries] def hashedShinglesOf(d: DataFrame): DataFrame = {
    // fused native kernel: distinct 64-bit shingle keys in one
    // compiled pass (bit-identical to xxhash64(words[i], words[i+1],
    // words[i+2]) + array_distinct — asserted in TextHashesSpec); the
    // higher-order transform it replaces ran interpreted per shingle
    graft.functions.TextHashes.register(d.sparkSession)
    d.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr("xx_shingles(words)")).as("sh"))
  }

  /** Distinct (doc, shingle-key) pairs with the stop-shingle df filter
    * applied. The df count is `groupBy(sh).count()` joined back, not
    * `count().over(Window.partitionBy(sh))`: a window materializes
    * every row of a hot shingle on one task (a straggler at corpus
    * scale), while the aggregate combines map-side and the join drops
    * the hot shingle before its rows ever co-locate.
    *
    * The explicit `repartition(sh)` is load-bearing: generation is
    * map-only, so without it each consumer (the df aggregate, the
    * filter join, the self-join sides) would re-run the
    * explode-and-hash from the scan — partial aggregation runs
    * *before* a groupBy's exchange, making the branches' exchanges
    * non-identical and defeating reuse. One shuffle keyed by `sh`
    * instead gives every consumer the same exchange to reuse, and the
    * df aggregate, filter join, and downstream self-join all consume
    * it without reshuffling (their required distribution is already
    * satisfied). */
  private[queries] def rareShinglesOf(d: DataFrame,
      maxDf: Long = MaxShingleDf): DataFrame = {
    val shingles = hashedShinglesOf(d).repartition(col("sh"))
    val rare = shingles
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("sh"))
    shingles.join(rare, Seq("sh"))
      .select(col("doc_id"), col("sh"))
  }

  /** N-gram (3-word shingle) Jaccard near-duplicate pairs: shingle →
    * df stop-shingle filter → inverted-index self-join → |∩|/|∪| over
    * the surviving (rare) shingles. Top-20 by similarity.
    * The same dataflow as MinHash-LSH candidate generation, with exact
    * Jaccard instead of the sketch. The filtered shingle set feeds the
    * size aggregate and both join sides; the branches canonicalize to
    * the same exchanges, so Spark's exchange reuse runs the shingling
    * pass once per execution with no persist — nothing to unpersist,
    * no MEMORY_AND_DISK blocks left to evict a later query's cache
    * (guarded by CacheLifecycleSpec). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardOf(docs(s, dir))

  private[queries] def ngramJaccardOf(d: DataFrame,
      maxDf: Long = MaxShingleDf): DataFrame = {
    val sh = rareShinglesOf(d, maxDf)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jac_raw",
        col("n_inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_inter")).cast("double"))
      .orderBy(col("jac_raw").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), round(col("jac_raw"), 6).as("jaccard"))
  }

  /** t30: shingle CONTAINMENT near-dup pairs — the asymmetric overlap
    * Jaccard under-scores: a short doc quoted wholesale inside a long
    * one has |∩|/|∪| ≈ |A|/|B| (small, invisible to t6's top-k) while
    * |∩|/min(|A|,|B|) ≈ 1 — the standard containment measure for
    * doc-inside-doc duplication. Identical inverted-index dataflow to
    * t6 (ONE `sh`-keyed exchange reused by the df filter, the size
    * aggregate and both join sides — same plan-reuse guarantees), only
    * the final scalar changes; top-20 by containment. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame =
    containmentPairsOf(docs(s, dir))

  private[queries] def containmentPairsOf(d: DataFrame): DataFrame = {
    val sh = rareShinglesOf(d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("cont_raw",
        col("n_inter").cast("double") /
          least(col("sa.n_sh"), col("sb.n_sh")).cast("double"))
      .orderBy(col("cont_raw").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        round(col("cont_raw"), 6).as("containment"))
  }

  /** t11: TF-IDF scoring — term frequencies per doc joined with
    * document frequencies, smoothed idf, top-20 (doc, term) pairs.
    * Two keyed aggregations + one broadcastable join on the term; the
    * classic inverted-index build shape. Cutoff ordering uses the
    * rounded score so both engines agree at the limit boundary. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val n = broadcast(d.agg(count(lit(1)).as("n"))) // corpus size, lazy
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df = tf's key count per term: no second tokenization/distinct pass
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(n)
      .withColumn("score", round(col("tf") *
        (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 4))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("score").desc, col("doc_id"), col("term"))
      .limit(20)
  }

  /** t14: repetition-quality statistics (the Gopher-style repetition
    * filters a pretraining pipeline runs; Rae et al. 2021, §A1.1):
    * per-document most-frequent-token dominance and duplicate-trigram
    * fraction, with a `repetitive` drop flag. Entirely map-only —
    * every statistic folds over the per-row token array, so the
    * operator is a single scan at any corpus size. The flag compares
    * the ROUNDED fractions so both engines agree at the threshold
    * boundary. */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    repetitionStatsOf(docs(s, dir))

  private[queries] def repetitionStatsOf(d: DataFrame): DataFrame = {
    // fused native kernel: one compiled counting pass per document for
    // the top-token count and the distinct-trigram count, replacing a
    // sort + interpreted aggregate fold + trigram array build +
    // array_distinct (four higher-order passes). Values identical —
    // TokenStatsSpec asserts vs the SQL formulation; the DuckDB
    // oracle keeps the naive count-per-distinct-token derivation.
    graft.functions.TokenStats.register(d.sparkSession)
    d.withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("st", expr("token_stats(words)"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("st.top_tok").cast("double") / col("n_tokens"), 6)
          .as("top_tok_frac"),
        round(expr(
          "CASE WHEN n_tokens >= 3 THEN " +
            "CAST(n_tokens - 2 - st.distinct_trigrams AS DOUBLE) / " +
            "(n_tokens - 2) ELSE 0.0 END"), 6).as("dup_trigram_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") > 0.125 || col("dup_trigram_frac") > 0.05)
      .orderBy(col("doc_id"))
  }

  /** t31: per-doc n-gram NOVELTY — the fraction of a doc's distinct
    * 8-grams that occur in NO other document, the standard
    * diversity/boilerplate dial (novelty ~1 = unique prose, ~0 =
    * assembled from corpus-common spans) a mixture designer reads
    * next to t14's within-doc repetition. One fused map-only gram
    * pass ([[graft.functions.TextHashes]] `xx_ngrams` — distinct keys
    * per doc, no string materialization), ONE gram-keyed exchange the
    * df aggregate and the join both reuse (t6's rareShinglesOf
    * idiom), then a map-side-combinable per-doc count — two shuffles
    * total at any corpus size. The oracle joins on the 8-gram
    * STRINGS, so a gate match again proves hashing didn't bend the
    * result. */
  def noveltyRate(s: SparkSession, dir: String): DataFrame =
    noveltyRateOf(docs(s, dir))

  private[queries] def noveltyRateOf(d: DataFrame): DataFrame = {
    graft.functions.TextHashes.register(d.sparkSession)
    val g = d
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"), explode(expr("xx_ngrams(words, 8)")).as("g"))
      .repartition(col("g"))
    val gramDf = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
    g.join(gramDf, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  /** t15: benchmark decontamination — remove from the training corpus
    * any document sharing an 8-gram with the held-out set (the
    * GPT-3/Gopher n-gram-overlap rule; here the holdout is the
    * `src0` slice, standing in for an eval benchmark). Emits each
    * contaminated doc with its shared-distinct-8-gram count.
    *
    * Scale shape: the holdout is tiny relative to the corpus (eval
    * benchmarks are), so its distinct hashed 8-grams BROADCAST — the
    * corpus side is a map-only scan joined without a shuffle, and the
    * only exchange is the final per-doc count (map-side combined).
    * 8-gram keys are internal `xxhash64` over the eight words (no
    * string materialization); the oracle joins on the 8-gram STRINGS,
    * so a gate match proves no hash collision altered the result. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    // fused native kernel: distinct 8-gram keys in one compiled pass
    // per doc — bit-identical to the array_distinct(transform(…,
    // xxhash64(words[i], …, words[i+7]))) formulation it replaced
    // (asserted in TextHashesSpec)
    graft.functions.TextHashes.register(s)
    def grams(d: DataFrame): DataFrame = d
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"), explode(expr("xx_ngrams(words, 8)")).as("g"))
    val d = docs(s, dir)
    val holdout = grams(d.filter(col("source") === "src0"))
      .select(col("g")).distinct()
    grams(d.filter(col("source") =!= "src0"))
      .join(broadcast(holdout), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** t24: Bloom-prefiltered decontamination — the 100 TB shape of
    * t15. t15 broadcasts the holdout's EXACT distinct-gram set; at
    * fleet scale a multi-benchmark holdout's gram set can reach
    * many GB, past broadcast range. The deployment answer is the
    * standard two-phase sketch-then-confirm:
    *
    *  1. BUILD: aggregate the holdout grams into a Bloom filter
    *     (Spark's native `BloomFilterAggregate` via
    *     [[graft.functions.BloomFunctions]] — distributed build,
    *     per-partition merge), collect the ~1 MB sketch, and inline
    *     it into the plan as a binary literal (the plan-constant
    *     equivalent of a broadcast).
    *  2. PREFILTER: `bloom_might_contain(sketch, g)` drops ~98 % of
    *     corpus grams MAP-SIDE — before any exchange — at 8 bits/key.
    *  3. CONFIRM: the few surviving grams take an exact shuffle join
    *     against the holdout set. Bloom filters have NO false
    *     negatives, so the confirmed result is bit-identical to the
    *     exact join without the sketch — which is exactly what the
    *     oracle (plain exact SQL, string grams) gates.
    *
    * The confirm join is deliberately NOT broadcast: at the scale
    * where t24 beats t15, the holdout no longer broadcasts, and the
    * shuffle is cheap because the bloom already shrank the probe side
    * to candidates. 4-grams (vs t15's 8) both differentiate the
    * gate's output and stress the prefilter with a denser hit rate. */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(s)
    graft.functions.BloomFunctions.register(s)
    def grams(d: DataFrame): DataFrame = d
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 4)
      .select(col("doc_id"), explode(expr("xx_ngrams(words, 4)")).as("g"))
    val d = docs(s, dir)
    val holdout = grams(d.filter(col("source") === "src0"))
      .select(col("g")).distinct()
    // one tiny job up front: the sketch is ~num_bits/8 ≈ 1 MB however
    // large the corpus is, and its build touches only the holdout
    val sketch = holdout
      .agg(expr("bloom_agg(g, CAST(1000000 AS BIGINT), " +
        "CAST(8000000 AS BIGINT))"))
      .head.getAs[Array[Byte]](0)
    grams(d.filter(col("source") =!= "src0"))
      .filter(call_function("bloom_might_contain", lit(sketch), col("g")))
      .join(holdout, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** t16: deterministic stratified sampling — keep ~20 % of documents
    * per source by md5 hash threshold on the doc id. Hash-threshold
    * sampling (vs `rand()`) is reproducible across runs, engines, and
    * repartitionings — the property a training-data pipeline needs for
    * auditable subsets — and is map-only: no shuffle, no sample()
    * nondeterminism, prunable to a parquet scan + filter. The md5
    * formulation is engine-portable, so the oracle computes the exact
    * same subset. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("bucket", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 100"))
      .filter(col("bucket") < 20)
      .select(col("doc_id"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Shard count for [[shardShuffle]]. */
  private[queries] val NShards = 16L

  /** t26: deterministic GLOBAL SHUFFLE into training shards — the
    * stage between curation and packing: every document gets a
    * pseudorandom-but-reproducible 60-bit shuffle key (md5 of
    * "doc_id:shuffle:42"), its shard is `key % 16`, and within a
    * shard documents order by the key — a full derangement of the
    * corpus that any engine, any run, any repartitioning reproduces
    * bit-for-bit (`rand()`-based shuffles can't be audited or
    * resumed). The gate emits the SHARD MANIFEST — per shard: doc
    * count, token sum, the key range, and the first/last documents
    * in shuffle order — which is exactly what a writer verifies
    * after laying the shards down.
    *
    * Scale shape: key + shard are map-only; the physical layout at
    * 100 TB is `repartitionByRange(shard, skey)` +
    * `sortWithinPartitions(skey)` + a partitioned write — a single
    * range shuffle, NO global sort, no windows (the manifest here is
    * one map-side-combinable aggregation; min_by/max_by replace any
    * per-shard ordering pass). 60-bit keys make ties vanishingly
    * rare (~n²/2⁶¹), so shuffle order is total in practice. */
  def shardShuffle(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("skey", expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':shuffle:42')), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("shard", pmod(col("skey"), lit(NShards)))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("skey")).as("min_key"),
        max(col("skey")).as("max_key"),
        min_by(col("doc_id"), col("skey")).as("first_doc"),
        max_by(col("doc_id"), col("skey")).as("last_doc"))
      .orderBy(col("shard"))

  /** t27: quality-weighted IMPORTANCE RESAMPLING — the soft filter
    * between t4's hard keep/drop and t16's uniform sample: each
    * document is accepted with probability `q²` where q is its
    * lexical-diversity score (squaring = temperature 2, downweighting
    * low-quality mass harder than linear), but the coin flip is a
    * DETERMINISTIC md5 threshold, not `rand()` — the same doc gets
    * the same verdict on every engine, run, and repartitioning, so
    * the sampled corpus is auditable and resumable (the property
    * production pipelines need when a 100 TB pass dies halfway).
    * Map-only: score, threshold, and verdict are all per-row
    * expressions; nothing shuffles until the output sort. */
  def importanceSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("q_score", round(
        expr("size(array_distinct(words))").cast("double") /
          size(col("words")).cast("double"), 6))
      .withColumn("accept_u", expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':is:42')), 1, 8), 16, 10) AS BIGINT) % 1000").cast("double") / 1000d)
      .filter(col("accept_u") < col("q_score") * col("q_score"))
      .select(col("doc_id"), col("source"), col("q_score"),
        round(col("accept_u"), 3).as("accept_u"))
      .orderBy(col("doc_id"))

  /** t28: the DATASET CARD — the per-source statistics bundle every
    * published training corpus ships (counts, token mass, length
    * shape, language spread, duplication rate, lexical diversity),
    * computed in ONE grouped pass over the corpus plus the two
    * distinct counts (docs are digested and langs counted inside the
    * same aggregation — `count(DISTINCT ...)` plans as one partial
    * expand, not extra scans). Every statistic is map-side
    * combinable or a distinct over a fixed-width digest, so the card
    * costs one corpus scan at any scale.
    *
    * avg_uniq sums exact integer NANO-units per doc and divides once
    * (v7's d_micro idiom): a plain `avg` over per-doc double ratios
    * is summation-order-dependent, so Spark's partial aggregation vs
    * DuckDB's sequential scan could flip a 6th decimal when the mean
    * lands on a rounding boundary. Long sums are order-free (headroom
    * 1e9/doc → ~9e9 docs per source before overflow); the ≤ 5e-10
    * per-doc quantization is invisible at the 6-decimal gate. The
    * other averages are already order-safe: avg_tokens/short_share
    * sum small integers (exact in double far past this corpus). */
  def datasetCard(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("uniq_nano", round(
        expr("size(array_distinct(words))").cast("double") /
          col("n_tokens").cast("double") * 1e9).cast("long"))
      .withColumn("fp", md5(lower(col("text"))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(when(col("n_tokens") < 15, 1d).otherwise(0d)), 6)
          .as("short_share"),
        countDistinct(col("lang")).as("n_langs"),
        round(lit(1d) - countDistinct(col("fp")).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_rate"),
        round(sum(col("uniq_nano")).cast("double") /
          count(lit(1)).cast("double") / 1e9, 6).as("avg_uniq"))
      .orderBy(col("source"))

  /** Token budget per training context window for [[contextPacking]]. */
  private[queries] val PackBudget = 2048L

  /** t17: context-window packing — the concat-then-chunk step that
    * turns a document stream into fixed-size training windows. Each
    * document gets its exclusive prefix token offset within its
    * source (one window-function cumsum, partitioned by source), the
    * window id it starts in (`floor(offset / budget)`), and whether it
    * straddles a window boundary. One shuffle on the source key; the
    * running sum is the sequential semantics itself (packing is
    * order-defined), so a per-source sort is inherent, and sources
    * are the parallelism unit — the 100 TB layout shards by source
    * exactly like this partitionBy. */
  def contextPacking(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"), col("source"), col("n_tokens"), col("start_off"),
        floor(col("start_off") / PackBudget).as("pack_id"),
        (floor(col("start_off") / PackBudget) !==
          floor((col("start_off") + col("n_tokens") - 1) / PackBudget))
          .as("spans_boundary"))
      .orderBy(col("doc_id"))
  }

  /** PII-like span pattern for [[piiScrub]]. The corpus is synthetic
    * word-salad (no real emails/phones), so the "PII" stand-in is a
    * `customer <word>` span — the machinery (non-overlapping global
    * regex match, count, redact, digest) is exactly a production
    * email/phone scrub; only the pattern constant differs. Kept to a
    * subset with identical semantics in Java regex and DuckDB's RE2. */
  private[queries] val PiiRe = "customer [a-z]+"
  private[queries] val PiiRepl = "customer [NAME]"

  /** t18: PII detection + redaction — per-document match count, the
    * redacted text's md5 (the audit fingerprint a scrub job records),
    * and the redacted length. Map-only: regex matching is per-row, so
    * the operator is a single scan at any corpus size and the three
    * outputs share one regexp_replace subtree. */
  def piiScrub(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("redacted", regexp_replace(col("text"), PiiRe, PiiRepl))
      .select(
        col("doc_id"),
        expr(s"regexp_count(text, '$PiiRe')").cast("long").as("n_pii"),
        md5(col("redacted")).as("redacted_md5"),
        length(col("redacted")).cast("long").as("redacted_len"))
      .orderBy(col("doc_id"))

  /** t19: sequence-length bucketing — assign each document the
    * smallest power-of-two context length that holds it, then report
    * per-bucket doc/token totals and the padding a bucketed batcher
    * would burn (`cap - n_tokens` per doc). The bucket is computed in
    * INTEGER arithmetic (bit length of n_tokens - 1, then a shift) —
    * a log2 formulation differs between engines at exact powers of
    * two, where libm log2 is exact but log(x)/log(2) is not. One
    * map-side-combined aggregation on a tiny key space. */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cap", expr(
        "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1))) END"))
      .groupBy(col("cap"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("cap") - col("n_tokens")).as("pad_tokens"))
      .withColumn("pad_frac", round(
        col("pad_tokens").cast("double") /
          (col("n_docs") * col("cap")).cast("double"), 6))
      .orderBy(col("cap"))

  /** t20: domain-mix weighting — per-source token counts and the
    * temperature-scaled sampling weight (alpha = 0.5) a pretraining
    * mixer assigns: `w_i = p_i^0.5 / Σ_j p_j^0.5` where `p_i` is the
    * source's token share. The corpus-total normalizer cancels, so
    * only `sqrt(src_tokens)` matters — and sqrt is IEEE
    * correctly-rounded, giving both engines bit-identical per-source
    * terms. One keyed aggregation; the per-source frame (a handful of
    * rows at any corpus size — sources are domains, not documents)
    * then crossJoins its own single-row total via broadcast. */
  def domainMix(s: SparkSession, dir: String): DataFrame = {
    val per = docs(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("src_tokens"))
    val tot = per.agg(
      sum(col("src_tokens")).as("all_tokens"),
      sum(sqrt(col("src_tokens").cast("double"))).as("sum_sqrt"))
    per.crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_docs"), col("src_tokens"),
        round(col("src_tokens").cast("double") / col("all_tokens"), 6)
          .as("raw_share"),
        round(sqrt(col("src_tokens").cast("double")) / col("sum_sqrt"), 6)
          .as("mix_weight"))
      .orderBy(col("source"))
  }

  /** t21: cross-source contamination matrix — for every source pair,
    * the number of distinct 8-grams they share (t15's holdout
    * decontamination generalized pairwise; the curation diagnostic
    * that tells a pipeline which domains leak into each other, e.g. a
    * benchmark mirrored inside a crawl). Scale shape: one distinct
    * over (source, gram) — grams keyed by `xxhash64` over the eight
    * words, no string materialization — then an inverted-index
    * self-join on the gram. A gram present in k sources contributes
    * C(k,2) pairs, and k is bounded by the source count (domains, not
    * documents), so the join cannot blow up the way a doc-level
    * self-join would. The oracle joins on the 8-gram STRINGS, so a
    * gate match proves no hash collision altered any cell. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashes.register(s)
    val g = docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("source"), explode(expr("xx_ngrams(words, 8)")).as("g"))
      .distinct()
    g.as("a")
      .join(g.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The t22 quality-filter cutoff: documents whose per-token average
    * log-probability under the corpus unigram LM falls below this are
    * marked for drop (the sf0.01 distribution spans [-3.70, -3.38],
    * median -3.40 — the cutoff splits off the repetitive/rare-token
    * tail). */
  private[queries] val KeepLogprob = -3.45

  /** t22: unigram-LM log-probability scoring — the perplexity-style
    * quality filter (CCNet/Gopher run a KenLM here; the unigram model
    * is the engine-shaped equivalent with no external artifacts). Two
    * passes: (1) corpus token counts — map-side-combined aggregate on
    * the token, vocabulary-sized output; (2) score — tokens join the
    * broadcast vocabulary (word-like vocabularies stay Zipf-bounded at
    * corpus scale; an unbounded token set would flip this to a shuffle
    * hash join on the token key) and fold back to one row per doc via
    * a partial-aggregated groupBy on `doc_id`, whose exploded tokens
    * are already co-partitioned with the scan. The corpus total
    * crosses in as a broadcast scalar (J5 shape). */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("tot"))
    toks.join(broadcast(vocab), Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("lp",
        log(col("cnt").cast("double") / col("tot").cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("lp")), 6).as("avg_logprob"))
      .withColumn("keep", col("avg_logprob") >= lit(KeepLogprob))
      .orderBy(col("doc_id"))
  }

  /** Passage granularity for t25: non-overlapping [[PassageWords]]-word
    * windows — coarse enough that a shared passage means real copied
    * text, fine enough to catch partial-document copying that t2's
    * whole-document digest misses. */
  private[queries] val PassageWords = 10

  /** t25: PASSAGE-level exact dedup — the sub-document granularity
    * between t2 (whole-doc digest) and t6/t7 (similarity): split each
    * document into consecutive non-overlapping [[PassageWords]]-word
    * passages and surface every passage that recurs across ≥ 2
    * distinct documents, with its occurrence count and canonical
    * (lowest) carrier. This is the curation pass that removes
    * boilerplate and long verbatim quotations from training corpora —
    * near-dup pipelines can't see a copied paragraph inside an
    * otherwise-novel document.
    *
    * Scale shape: the split + windowing is ONE map-only pass (rows ≈
    * tokens / [[PassageWords]]), then one shuffle keyed on the passage
    * text. Unlike t6's shingle JOIN, a high-df boilerplate passage is
    * harmless here: count/count-distinct/min are map-side combinable,
    * so a passage appearing a billion times costs one partial per
    * input partition, never O(df²) rows. */
  def passageDedup(s: SparkSession, dir: String): DataFrame = {
    val P = PassageWords
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("passage", explode(expr(
        s"transform(filter(sequence(0, size(words) DIV $P), " +
          s"i -> i < size(words) DIV $P), " +
          s"i -> array_join(slice(words, i * $P + 1, $P), ' '))")))
      .groupBy(col("passage"))
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canon_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("passage"))
  }

  /** t32 parameters, folded into the oracle and the engine-side bound
    * check. Spark's `CountMinSketch.create(eps, confidence, seed)`
    * sizes the sketch as width = ⌈2/ε⌉ columns × depth =
    * ⌈-ln(1-confidence)/ln 2⌉ rows — at ε = 10⁻⁴ / 0.99 that is
    * 20,000 × 7 longs ≈ 1.1 MB, the fixed-size summary a 100 TB
    * pipeline merges map-side regardless of corpus size. */
  private[queries] val HeavyHitterK = 30
  private[queries] val CmsEps = 1e-4
  private[queries] val CmsConfidence = 0.99
  private[queries] val CmsSeed = 42

  /** t32 internals: (token, exact count, CMS estimate) for the exact
    * top-[[HeavyHitterK]] tokens, plus the total token-occurrence
    * count N. Two distributed passes over the exploded tokens:
    *
    *  1. the `count_min_sketch` aggregate — each partition folds its
    *     occurrences into a local ~1 MB counter array, partials merge
    *     cell-wise (the classic mergeable-summary property), ONE
    *     fixed-size binary reaches the driver regardless of N;
    *  2. the exact per-token counts (one map-side-combinable shuffle
    *     on the token — the word-count shape) cut to the top-k total
    *     order (count desc, token).
    *
    * The k point-estimates against the deserialized sketch are O(k)
    * driver work on a fixed-size summary — bounded by construction,
    * exactly how a production heavy-hitter check serves. */
  private[queries] def heavyHitterAudit(s: SparkSession, dir: String)
      : (Seq[(String, Long, Long)], Long) = {
    val toks = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val row = toks.agg(
      count_min_sketch(col("token"), lit(CmsEps), lit(CmsConfidence),
        lit(CmsSeed)).as("sk"),
      count(lit(1)).as("total")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val total = row.getLong(1)
    val topk = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(HeavyHitterK).collect().toSeq
    (topk.map(r =>
      (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0)))),
      total)
  }

  /** t32: heavy-hitter tokens with a count-min-sketch audit — the
    * frequent-items primitive a 100 TB text pipeline runs daily (top
    * boilerplate tokens/domains) next to its sketch shelf (HLL q16,
    * Bloom t24, approx-percentile q28, MinHash/SimHash t7/t8). Gated
    * t23-style: the EXACT top-k counts are what the oracle hashes
    * (DuckDB cannot reproduce Spark's CMS hashing), and the sketch is
    * audited engine-side — `within_eps` asserts the CMS estimate e
    * satisfies cnt ≤ e ≤ cnt + ⌈ε·N⌉ (the one-sided CMS guarantee: it
    * never undercounts; it overcounts by at most ε·N w.p. ≥
    * confidence per query). A sketch landing outside its stated bound
    * flips the column and fails the hash gate loudly. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (rows, total) = heavyHitterAudit(s, dir)
    val bound = math.ceil(CmsEps * total).toLong
    rows.map { case (t, c, e) => (t, c, e >= c && e <= c + bound) }
      .toDF("token", "cnt", "within_eps")
      .orderBy(col("cnt").desc, col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t32_heavy_hitters" -> (heavyHitters _),
    "t25_passage_dedup" -> (passageDedup _),
    "t22_unigram_logprob" -> (unigramLogprob _),
    "t21_source_overlap" -> (sourceOverlap _),
    "t16_stratified_sample" -> (stratifiedSample _),
    "t18_pii_scrub" -> (piiScrub _),
    "t19_length_buckets" -> (lengthBuckets _),
    "t20_domain_mix" -> (domainMix _),
    "t17_context_packing" -> (contextPacking _),
    "t11_tfidf_topterms" -> (tfidfTopTerms _),
    "t1_token_count" -> (tokenCount _),
    "t2_dedup_exact" -> (dedupExact _),
    "t3_lang_stopword" -> (langStopwordRatio _),
    "t4_quality_score" -> (qualityScore _),
    "t5_fingerprint_stats" -> (fingerprintStats _),
    "t6_ngram_jaccard" -> (ngramJaccard _),
    "t30_containment" -> (containmentPairs _),
    "t31_novelty" -> (noveltyRate _),
    "t12_bpe_tokens" -> (bpeTokenCount _),
    "t14_repetition_stats" -> (repetitionStats _),
    "t15_decontaminate" -> (decontaminate _),
    "t24_bloom_decontaminate" -> (bloomDecontaminate _),
    "t26_shard_shuffle" -> (shardShuffle _),
    "t27_importance_sample" -> (importanceSample _),
    "t28_dataset_card" -> (datasetCard _))

  val oracle: Map[String, String] = Map(
    // exact top-k counts under the (cnt desc, token) total order; the
    // CMS audit column must come out all-true engine-side
    "t32_heavy_hitters" ->
      s"""WITH tok AS (
         | SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |tc AS (
         | SELECT token, count(*) AS cnt FROM tok
         | WHERE token <> '' GROUP BY token)
         |SELECT token, cnt, true AS within_eps
         |FROM tc ORDER BY cnt DESC, token LIMIT $HeavyHitterK""".stripMargin,
    "t25_passage_dedup" ->
      s"""WITH w AS (
         | SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |p AS (
         | SELECT doc_id, array_to_string(
         |   words[i * $PassageWords + 1 : (i + 1) * $PassageWords], ' ')
         |   AS passage
         | FROM w, unnest(range(0, len(words) // $PassageWords)) AS u(i))
         |SELECT passage, count(*) AS n_total,
         | count(DISTINCT doc_id) AS n_docs, min(doc_id) AS canon_doc
         |FROM p GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY passage""".stripMargin,
    // the oracle is the EXACT 4-gram decontamination with no sketch
    // anywhere — a hash match proves the bloom prefilter changed
    // nothing (no false negatives) and the confirm join killed every
    // false positive
    "t27_importance_sample" ->
      """WITH q AS (
        | SELECT doc_id, source,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |        CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS q_score,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':is:42'),
        |    1, 8))::BIGINT % 1000 AS DOUBLE) / 1000 AS accept_u
        | FROM documents)
        |SELECT doc_id, source, q_score, round(accept_u, 3) AS accept_u
        |FROM q WHERE accept_u < q_score * q_score
        |ORDER BY doc_id""".stripMargin,
    "t28_dataset_card" ->
      """WITH d AS (
        | SELECT source, lang, md5(lower(text)) AS fp,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |   CAST(len(string_split(text, ' ')) AS DOUBLE) * 1e9) AS BIGINT)
        |   AS uniq_nano
        | FROM documents)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_tokens), 4) AS avg_tokens,
        | round(avg(CASE WHEN n_tokens < 15 THEN 1.0 ELSE 0.0 END), 6)
        |   AS short_share,
        | count(DISTINCT lang) AS n_langs,
        | round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) /
        |   CAST(count(*) AS DOUBLE), 6) AS dup_rate,
        | round(CAST(sum(uniq_nano) AS DOUBLE) /
        |   CAST(count(*) AS DOUBLE) / 1e9, 6) AS avg_uniq
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "t26_shard_shuffle" ->
      s"""WITH k AS (
         | SELECT doc_id,
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle:42'),
         |    1, 15))::BIGINT AS skey,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         | FROM documents)
         |SELECT skey % $NShards AS shard, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         | min(skey) AS min_key, max(skey) AS max_key,
         | min_by(doc_id, skey) AS first_doc,
         | max_by(doc_id, skey) AS last_doc
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "t24_bloom_decontaminate" ->
      """WITH w AS (
        | SELECT doc_id, source, string_split(text, ' ') AS words
        | FROM documents),
        |g AS (
        | SELECT doc_id, source, array_to_string(words[i:i+3], ' ') AS g
        | FROM w, unnest(generate_series(1, len(words) - 3)) AS u(i)
        | WHERE len(words) >= 4),
        |hold AS (SELECT DISTINCT g FROM g WHERE source = 'src0'),
        |corp AS (SELECT DISTINCT doc_id, g FROM g WHERE source <> 'src0')
        |SELECT corp.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM corp JOIN hold USING (g)
        |GROUP BY corp.doc_id ORDER BY corp.doc_id""".stripMargin,
    "t22_unigram_logprob" ->
      s"""WITH toks AS (
         | SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         | FROM documents),
         |v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
         |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM v),
         |sc AS (
         | SELECT doc_id, count(*) AS n_tokens,
         |  round(avg(ln(CAST(cnt AS DOUBLE) / tot)), 6) AS avg_logprob
         | FROM toks JOIN v USING (tok), t GROUP BY 1)
         |SELECT doc_id, n_tokens, avg_logprob,
         | (avg_logprob >= $KeepLogprob) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "t16_stratified_sample" ->
      """SELECT doc_id, source,
        | ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |   AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |   % 100 < 20
        |ORDER BY doc_id""".stripMargin,
    "t21_source_overlap" ->
      """WITH w AS (
        | SELECT source, string_split(text, ' ') AS words FROM documents),
        |g AS (
        | SELECT DISTINCT source, array_to_string(words[i:i+7], ' ') AS g
        | FROM w, unnest(generate_series(1, len(words) - 7)) AS u(i)
        | WHERE len(words) >= 8)
        |SELECT a.source AS src_a, b.source AS src_b,
        | CAST(count(*) AS BIGINT) AS n_shared
        |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t18_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, 'customer [a-z]+')) AS BIGINT)
        |   AS n_pii,
        | md5(regexp_replace(text, 'customer [a-z]+', 'customer [NAME]', 'g'))
        |   AS redacted_md5,
        | CAST(length(regexp_replace(text, 'customer [a-z]+',
        |   'customer [NAME]', 'g')) AS BIGINT) AS redacted_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t19_length_buckets" ->
      """WITH t AS (
        | SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |b AS (
        | SELECT n_tokens,
        |  CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
        |   ELSE (CAST(1 AS BIGINT) << length(bin(n_tokens - 1))) END AS cap
        | FROM t)
        |SELECT cap, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(sum(cap - n_tokens) AS BIGINT) AS pad_tokens,
        | round(CAST(sum(cap - n_tokens) AS DOUBLE) / (count(*) * cap), 6)
        |   AS pad_frac
        |FROM b GROUP BY cap ORDER BY cap""".stripMargin,
    "t20_domain_mix" ->
      """WITH per AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        | FROM documents GROUP BY source),
        |tot AS (
        | SELECT CAST(sum(src_tokens) AS BIGINT) AS all_tokens,
        |  sum(sqrt(CAST(src_tokens AS DOUBLE))) AS sum_sqrt
        | FROM per)
        |SELECT source, n_docs, src_tokens,
        | round(CAST(src_tokens AS DOUBLE) / all_tokens, 6) AS raw_share,
        | round(sqrt(CAST(src_tokens AS DOUBLE)) / sum_sqrt, 6) AS mix_weight
        |FROM per, tot ORDER BY source""".stripMargin,
    "t17_context_packing" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |o AS (
        | SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
        | FROM t)
        |SELECT doc_id, source, n_tokens, start_off,
        | start_off // 2048 AS pack_id,
        | (start_off // 2048) <> ((start_off + n_tokens - 1) // 2048)
        |   AS spans_boundary
        |FROM o ORDER BY doc_id""".stripMargin,
    "t14_repetition_stats" ->
      """SELECT doc_id, n_tokens, top_tok_frac, dup_trigram_frac,
        | (top_tok_frac > 0.125 OR dup_trigram_frac > 0.05) AS repetitive
        |FROM (
        | SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_tokens,
        |  round(CAST(list_max(list_transform(list_distinct(words),
        |    w -> len(list_filter(words, x -> x = w)))) AS DOUBLE)
        |    / len(words), 6) AS top_tok_frac,
        |  round(CASE WHEN len(tg) > 0 THEN
        |    CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
        |   ELSE 0.0 END, 6) AS dup_trigram_frac
        | FROM (
        |  SELECT doc_id, words,
        |   CASE WHEN len(words) >= 3 THEN
        |     list_transform(generate_series(1, len(words) - 2),
        |       i -> array_to_string(words[i:i+2], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS tg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words
        |        FROM documents)))
        |ORDER BY doc_id""".stripMargin,
    "t15_decontaminate" ->
      """WITH w AS (
        | SELECT doc_id, source, string_split(text, ' ') AS words
        | FROM documents),
        |g AS (
        | SELECT doc_id, source, array_to_string(words[i:i+7], ' ') AS g
        | FROM w, unnest(generate_series(1, len(words) - 7)) AS u(i)
        | WHERE len(words) >= 8),
        |hold AS (SELECT DISTINCT g FROM g WHERE source = 'src0'),
        |corp AS (SELECT DISTINCT doc_id, g FROM g WHERE source <> 'src0')
        |SELECT corp.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM corp JOIN hold USING (g)
        |GROUP BY corp.doc_id ORDER BY corp.doc_id""".stripMargin,
    "t11_tfidf_topterms" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (
        | SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (
        | SELECT term, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df,
        | round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS score
        |FROM tf JOIN df USING (term) CROSS JOIN n
        |ORDER BY score DESC, doc_id, term LIMIT 20""".stripMargin,
    "t1_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t12_bpe_tokens" ->
      s"""WITH c AS (
         | SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '$SubtokenRe')) AS BIGINT)
         |    AS n_subtokens
         | FROM documents)
         |SELECT doc_id, n_words, n_subtokens,
         | round(CAST(n_subtokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
         |   AS fertility
         |FROM c ORDER BY doc_id""".stripMargin,
    "t2_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY 1""".stripMargin,
    "t3_lang_stopword" ->
      """SELECT doc_id, lang,
        | round(CAST(len(list_filter(string_split(text, ' '),
        |   w -> w IN ('the', 'a'))) AS DOUBLE) /
        |  CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t4_quality_score" ->
      """WITH w AS (
        | SELECT doc_id, n_chars, string_split(text, ' ') AS words
        | FROM documents),
        |q AS (
        | SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_tokens,
        |  round(CAST(len(list_distinct(words)) AS DOUBLE) /
        |        CAST(len(words) AS DOUBLE), 6) AS uniq_ratio,
        |  round(CAST(n_chars - (len(words) - 1) AS DOUBLE) /
        |        CAST(len(words) AS DOUBLE), 6) AS avg_token_len
        | FROM w)
        |SELECT doc_id, n_tokens, uniq_ratio, avg_token_len,
        | (n_tokens BETWEEN 15 AND 90) AND uniq_ratio >= 0.15 AS keep
        |FROM q ORDER BY doc_id""".stripMargin,
    "t5_fingerprint_stats" ->
      """SELECT source, count(*) AS n_docs,
        | count(DISTINCT md5(lower(text))) AS n_unique
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "t6_ngram_jaccard" ->
      s"""WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents
        | WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        | SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
        | FROM w, unnest(generate_series(1, len(words) - 2)) AS u(i)),
        |sh AS (
        | SELECT doc_id, shingle FROM (
        |  SELECT doc_id, shingle,
        |   count(*) OVER (PARTITION BY shingle) AS df FROM sh0)
        | WHERE df <= $MaxShingleDf),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        | FROM sh a JOIN sh b
        |   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | round(CAST(n_inter AS DOUBLE) /
        |   CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
        |FROM inter
        | JOIN sizes sa ON doc_a = sa.doc_id
        | JOIN sizes sb ON doc_b = sb.doc_id
        |ORDER BY CAST(n_inter AS DOUBLE) /
        |   CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) DESC, doc_a, doc_b
        |LIMIT 20""".stripMargin,
    "t30_containment" ->
      s"""WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents
        | WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        | SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
        | FROM w, unnest(generate_series(1, len(words) - 2)) AS u(i)),
        |sh AS (
        | SELECT doc_id, shingle FROM (
        |  SELECT doc_id, shingle,
        |   count(*) OVER (PARTITION BY shingle) AS df FROM sh0)
        | WHERE df <= $MaxShingleDf),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        | FROM sh a JOIN sh b
        |   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter,
        | round(CAST(n_inter AS DOUBLE) /
        |   CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE), 6) AS containment
        |FROM inter
        | JOIN sizes sa ON doc_a = sa.doc_id
        | JOIN sizes sb ON doc_b = sb.doc_id
        |ORDER BY CAST(n_inter AS DOUBLE) /
        |   CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) DESC, doc_a, doc_b
        |LIMIT 20""".stripMargin,
    "t31_novelty" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents
        | WHERE len(string_split(text, ' ')) >= 8),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS g
        | FROM w, unnest(generate_series(1, len(words) - 7)) AS u(i)),
        |d AS (SELECT g, count(*) AS df FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        | CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_unique,
        | round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |   count(*), 6) AS novelty
        |FROM g JOIN d USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
