package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused hash kernels must be bit-identical to the composable SQL
  * formulations they replaced (which the DuckDB oracles still use):
  * `minhash_sig` vs the 12 `array_min(transform(...))` folds over
  * `conv(substr(md5(concat_ws(' ', shingle)), 1, 8), 16, 10)` hashes,
  * and `simhash_fp` vs the explode + 32-conditional-sums aggregate.
  */
class TextHashesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def h32(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 8), 16, 10) AS BIGINT)"

  private def docs = {
    TextHashes.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  test("minhash_sig equals the SQL transform/array_min formulation") {
    val minCols = TextHashes.hashParams.zipWithIndex.map { case ((a, b), k) =>
      expr(s"array_min(transform(hs, h -> ($a * h + $b) % " +
        s"${TextHashes.HashPrime}))").as(s"mh$k")
    }
    val sqlSig = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("hs", expr(
        "transform(sequence(0, size(words) - 3), " +
          s"i -> ${h32("concat_ws(' ', slice(words, i + 1, 3))")})"))
      .select(col("doc_id") +: minCols: _*)
      .withColumn("sql_sig",
        array((0 until TextHashes.NumHashes).map(k => col(s"mh$k")): _*))
      .select(col("doc_id"), col("sql_sig"))
    val fused = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr("minhash_sig(words)").as("fused_sig"))
    val diff = fused.join(sqlSig, Seq("doc_id"))
      .filter(col("fused_sig") =!= col("sql_sig"))
    assert(fused.count() > 0)
    assert(diff.count() === 0)
  }

  test("simhash_fp equals the SQL explode/groupBy formulation") {
    val bitSums = (0 until 32).map(b =>
      sum(expr(s"CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val fpExpr = (0 until 32)
      .map(b => s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    val sqlFp = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", expr(h32("tok")))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(fpExpr).as("sql_fp"))
    val fused = docs.select(col("doc_id"),
      expr("simhash_fp(split(text, ' '))").as("fused_fp"))
    val diff = fused.join(sqlFp, Seq("doc_id"))
      .filter(col("fused_fp") =!= col("sql_fp"))
    assert(fused.count() > 0)
    assert(diff.count() === 0)
  }

  test("xx_shingles equals the SQL xxhash64 transform + array_distinct formulation") {
    val sql = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(words) - 3), " +
          "i -> xxhash64(words[i], words[i + 1], words[i + 2])))").as("sql_sh"))
    val fused = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr("xx_shingles(words)").as("fused_sh"))
    val diff = fused.join(sql, Seq("doc_id"))
      .filter(col("fused_sh") =!= col("sql_sh"))
    assert(fused.count() > 0)
    assert(diff.count() === 0)
  }

  test("xx_ngrams(words, 8) equals the SQL 8-gram formulation; null below 8 words") {
    val hash8 = (0 until 8).map(j => s"words[i + $j]")
      .mkString("xxhash64(", ", ", ")")
    val sql = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(words) - 8), " +
          s"i -> $hash8))").as("sql_g"))
    val fused = docs.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"), expr("xx_ngrams(words, 8)").as("fused_g"))
    val diff = fused.join(sql, Seq("doc_id"))
      .filter(col("fused_g") =!= col("sql_g"))
    assert(fused.count() > 0)
    assert(diff.count() === 0)
    // below n words the kernel is null (the callers filter first)
    val short = docs.limit(1)
      .select(expr("xx_ngrams(array('a', 'b'), 8)").as("g")).head
    assert(short.isNullAt(0))
  }

  test("minhash_sig is null below 3 words; simhash_fp of one token is its bit pattern") {
    import org.apache.spark.sql.Row
    TextHashes.register(spark)
    val one = spark.createDataFrame(
      java.util.List.of(Row("just two")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val r = one.select(
      expr("minhash_sig(split(text, ' '))").as("sig"),
      expr("simhash_fp(split(text, ' '))").as("fp"),
      expr(h32("'just'")).as("h")).head
    assert(r.isNullAt(0))
    // two distinct tokens: each bit sum is +1-1=0 or ±2; fp keeps only
    // bits where BOTH tokens agree on 1 (sum +2 > 0)
    val hJust = r.getAs[Long]("h")
    val hTwo = one.select(expr(h32("'two'")).as("h")).head.getAs[Long]("h")
    assert(r.getAs[Long]("fp") === (hJust & hTwo & 0xffffffffL))
  }
}
