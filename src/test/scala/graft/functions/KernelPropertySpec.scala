package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the fused native kernels: on GENERATED token
  * arrays (unicode, empty strings, heavy repeats, pathological
  * lengths) every kernel must equal the composable SQL formulation it
  * replaced — the fixture-based parity specs in [[TextHashesSpec]]
  * only see the synthetic corpus's ASCII words. Raw ScalaCheck
  * sampling with fixed seeds (the scalatest bridge isn't in the
  * offline dependency cache).
  */
class KernelPropertySpec extends SparkSpec {

  private def samples(n: Int)(gen: Gen[List[String]]): Seq[List[String]] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.oneOf("a", "b", "c"), // heavy repeats → many duplicate grams
    Gen.nonEmptyListOf(Gen.oneOf("é", "中", "ß", "🙂", " ", "\"", "\\"))
      .map(_.mkString.take(8)))

  private val words: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, token))

  private def df(ws: Seq[List[String]]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("words", ArrayType(StringType))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        ws.zipWithIndex.map { case (w, i) => Row(i.toLong, w) }: _*),
      schema)
  }

  test("xx_ngrams(words, n) == SQL formulation on generated arrays (n = 2, 3, 8)") {
    TextHashes.register(spark)
    val data = df(samples(24)(words))
    Seq(2, 3, 8).foreach { n =>
      val hash = (0 until n).map(j => s"words[i + $j]")
        .mkString("xxhash64(", ", ", ")")
      val sqlForm = s"CASE WHEN size(words) >= $n THEN " +
        s"array_distinct(transform(sequence(0, size(words) - $n), " +
        s"i -> $hash)) ELSE NULL END"
      val diff = data
        .select(col("id"), expr(s"xx_ngrams(words, $n)").as("fused"),
          expr(sqlForm).as("sql"))
        .filter(!(col("fused") <=> col("sql")))
      assert(diff.count() === 0, s"n=$n mismatch")
    }
  }

  test("minhash_sig and simhash_fp == SQL formulations on generated arrays") {
    TextHashes.register(spark)
    val data = df(samples(24)(words))
    // the SQL minhash formulation the kernel replaced (DedupOps keeps
    // the same constants in its oracle SQL)
    val h32 = "CAST(conv(substr(md5(concat_ws(' ', words[i], words[i + 1], " +
      "words[i + 2])), 1, 8), 16, 10) AS BIGINT)"
    val sigSql = TextHashes.hashParams.zipWithIndex.map { case ((a, b), k) =>
      s"array_min(transform(sequence(0, size(words) - 3), " +
        s"i -> ($a * $h32 + $b) % ${TextHashes.HashPrime}))"
    }.mkString("CASE WHEN size(words) >= 3 THEN array(", ", ", ") ELSE NULL END")
    val fpSql = (0 until 32).map { b =>
      s"sum(IF((CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) " +
        s">> $b) % 2 = 1, 1, -1))"
    }.zipWithIndex.map { case (s, b) =>
      s"IF($s > 0, ${1L << b}L, 0L)"
    }.mkString(" + ")
    val sig = data
      .select(col("id"), expr("minhash_sig(words)").as("fused"),
        expr(sigSql).as("sql"))
      .filter(!(col("fused") <=> col("sql")))
    assert(sig.count() === 0, "minhash mismatch")
    val fpFused = data.select(col("id"), expr("simhash_fp(words)").as("fp"))
    val fpRef = data
      .select(col("id"), explode_outer(col("words")).as("t"))
      .groupBy(col("id"))
      .agg(expr(s"coalesce($fpSql, 0L)").as("fp_ref"))
    val fpDiff = fpFused.join(fpRef, "id")
      .filter(col("fp") =!= col("fp_ref"))
    assert(fpDiff.count() === 0, "simhash mismatch")
  }

  test("minhash_sig and simhash_fp skip null tokens (concat_ws discipline)") {
    TextHashes.register(spark)
    val tokenOrNull: Gen[String] =
      Gen.frequency(3 -> token, 1 -> Gen.const(null: String))
    val wordsWithNulls: Gen[List[String]] =
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, tokenOrNull))
    val data = df(samples(24)(wordsWithNulls))
    // minhash: concat_ws skips null elements AND their separator — the
    // kernel must agree on arrays split() can never produce
    val h32 = "CAST(conv(substr(md5(concat_ws(' ', words[i], words[i + 1], " +
      "words[i + 2])), 1, 8), 16, 10) AS BIGINT)"
    val sigSql = TextHashes.hashParams.map { case (a, b) =>
      s"array_min(transform(sequence(0, size(words) - 3), " +
        s"i -> ($a * $h32 + $b) % ${TextHashes.HashPrime}))"
    }.mkString("CASE WHEN size(words) >= 3 THEN array(", ", ", ") ELSE NULL END")
    val sig = data
      .select(col("id"), expr("minhash_sig(words)").as("fused"),
        expr(sigSql).as("sql"))
      .filter(!(col("fused") <=> col("sql")))
    assert(sig.count() === 0, "minhash null-token mismatch")
    // simhash: a null is not a token — it contributes no bit votes
    val fused = data.select(col("id"), expr("simhash_fp(words)").as("fp"),
      expr("simhash_fp(filter(words, w -> w IS NOT NULL))").as("fp_filtered"))
      .filter(col("fp") =!= col("fp_filtered"))
    assert(fused.count() === 0, "simhash null-token mismatch")
  }

  test("xx_ngrams rejects non-INT and non-positive n with clear messages") {
    TextHashes.register(spark)
    val data = df(Seq(List("a", "b", "c")))
    def msgOf(e: Throwable): String = {
      var c: Throwable = e
      while (c.getCause != null && !c.getMessage.contains("xx_ngrams")) c = c.getCause
      c.getMessage
    }
    val zero = intercept[Throwable] {
      data.select(expr("xx_ngrams(words, 0)")).collect()
    }
    assert(msgOf(zero).contains("n must be >= 1"))
    val bigint = intercept[Throwable] {
      data.select(expr("xx_ngrams(words, CAST(3 AS BIGINT))")).collect()
    }
    assert(msgOf(bigint).contains("n must be an INT literal"))
  }

  test("xx_ngrams skips null elements exactly like the built-in xxhash64") {
    TextHashes.register(spark)
    val one = df(Seq(List("a", "b", "c")))
      .select(expr("array('x', CAST(NULL AS STRING), 'y', 'z')").as("words"))
    val r = one.select(
      expr("xx_ngrams(words, 3)").as("fused"),
      expr("array_distinct(transform(sequence(0, size(words) - 3), " +
        "i -> xxhash64(words[i], words[i + 1], words[i + 2])))").as("sql"))
      .head
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }
}
