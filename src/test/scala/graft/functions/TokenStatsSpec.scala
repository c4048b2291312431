package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused token_stats kernel must match the composable SQL
  * formulations it replaced (sorted-run fold for the top-token count,
  * trigram build + array_distinct for the distinct-trigram count).
  */
class TokenStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("token_stats equals the sorted-fold / array_distinct formulations") {
    TokenStats.register(spark)
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("words", split(col("text"), " "))
    val sql = d.select(
      col("doc_id"),
      expr(
        "aggregate(sort_array(words), " +
          "struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best), " +
          "(a, x) -> struct(x AS prev, " +
          "  IF(x = a.prev, a.run + 1, 1L) AS run, " +
          "  GREATEST(a.best, IF(x = a.prev, a.run + 1, 1L)) AS best), " +
          "a -> a.best)").as("sql_top"),
      expr(
        "CASE WHEN size(words) >= 3 THEN " +
          "size(array_distinct(transform(sequence(0, size(words) - 3), " +
          "i -> concat_ws(' ', slice(words, i + 1, 3))))) " +
          "ELSE 0L END").cast("long").as("sql_dtg"))
    val fused = d.select(col("doc_id"), expr("token_stats(words)").as("st"))
      .select(col("doc_id"), col("st.top_tok"), col("st.distinct_trigrams"))
    val diff = fused.join(sql, Seq("doc_id"))
      .filter(col("top_tok") =!= col("sql_top") ||
        col("distinct_trigrams") =!= col("sql_dtg"))
    assert(fused.count() > 0)
    assert(diff.count() === 0)
  }

  test("token_stats edge cases: short arrays and all-equal tokens") {
    TokenStats.register(spark)
    import spark.implicits._
    val rows = Seq("a", "a a", "a a a", "x y z x y z", "b b b b")
      .toDF("text")
      .select(expr("token_stats(split(text, ' '))").as("st"))
      .select(col("st.top_tok"), col("st.distinct_trigrams"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // "x y z x y z": trigrams xyz,yzx,zxy,xyz -> 3 distinct
    assert(rows.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L), (2L, 3L), (4L, 1L)))
  }
}
