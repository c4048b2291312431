package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity-search operators over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * `v1_cosine_topk` is the brute-force baseline: broadcast the (small)
  * query set against the corpus — at 100 TB the corpus side stays
  * partitioned and the query side broadcasts, so there is no shuffle
  * at all. The dot products run inside whole-stage codegen via
  * higher-order functions (no UDFs). The LSH-bucketed variant (scale
  * path) lives in rows-only queries added alongside.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  private val cosExpr =
    "aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v) / " +
      "(sqrt(aggregate(qv, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * " +
      "sqrt(aggregate(cv, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** Brute-force cosine top-5 neighbors for the first 10 vectors. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_raw").desc, col("c_id"))
    broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_raw", expr(cosExpr))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("c_id"),
        round(col("cos_raw"), 6).as("cos"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Per-label centroid stats: mean vector norm and count per label —
    * the IVF coarse-quantizer statistics pass (map-side partials). */
  def labelNormStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .withColumn("norm", expr(
        "sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("norm")), 6).as("avg_norm"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"))
      .orderBy(col("label"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_cosine_topk" -> (cosineTopK _),
    "v2_label_norm_stats" -> (labelNormStats _))

  val oracle: Map[String, String] = Map(
    "v1_cosine_topk" ->
      """WITH q AS (
        | SELECT vec_id AS q_id, embedding AS qv FROM embeddings
        | WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
        |s AS (
        | SELECT q_id, c_id,
        |  list_sum(list_transform(range(1, len(qv) + 1),
        |    i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(qv,
        |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(cv,
        |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
        | FROM q, c WHERE q_id <> c_id),
        |r AS (
        | SELECT q_id, c_id, cos_raw,
        |  row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_raw DESC, c_id) AS rnk
        | FROM s)
        |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id,
        | round(cos_raw, 6) AS cos
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "v2_label_norm_stats" ->
      """WITH n AS (
        | SELECT label,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        | FROM embeddings)
        |SELECT label, count(*) AS n,
        | round(avg(norm), 6) AS avg_norm,
        | round(min(norm), 6) AS min_norm,
        | round(max(norm), 6) AS max_norm
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin)
}
