package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupOps, JobHistoryOps, MultimodalOps, Relational, StreamingOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry: every implemented operator
  * from SURVEY.md §2 (plus the training-data-pipeline operators) has an
  * entry; `oracleSql` carries the exact DuckDB-equivalent SQL for each
  * SQL-expressible query. Column aliases match between the Spark plans
  * and the oracle SQL — the driver sorts columns by name before
  * hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q10StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++
      JobHistoryOps.queries ++ DedupOps.queries ++ MultimodalOps.queries ++
      StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      JobHistoryOps.oracle ++ DedupOps.oracle ++ MultimodalOps.oracle ++
      StreamingOps.oracle
}
