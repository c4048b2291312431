package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-provided synthetic parquet tables
  * (`TESTDATA.md`): TPC-H-ish star schema + `events` + `documents` +
  * `embeddings` at `/root/testdata/sf{0.001,0.01,0.1}/`.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(queries.DedupOps.readStable(spark, s"$dir/$name.parquet"))

  /** The engine's canonical `events.ts` representation is BIGINT epoch
    * nanos. The generator has emitted both parquet TIMESTAMP(NANOS) —
    * which the sessions' `nanosAsLong` conf reads as that BIGINT
    * directly — and TIMESTAMP(MICROS), which Spark reads as
    * TIMESTAMP_NTZ. The NTZ conversion is a naive-epoch diff between
    * two NTZ operands, so it is session-timezone-free and matches the
    * naive-wall-clock semantics of the DuckDB oracles' `epoch_us(ts)`
    * exactly. Works on batch and streaming frames alike (a pure
    * projection), replaces `ts` in place (column order unchanged). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts", expr("timestampdiff(MICROSECOND, " +
          "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts) * 1000"))
      case Some(TimestampType) =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case _ => df
    }
}
