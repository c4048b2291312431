package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic parquet tables
  * (`TESTDATA.md`): TPC-H-ish star schema + `events` + `documents` +
  * `embeddings` at `/root/testdata/sf{0.001,0.01,0.1}/`.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
