package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.normalizeTs` — the events.ts canonicalization. The driver
  * has regenerated the testdata with different parquet timestamp
  * encodings across rounds (TIMESTAMP(NANOS) read as BIGINT under
  * nanosAsLong, then TIMESTAMP(MICROS) read as TIMESTAMP_NTZ); every
  * downstream plan assumes BIGINT epoch nanos, so the loader must map
  * each encoding to the same canonical value — and the conversion must
  * be session-timezone-free so Bench/Verify/tests agree with the DuckDB
  * oracles' naive `epoch_us(ts)` regardless of box timezone.
  */
class TablesSpec extends SparkSpec {

  private val epochUs = 1289542284000000L // 2010-11-12 05:31:24 UTC

  private def writeAndLoad(writeTs: org.apache.spark.sql.Column): Long = {
    val dir = Files.createTempDirectory("tables_norm").toString
    spark.range(1).select(col("id").as("event_id"), writeTs.as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables(spark, dir, "events")
    assert(out.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType, "ts must normalize to BIGINT")
    out.head().getAs[Long]("ts")
  }

  test("TIMESTAMP_NTZ micros encoding normalizes to epoch nanos") {
    val ntz = expr(s"timestampadd(MICROSECOND, ${epochUs}, " +
      "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ))")
    assert(writeAndLoad(ntz) === epochUs * 1000)
  }

  test("TIMESTAMP_LTZ micros encoding normalizes to epoch nanos") {
    assert(writeAndLoad(expr(s"timestamp_micros(${epochUs}L)")) ===
      epochUs * 1000)
  }

  test("BIGINT nanos passes through untouched, column order preserved") {
    val dir = Files.createTempDirectory("tables_norm").toString
    spark.range(1).select(col("id").as("event_id"),
        lit(epochUs * 1000).as("ts"), lit("click").as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables(spark, dir, "events")
    assert(out.columns.toSeq === Seq("event_id", "ts", "event_type"))
    assert(out.head().getAs[Long]("ts") === epochUs * 1000)
  }

  test("the shipped sf0.001 events table loads as strictly increasing-safe nanos") {
    val ts = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts")).limit(5).collect().map(_.getAs[Long]("ts"))
    assert(ts.nonEmpty)
    // nanos magnitude: any plausible event epoch is > 1e18 ns (2001+)
    assert(ts.forall(_ > 1000000000000000000L),
      s"ts must be epoch NANOS, got ${ts.head}")
  }
}
