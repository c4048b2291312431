package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning — the coarsest and cheapest 100 TB lever: data
  * laid out as `PARTITIONED BY (source)` directories must let a
  * source-filtered query skip every other directory at PLANNING time
  * (PartitionFilters on the scan), not read-and-discard. Pinned here
  * because nothing else in the suite writes partitioned output, so a
  * layout regression would otherwise be invisible.
  */
class PartitionPruningSpec extends SparkSpec {

  test("a source-partitioned layout prunes to one directory under a source filter") {
    val out = "target/pruning_docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("source").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("source") === "src3")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory skip), not
    // PushedFilters (row-group skip) — source is a partition column
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"expected a partition filter on source:\n$plan")
    // and the scan must see only the one matching directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    q.collect()
    val allFiles = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("source="))
    assert(allFiles > 1, "fixture must produce multiple source dirs")
    scanned.foreach(m => assert(m.value >= 1))
    // correctness: pruned result equals the unpartitioned filter
    val expect = docs.filter(col("source") === "src3")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet === expect)
  }
}
