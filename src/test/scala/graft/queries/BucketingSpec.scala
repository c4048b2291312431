package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing — the 100 TB technique for repeated
  * large-large joins on a stable key: both sides pre-bucketed on the
  * join key join with NO shuffle exchange at query time.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("bucketed large-large join runs without a shuffle exchange") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_bkt")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_bkt")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("v"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself introduces no exchange: bucket layout satisfies
      // the distribution requirement on both sides
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      val exchangesBelowJoin = "Exchange hashpartitioning".r
        .findAllIn(joinSection).length
      assert(plan.contains("SortMergeJoin"))
      assert(exchangesBelowJoin === 0,
        s"bucketed join must not shuffle its inputs:\n$plan")

      // and it computes the same result as the unbucketed join
      val expected = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("v"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
