package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime half of the skew story (q17's
  * salted aggregation is the compile-time half): a join key holding
  * most of the rows must not strand the job on one straggler task.
  * AQE detects the oversized partition at the shuffle boundary and
  * splits it across tasks (OptimizeSkewedJoin), with no change to the
  * query. This pins the behavior so a config/refactor can't silently
  * lose it — at 100 TB a single hot key (one viral document, one
  * mega-job) is the norm, not the exception.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key holds ~95% of the fact rows
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 101)
          .as("k"), col("id").as("v"))
      val dim = spark.range(101).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val rows = joined.collect()
      // correctness unchanged by the skew split
      // 190000 non-multiples of 20, plus the 100 ids divisible by both
      // 20 and 101 (id % 2020 == 0) whose modulo also lands on 0
      val hot = rows.find(_.getAs[String]("name") == "d0").get
      assert(hot.getAs[Long]("n") === 190100L)
      assert(rows.length === 101)
      // the FINAL adaptive plan must mark the hot partition skew-split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
