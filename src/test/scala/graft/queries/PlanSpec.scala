package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guards: the properties the engine is designed
  * around (broadcasts where a side is small, pushdown reaching the
  * scans, no accidental cartesian blowups) asserted on the physical
  * plans so a refactor can't silently regress them.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q10 star join: all dimension joins broadcast, none sort-merge") {
    val p = plan("q10_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dimensions must broadcast")
  }

  test("q2: filters and column pruning reach the parquet scan") {
    val p = plan("q2_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("ReadSchema: struct<l_quantity:double"))
    assert(!p.contains("l_orderkey"), "untouched columns must be pruned")
  }

  test("q4/q5: semi and anti joins stay semi/anti (no materialized inner)") {
    assert(plan("q4_semi_join").contains("LeftSemi"))
    assert(plan("q5_anti_join").contains("LeftAnti"))
  }

  test("v1: query side broadcasts; corpus side never shuffles") {
    val p = plan("v1_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"))
  }

  test("v3: ANN probes join on the bucket (hash join, not cartesian)") {
    val p = plan("v3_ann_lsh")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t7: signature aggregation is partial+final (map-side combine)") {
    val p = plan("t7_minhash_lsh")
    // partial HashAggregate before the exchange, final after
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }
}
