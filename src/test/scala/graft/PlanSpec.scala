package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits — the 100 TB story. Correct results with a bad
  * plan (no pushdown, shuffled dim joins, no codegen) would collapse at
  * scale; these assertions pin the plan shapes we designed for. */
class PlanSpec extends SparkSuite {

  private def planOf(q: Q): String = {
    val df = q.fn(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  test("S3 scan: filter is pushed to parquet and columns are pruned") {
    val df = etl.Etl.s3.fn(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PushedFilters"), s"no pushdown in: $scan")
    assert(scan.contains("GreaterThanOrEqual(l_quantity,45.0)"), s"filter not pushed: $scan")
    // only the 2 needed columns are read, not all 11
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned: $scan")
  }

  test("J3 dim chain: all three dim joins are broadcast, fact is never shuffled for a join") {
    val plan = planOf(analytics.Joins.j3)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$plan")
  }

  test("Q1 aggregate: partial (map-side) aggregation precedes the shuffle, inside codegen") {
    val df = analytics.Reports.q1.fn(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("partial_sum"), s"no map-side combine:\n$plan")
    // executedPlan renders WholeStageCodegen spans as "*(n)" prefixes
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("T2 top-k: order-by-limit plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(analytics.Reports.t2)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("J1: the 5-row derived table is broadcast against the fact") {
    val plan = planOf(analytics.Joins.j1)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
