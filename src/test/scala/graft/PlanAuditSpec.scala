package graft

/** Global plan audit over every registered query: no accidental cartesian
  * products, no disabled codegen — the whole-registry version of the
  * per-query assertions in PlanSpec. Intended (broadcast) cross joins
  * compile to BroadcastNestedLoopJoin, which is allowed for the queries
  * that declare them. */
class PlanAuditSpec extends SparkSuite {

  // queries that intentionally cross-join a broadcast scalar/query set
  private val broadcastCrossOk = Set(
    "a7_latest_week_volume", "a9_stale_customers", "p6_latest_week_rows",
    "x5_cosine_topk", "x6_ann_lsh_topk", "x12_ivf_ann_topk",
    "x14_embedding_dedup", // non-equi (id<id) pair join over a bounded set
    "x18_tfidf_topterm")   // broadcast of the 1-row corpus-size aggregate

  test("registry is well-formed: unique names, oracles only for registered queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString()
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin appears only where a broadcast cross join is declared") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString()
      if (plan.contains("BroadcastNestedLoopJoin") && !broadcastCrossOk(q.name)) Some(q.name)
      else None
    }
    assert(offenders.isEmpty, s"unexpected BNLJ in: $offenders")
  }

  test("every query result is deterministically ordered (repeatable bytes)") {
    // spot-check a representative sample: run twice, identical sequences
    val sample = Seq("q1_pricing_summary", "w2_latest_order_per_customer",
      "x4_jaccard_pairs", "x5_cosine_topk", "d1_dedup_keep_first")
    sample.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a === b, s"$name not repeatable")
    }
  }
}
