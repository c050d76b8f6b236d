package graft

/** x115 ROLLUP / x116 CUBE: the oracles pin bit-exact grouping-set
  * parity vs DuckDB; these pin the additivity laws the grouping sets
  * must satisfy on real data (subtotals are sums of their children,
  * margins agree across axes) and the single-aggregate plan shape. */
class OlapSpec extends SparkSuite {
  import spark.implicits._

  test("x115 rollup: each level is the exact sum of the level below") {
    val rows = analytics.Olap.rollupRevenue.fn(spark, sf)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val leaves = rows.filter(_._1 == 0L)
    val regionSub = rows.filter(_._1 == 1L)
    val grand = rows.filter(_._1 == 3L)
    assert(grand.size === 1)
    // region subtotals = sum of that region's nation leaves
    regionSub.foreach { case (_, r, all, rev, n) =>
      assert(all === "(all)")
      val kids = leaves.filter(_._2 == r)
      assert(kids.nonEmpty)
      assert(rev === kids.map(_._4).sum)
      assert(n === kids.map(_._5).sum)
    }
    // grand total = sum of region subtotals = sum of leaves
    assert(grand.head._4 === regionSub.map(_._4).sum)
    assert(grand.head._4 === leaves.map(_._4).sum)
    assert(grand.head._5 === leaves.map(_._5).sum)
  }

  test("x116 cube: both one-dim margins and the grand total are consistent") {
    val rows = analytics.Olap.cubeOrders.fn(spark, sf)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    val leaves = rows.filter(_._1 == 0L)
    val byPrio = rows.filter(_._1 == 1L) // status rolled away
    val bySt = rows.filter(_._1 == 2L) // priority rolled away
    val grand = rows.filter(_._1 == 3L)
    byPrio.foreach { case (_, p, _, rev, n) =>
      val kids = leaves.filter(_._2 == p)
      assert(rev === kids.map(_._4).sum && n === kids.map(_._5).sum)
    }
    bySt.foreach { case (_, _, st, rev, n) =>
      val kids = leaves.filter(_._3 == st)
      assert(rev === kids.map(_._4).sum && n === kids.map(_._5).sum)
    }
    assert(grand.size === 1)
    assert(grand.head._5 === leaves.map(_._5).sum)
    assert(grand.head._5 === byPrio.map(_._5).sum)
    assert(grand.head._5 === bySt.map(_._5).sum)
  }

  test("x122 shares: nations sum to 1 per region, regions sum to 1 overall, cents match x115") {
    val rows = analytics.Olap.contribution.fn(spark, sf)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, ns) =>
      assert(math.abs(ns.map(_._4).sum - 1.0) < 1e-12)
    }
    // region_share_of_total repeats per nation row; one value per region
    val regionShares = rows.groupBy(_._1).map { case (_, ns) =>
      assert(ns.map(_._5).distinct.size === 1); ns.head._5
    }
    assert(math.abs(regionShares.sum - 1.0) < 1e-12)
    // leaf cents agree with the x115 rollup's leaf level
    val rollupLeaves = analytics.Olap.rollupRevenue.fn(spark, sf)
      .as[(Long, String, String, Long, Long)].collect()
      .filter(_._1 == 0L).map(r => (r._2, r._3) -> r._4).toMap
    rows.foreach { case (r, n, cents, _, _) =>
      assert(rollupLeaves((r, n)) === cents)
    }
  }

  test("x115/x116 plan: ONE aggregate pass over an Expand, no join shuffle beyond the dims") {
    Seq(analytics.Olap.rollupRevenue, analytics.Olap.cubeOrders).foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      // grouping sets compile to Expand + a single partial/final hash agg
      assert(plan.contains("Expand"), s"${q.name}: expected Expand\n$plan")
      assert(!plan.contains("SortAggregate"), s"${q.name}: hash agg expected\n$plan")
      assert(!plan.contains("CartesianProduct"), q.name)
    }
  }
}
