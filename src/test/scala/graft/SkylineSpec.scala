package graft

import org.apache.spark.sql.functions._

/** x80 skyline: the oracle pins exact parity via the same grid
  * decomposition; these pin the DEFINITION — the result equals a naive
  * quadratic skyline over all distinct dimension tuples (proving the
  * cell-winner prune loses nothing), is mutually non-dominated, and the
  * plan touches the fact table exactly once with no sort-merge join.
  */
class SkylineSpec extends SparkSuite {
  import spark.implicits._

  private def dominates(a: (Long, Double, Double), b: (Long, Double, Double)): Boolean =
    a._1 >= b._1 && a._2 >= b._2 && a._3 <= b._3 &&
      (a._1 > b._1 || a._2 > b._2 || a._3 < b._3)

  test("x80 equals the naive quadratic skyline over distinct tuples") {
    val got = ext.Skyline.paretoOffers.fn(spark, sf)
      .as[(Long, Double, Double)].collect().toSet
    val tuples = Tables.lineitem(spark, sf)
      .select(floor($"l_quantity").cast("long"),
        Parity.dec($"l_discount").cast("double"), $"l_extendedprice")
      .distinct().as[(Long, Double, Double)].collect()
    val naive = tuples.filter(t => !tuples.exists(d => dominates(d, t))).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("x80 output is mutually non-dominated and closed under cell minimality") {
    val got = ext.Skyline.paretoOffers.fn(spark, sf)
      .as[(Long, Double, Double)].collect()
    for (a <- got; b <- got if a != b)
      assert(!dominates(a, b), s"$a dominates $b inside the skyline")
    // every survivor is its cell's min price
    val mins = Tables.lineitem(spark, sf)
      .groupBy(floor($"l_quantity").cast("long").as("q"),
        Parity.dec($"l_discount").cast("double").as("d"))
      .agg(min($"l_extendedprice").as("p"))
      .as[(Long, Double, Double)].collect()
      .map { case (q, d, p) => (q, d) -> p }.toMap
    for ((q, d, p) <- got) assert(mins((q, d)) === p)
  }

  test("x80b equals the naive quadratic 2D skyline over distinct tuples") {
    val got = ext.Skyline.sweepSkyline2d.fn(spark, sf)
      .as[(Double, Long)].collect().toSet
    val tuples = Tables.lineitem(spark, sf)
      .groupBy($"l_extendedprice").agg(max(unix_micros($"l_shipdate")))
      .as[(Double, Long)].collect()
    val naive = tuples.filter { case (p, d) =>
      !tuples.exists { case (q, e) =>
        q <= p && e >= d && (q < p || e > d) }
    }.toSet
    assert(got === naive)
    assert(got.nonEmpty)
    // the Pareto-tradeoff shape: ordered by ascending price, surviving
    // ship dates are STRICTLY increasing (paying more must buy strictly
    // fresher stock, else the cheaper tuple dominates)
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    assert(ordered === ordered.sorted)
    assert(ordered.distinct.size === ordered.size)
  }

  test("x80b plan: the only unpartitioned window runs over the bucket table") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = ext.Skyline.sweepSkyline2d.fn(spark, sf)
    df.count()
    val globals = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(globals.size === 1, "exactly one global window (the bucket offsets)")
    // its subtree must aggregate to bucket grain before the window —
    // i.e. contain a hash aggregate keyed on bkt, proving the window
    // never sees the tuple table
    assert(globals.head.child.toString.contains("bkt"))
  }

  test("x80 plan: one scan, hash aggregation, broadcast anti-join, no SMJ") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = ext.Skyline.paretoOffers.fn(spark, sf)
    df.count()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    assert(nodes.count(_.isInstanceOf[FileSourceScanExec]) <= 2,
      "fact table must be scanned once per join side at most (cells reuse)")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("SortAggregate")))
  }
}
