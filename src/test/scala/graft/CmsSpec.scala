package graft

import org.apache.spark.sql.functions._

/** x82 Count-Min sketch: the oracle pins the exact build+estimate replay;
  * these pin the SKETCH guarantees — one-sided error over the whole vocab
  * (not just the reported top-20), mergeability of the counter grid
  * across corpus splits (the property that makes CMS an incremental-feed
  * structure), and that the undersized width actually exercises
  * collisions rather than vacuously passing. */
class CmsSpec extends SparkSuite {
  import spark.implicits._

  test("x82 never underestimates, and collisions are real at this width") {
    val lr = ext.Cms.laneRows(ext.Cms.vocabLanes(spark, sf))
    val grid = lr.groupBy($"lane", $"bucket").agg(sum($"n").as("c"))
    val est = lr.join(grid, Seq("lane", "bucket"))
      .groupBy($"tok")
      .agg(min($"n").as("n_exact"), min($"c").cast("long").as("n_cms"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    for ((t, ex, cms) <- est) assert(cms >= ex, s"CMS underestimated $t")
    assert(est.exists { case (_, ex, cms) => cms > ex },
      "width never collided — the one-sided-error property is untested")
  }

  test("x85 join-size estimate is one-sided and equals the min of per-lane inner products") {
    val row = ext.Cms.cmsJoinSize.fn(spark, sf)
      .as[(Long, Long, Double)].collect().head
    val (est, exact, inflation) = row
    assert(est >= exact, "AMS inner product can only overestimate")
    assert(inflation >= 1.0 && inflation < 2.0,
      s"estimator useless at this width: inflation $inflation")
    // independent recompute: exact join size as sum of per-key count products
    val ev = Tables.events(spark, sf).groupBy($"user_id").agg(count(lit(1)).as("a"))
    val or = Tables.orders(spark, sf).groupBy($"o_custkey").agg(count(lit(1)).as("b"))
    val direct = ev.join(or, $"user_id" === $"o_custkey")
      .agg(sum($"a" * $"b")).as[Long].head()
    assert(exact === direct)
  }

  test("x82 counter grid is mergeable: sum of split-corpus grids equals the full grid") {
    val docs = Tables.documents(spark, sf)
    def grid(d: org.apache.spark.sql.DataFrame) = {
      val toks = d.select(explode(split($"text", " ")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("n"))
        .withColumn("m", md5($"tok"))
        .select($"tok", $"n",
          conv(substring($"m", 1, 8), 16, 10).cast("long").as("hi"),
          conv(substring($"m", 9, 8), 16, 10).cast("long").as("lo"))
      ext.Cms.laneRows(toks)
        .groupBy($"lane", $"bucket").agg(sum($"n").as("c"))
        .as[(Int, Long, Long)].collect()
        .map { case (l, b, c) => (l, b) -> c }.toMap
    }
    val full = grid(docs)
    val a = grid(docs.filter($"doc_id" % 2 === 0))
    val b = grid(docs.filter($"doc_id" % 2 === 1))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === full)
  }
}
