package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The consolidated segmented-scan module ([[graft.ext.SegmentedRank]])
  * now carries the rank/offset/NTILE formulae for eleven registered
  * queries — this spec pins the module itself against the plain
  * single-partition window forms it replaces, on a generated frame with
  * adversarial structure: duplicate order keys (ties broken by id),
  * skewed segments (one segment holding half the rows), empty groups'
  * worth of separation, and negative values (arithmetic shiftright
  * segments). */
class SegmentedRankSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random frame: values collide across rows (v has
  // a small domain), groups are uneven, ids are a total order
  private lazy val frame = {
    val rows = (1L to 3000L).map { id =>
      val g = if (id % 7 < 4) "a" else if (id % 7 < 6) "b" else "c"
      // xorshift-ish scatter, small domain → plenty of ties; offset so
      // one segment (v in [0, 64)) is hot
      val v = ((id * 2654435761L) % 97 + (if (id % 3 == 0) 0 else 400)) - 50
      val w = (id * 48271) % 13 + 1
      (g, v, w, id)
    }
    rows.toDF("g", "v", "w", "id").repartition(7).localCheckpoint()
  }
  private def seg = frame.withColumn("bkt", shiftright(col("v"), 4))

  test("withGlobalRank equals the single-partition window rank; n is the total") {
    val got = ext.SegmentedRank
      .withGlobalRank(frame, shiftright(col("v"), 4), Seq(col("v"), col("id")))
      .select($"id", $"r", $"n").as[(Long, Long, Long)].collect()
    val want = frame
      .withColumn("r", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select($"id", $"r").as[(Long, Int)].collect()
      .map { case (id, r) => id -> r.toLong }.toMap
    assert(got.length === 3000)
    got.foreach { case (id, r, n) =>
      assert(n === 3000L)
      assert(r === want(id), s"id $id")
    }
  }

  test("withGroupedRank equals the per-group window rank under ties and skew") {
    val got = ext.SegmentedRank
      .withGroupedRank(seg, Seq("g"), "bkt", Seq(col("v"), col("id")), "rnk")
      .select($"g", $"id", $"rnk").as[(String, Long, Long)].collect()
    val want = frame
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .select($"g", $"id", $"rnk").as[(String, Long, Int)].collect()
      .map { case (g, id, r) => (g, id) -> r.toLong }.toMap
    got.foreach { case (g, id, r) => assert(r === want((g, id)), s"($g, $id)") }
  }

  test("withGroupedPrefix (inclusive + exclusive + totals) equals the window forms") {
    val got = ext.SegmentedRank.withGroupedPrefix(
        ext.SegmentedRank.withGroupedPrefix(
          seg, Seq("g"), "bkt", Seq(col("v"), col("id")),
          Seq((col("w"), "cum")), inclusive = true,
          valueTotals = Seq(("cum", "tot"))),
        Seq("g"), "bkt", Seq(col("v"), col("id")),
        Seq((col("w"), "prev")), inclusive = false)
      .select($"g", $"id", $"cum", $"prev", $"tot")
      .as[(String, Long, Long, Long, Long)].collect()
    val wIncl = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wExcl = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = frame
      .withColumn("cum", sum(col("w")).over(wIncl))
      .withColumn("prev", coalesce(sum(col("w")).over(wExcl), lit(0L)))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy(col("g"))))
      .select($"g", $"id", $"cum", $"prev", $"tot")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    got.foreach { case (g, id, c, p, t) =>
      assert((c, p, t) === want((g, id)), s"($g, $id)")
    }
  }

  test("ntileExpr reproduces SQL NTILE exactly, including the uneven remainder") {
    // 3000 rows, k = 7 → first 3000 % 7 = 4 buckets carry 429, rest 428
    val k = 7
    val got = ext.SegmentedRank
      .withGlobalRank(frame, shiftright(col("v"), 4), Seq(col("v"), col("id")))
      .withColumn("t", ext.SegmentedRank.ntileExpr(k).cast("int"))
      .select($"id", $"t").as[(Long, Int)].collect().toMap
    val want = frame
      .withColumn("t", ntile(k).over(Window.orderBy(col("v"), col("id"))))
      .select($"id", $"t").as[(Long, Int)].collect().toMap
    assert(got === want)
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.toSet === Set(428, 429))
  }

  test("the offsets table is broadcast and the in-segment windows are partitioned") {
    val df = ext.SegmentedRank
      .withGroupedRank(seg, Seq("g"), "bkt", Seq(col("v"), col("id")), "rnk")
    df.collect()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "offset join must be a broadcast")
    // no unpartitioned window may touch the data table: the only
    // unpartitioned window allowed is the per-group offsets scan, which
    // here is partitioned by g — so NONE should appear at all
    val unpart = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, s"unpartitioned window in grouped scan:\n$unpart")
  }

  test("withGroupedPrefix rejects a fractional value column instead of truncating") {
    // the prefix machinery is exact-integer (offset + in-segment sum cast
    // to long); a double value would silently truncate — must fail loudly
    val e = intercept[IllegalArgumentException] {
      ext.SegmentedRank.withGroupedPrefix(
        seg.withColumn("vd", col("v") / 2.0), Seq("g"), "bkt",
        Seq(col("v"), col("id")), Seq((col("vd"), "ps")), inclusive = true)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
