package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x95 Gini: the oracle pins bit-exact parity; these pin the statistic on
  * crafted distributions (uniform → 0, concentrated → its exact rational),
  * that the segmented rank composition equals the plain global-window
  * rank on real data, and layout invariance of the exact-sum form.
  */
class ConcentrationSpec extends SparkSuite {
  import spark.implicits._

  private def writeStar(dir: String,
      orders: Seq[(Long, Long, Double)], custs: Seq[(Long, String)]): Unit = {
    orders.map { case (ok, ck, p) =>
      (ok, ck, "O", p, Timestamp.valueOf("2024-01-01 00:00:00"), "P1") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    custs.map { case (ck, seg) => (ck, s"c$ck", 1L, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  test("x95 crafted: uniform spend → 0; concentrated spend → exact rational") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gini").toString
    writeStar(dir,
      // EQ: four customers, $1 each → gini 0.
      // CONC: spends 1, 1, 998 pennies → G = (2·(1+2+3·998) − 4·1000)
      //   / (3·1000) = 1994/3000.
      orders = Seq((1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0), (4L, 4L, 1.0),
        (5L, 5L, 0.01), (6L, 6L, 0.01), (7L, 7L, 9.98)),
      custs = Seq(1L -> "EQ", 2L -> "EQ", 3L -> "EQ", 4L -> "EQ",
        5L -> "CONC", 6L -> "CONC", 7L -> "CONC"))
    val got = analytics.Concentration.gini.fn(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("EQ") === ((4L, 400L, 0.0)))
    assert(got("CONC") === ((3L, 1000L, 1994.0 / 3000.0)))
  }

  test("x95 segmented ranks equal the plain global-window ranks on real data") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("x"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("ck") === col("c_custkey"))
    val plain = spend
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("c_mktsegment")).orderBy(col("x"), col("ck"))))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("rnk").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
        .as("srx"))
      .as[(String, java.math.BigDecimal)].collect().toMap
    val viaOp = analytics.Concentration.gini.fn(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    // recompute gini from the plain ranks and compare bit-exact
    val base = spend.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast("decimal(18,0)")).as("sx"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((seg, (n, sx)) <- base) {
      val expected = (2.0 * plain(seg).doubleValue()
        - (n.toDouble + 1.0) * sx.doubleValue()) / (n.toDouble * sx.doubleValue())
      assert(viaOp(seg) === expected, s"segment $seg")
    }
  }

  test("x95 result is bit-identical under a hostile physical layout") {
    val base = analytics.Concentration.gini.fn(spark, sf).collect().toSeq
    val hostile = java.nio.file.Files.createTempDirectory("graft-gini-h").toString
    Tables.orders(spark, sf).orderBy(col("o_totalprice")).repartition(3)
      .write.mode("overwrite").parquet(s"$hostile/orders.parquet")
    Tables.customer(spark, sf).repartition(5)
      .write.mode("overwrite").parquet(s"$hostile/customer.parquet")
    val got = analytics.Concentration.gini.fn(spark, hostile).collect().toSeq
    assert(got === base)
  }

  test("x95 plan: every window partitions by more than the segment alone") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = analytics.Concentration.gini.fn(spark, sf)
    df.count()
    val windows = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    // the value-table window keys on (segment, bucket); the offset window
    // keys on segment but runs over the bucket table only — assert the
    // raw-data window is never the |segments|-partition global sort
    assert(windows.exists(_.partitionSpec.size >= 2))
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }

  test("x117 crafted: concordant -> +1, discordant -> -1, known mixed rational") {
    // concordant: freq and spend rank identically -> every d = 0 -> rho 1
    val dir = java.nio.file.Files.createTempDirectory("graft-sp1").toString
    writeStar(dir,
      orders = Seq((1L, 1L, 1.0),
        (2L, 2L, 1.0), (3L, 2L, 1.0),
        (4L, 3L, 1.0), (5L, 3L, 1.0), (6L, 3L, 2.0)),
      custs = Seq(1L -> "A", 2L -> "A", 3L -> "A"))
    val c = analytics.Concentration.spearman.fn(spark, dir)
      .as[(Long, Long, Double)].head()
    assert(c === ((3L, 0L, 1.0)))
    // discordant: most-frequent customer spends least (pennies 3,2,1 vs
    // freq 1,2,3) -> ranks fully reversed: d = (-2,0,2), S = 8,
    // rho = 1 - 48/(3*8) = -1
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sp2").toString
    writeStar(dir2,
      orders = Seq((1L, 1L, 0.03),
        (2L, 2L, 0.01), (3L, 2L, 0.01),
        (4L, 3L, 0.01), (5L, 3L, 0.0), (6L, 3L, 0.0)),
      custs = Seq(1L -> "A", 2L -> "A", 3L -> "A"))
    val d2 = analytics.Concentration.spearman.fn(spark, dir2)
      .as[(Long, Long, Double)].head()
    assert(d2 === ((3L, 8L, -1.0)))
  }

  test("x124 crafted: identity ranking -> tau +1 with 0 inversions; reversal -> -1 with all pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kt1").toString
    writeStar(dir,
      orders = Seq((1L, 1L, 1.0),
        (2L, 2L, 1.0), (3L, 2L, 1.0),
        (4L, 3L, 1.0), (5L, 3L, 1.0), (6L, 3L, 2.0)),
      custs = Seq(1L -> "A", 2L -> "A", 3L -> "A"))
    assert(analytics.Concentration.kendall.fn(spark, dir)
      .as[(Long, Long, Double)].head() === ((3L, 0L, 1.0)))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-kt2").toString
    writeStar(dir2,
      orders = Seq((1L, 1L, 0.03),
        (2L, 2L, 0.01), (3L, 2L, 0.01),
        (4L, 3L, 0.01), (5L, 3L, 0.0), (6L, 3L, 0.0)),
      custs = Seq(1L -> "A", 2L -> "A", 3L -> "A"))
    // ranks fully reversed: all 3 pairs inverted -> tau = 1 - 12/6 = -1
    assert(analytics.Concentration.kendall.fn(spark, dir2)
      .as[(Long, Long, Double)].head() === ((3L, 3L, -1.0)))
  }

  test("x124 decomposition equals a driver-side naive inversion count on real multi-block data") {
    // sf0.01 spans multiple rf-blocks at B=1024, so all three terms
    // (within-block, cross-block same-bucket, grid) are exercised
    val sf001 = "/root/testdata/sf0.01"
    val per = Tables.orders(spark, sf001)
      .groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).as("freq"),
        (sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long").as("mon"))
    val ranks = per
      .withColumn("rf", row_number().over(Window.orderBy(col("freq"), col("ck"))))
      .withColumn("rm", row_number().over(Window.orderBy(col("mon"), col("ck"))))
      .select("rf", "rm").as[(Int, Int)].collect()
    val naive = (for {
      a <- ranks; b <- ranks if a._1 < b._1 && a._2 > b._2
    } yield 1L).sum
    val got = analytics.Concentration.kendall.fn(spark, sf001)
      .as[(Long, Long, Double)].head()
    assert(got._1 === ranks.length.toLong)
    assert(got._2 === naive)
  }

  test("x125 crafted: on-rank quartiles exact, off-rank interpolate in quarter-pennies") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qt").toString
    writeStar(dir,
      // ON: 5 customers at 100..500 pennies → p25/p50/p75 = 200/300/400
      // OFF: 4 customers at 100..400 → 175 / 250 / 325 (type-7)
      orders = Seq((1L, 1L, 1.0), (2L, 2L, 2.0), (3L, 3L, 3.0), (4L, 4L, 4.0),
        (5L, 5L, 5.0),
        (6L, 6L, 1.0), (7L, 7L, 2.0), (8L, 8L, 3.0), (9L, 9L, 4.0)),
      custs = Seq(1L -> "ON", 2L -> "ON", 3L -> "ON", 4L -> "ON", 5L -> "ON",
        6L -> "OFF", 7L -> "OFF", 8L -> "OFF", 9L -> "OFF"))
    val got = analytics.Concentration.quartiles.fn(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("ON", 1L)) === 200.0 && got(("ON", 2L)) === 300.0
      && got(("ON", 3L)) === 400.0)
    assert(got(("OFF", 1L)) === 175.0 && got(("OFF", 2L)) === 250.0
      && got(("OFF", 3L)) === 325.0)
  }

  test("x125 equals Spark's exact percentile() on real data (independent formulation)") {
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("x"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("ck") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(expr("percentile(x, array(0.25, 0.5, 0.75))").as("ps"))
      .select(col("mktsegment"), posexplode(col("ps")))
      .select(col("mktsegment"), (col("pos") + 1).cast("long").as("qnum"),
        col("col").as("v"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = analytics.Concentration.quartiles.fn(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (seg, q, _, v) => assert(want((seg, q)) === v, s"($seg,$q)") }
  }

  test("x126 crafted: monopoly -> HHI 1; four equal players -> HHI 0.25, effective n = 4") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hhi").toString
    writeStar(dir,
      orders = Seq((1L, 1L, 5.0),
        (2L, 2L, 2.0), (3L, 3L, 2.0), (4L, 4L, 2.0), (5L, 5L, 2.0)),
      custs = Seq(1L -> "MONO",
        2L -> "EQ", 3L -> "EQ", 4L -> "EQ", 5L -> "EQ"))
    val got = analytics.Concentration.hhi.fn(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("MONO") === ((1L, 5L, 1.0, 1.0)))
    assert(got("EQ") === ((4L, 8L, 0.25, 4.0)))
  }

  test("x131 crafted: 80/15/5 split lands one customer per class at exact boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-abc").toString
    // cumulative-before-from-top: 0 (<80% -> A), 8000 (=80% -> B),
    // 9500 (=95% -> C): both boundary equalities exercised
    writeStar(dir,
      orders = Seq((1L, 1L, 80.0), (2L, 2L, 15.0), (3L, 3L, 5.0)),
      custs = Seq(1L -> "S", 2L -> "S", 3L -> "S"))
    val got = analytics.Concentration.abcClasses.fn(spark, dir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("S", "A", 1L, 8000L, 0.8),
      ("S", "B", 1L, 1500L, 0.15),
      ("S", "C", 1L, 500L, 0.05)))
  }

  test("x131 real data: classes partition each segment and shares sum to one") {
    val rows = analytics.Concentration.abcClasses.fn(spark, sf)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val base = analytics.Concentration.gini.fn(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.groupBy(_._1).foreach { case (seg, cls) =>
      val (n, total) = base(seg)
      assert(cls.map(_._3).sum === n, s"$seg customer partition")
      assert(cls.map(_._4).sum === total, s"$seg revenue partition")
      assert(math.abs(cls.map(_._5).sum - 1.0) < 1e-12, s"$seg shares")
      assert(cls.exists(_._2 == "A"), s"$seg has an A class")
    }
  }

  test("x117 ties break by custkey identically in both rank passes") {
    // all-tied metrics: both ranks fall back to custkey order -> d = 0
    val dir = java.nio.file.Files.createTempDirectory("graft-sp3").toString
    writeStar(dir,
      orders = (1L to 5L).map(ck => (ck, ck, 1.0)),
      custs = (1L to 5L).map(_ -> "A"))
    val got = analytics.Concentration.spearman.fn(spark, dir)
      .as[(Long, Long, Double)].head()
    assert(got === ((5L, 0L, 1.0)))
  }
}
