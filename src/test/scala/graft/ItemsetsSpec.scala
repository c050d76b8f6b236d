package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x61 association rules: the oracle pins the top-100 on the real
  * baskets; this pins the metric arithmetic on a hand-computed basket set
  * and the support lattice invariants on the real data. */
class ItemsetsSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, Long)]): Unit =
    rows.map { case (ok, p) => (ok, p, Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("crafted baskets: hand-computed support, confidence, and lift") {
    val dir = java.nio.file.Files.createTempDirectory("graft-items").toString
    // 4 orders: {1,2} x3, {1,3} x1 -> sup(1)=4, sup(2)=3, sup(3)=1,
    // sup(1,2)=3, sup(1,3)=1; N=4
    write(dir, Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L),
      (4L, 1L))) // dup line collapses
    val got = ext.Itemsets.rules.fn(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 3L, 3.0 / 4, (3.0 * 4) / (4 * 3)),
      (1L, 3L, 1L, 1.0 / 4, (1.0 * 4) / (4 * 1))))
  }

  test("real baskets: lattice invariants hold for every emitted rule") {
    val dir = sf
    val rules = ext.Itemsets.rules.fn(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(rules.nonEmpty && rules.size <= 100)
    val sup = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_partkey").agg(count(lit(1)).as("s"))
      .as[(Long, Long)].collect().toMap
    rules.foreach { case (p1, p2, nBoth, conf, lift) =>
      assert(p1 < p2, "pairs are canonically ordered")
      assert(nBoth <= math.min(sup(p1), sup(p2)), "anti-monotone support")
      assert(conf > 0 && conf <= 1.0)
      assert(lift > 0)
    }
    // emitted in (support desc, p1, p2) order
    val keys = rules.map { case (p1, p2, n, _, _) => (-n, p1, p2) }
    assert(keys === keys.sorted)
  }

  private def writeStar(dir: String,
      orders: Seq[(Long, Long)], lines: Seq[(Long, Long)]): Unit = {
    orders.map { case (ok, ck) =>
      (ok, ck, "O", 1.0, Timestamp.valueOf("2024-01-01 00:00:00"), "P1") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lines.map { case (ok, p) =>
      (ok, p, Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("x140 crafted: hub part generates no pairs, Jaccard uses full sizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bask").toString
    // customers 1..66 each buy hub part 99 (degree 66 > cap 64);
    // customers 1 and 2 additionally share parts 1 and 2 (degree 2 each)
    val orders = (1L to 66L).map(c => (c, c)) // order k belongs to customer k
    val lines = (1L to 66L).map(ok => (ok, 99L)) ++
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    writeStar(dir, orders, lines)
    val got = ext.Itemsets.basketJaccard.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (1,2) survives: shared = 2 capped parts; sizes are FULL
    // baskets {1,2,99} → jaccard = 2/(3+3-2)
    assert(got === Seq((1L, 2L, 2L, 3L, 3L, 0.5)))
  }

  test("x140 real data: pair bounds, canonical order, top-20 contract") {
    val rows = ext.Itemsets.basketJaccard.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 20)
    rows.foreach { case (a, b, sh, sa, sb2, j) =>
      assert(a < b)
      assert(sh >= 2 && sh <= math.min(sa, sb2))
      assert(j > 0.0 && j <= 1.0)
      assert(j === sh.toDouble / (sa + sb2 - sh))
    }
    val keys = rows.map { case (a, b, sh, _, _, j) => (-j, -sh.toDouble, a.toDouble, b.toDouble) }
    assert(keys === keys.sorted)
  }
}
