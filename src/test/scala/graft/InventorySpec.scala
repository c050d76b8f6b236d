package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x137 reflected stock: the oracle pins bit-exact parity; these pin the
  * Skorokhod identity itself — the two-window form equals a literal
  * sequential clamp-at-zero simulation on deterministic pseudo-random
  * walks (including multi-episode clamping), and the result is invariant
  * under a hostile physical layout (the windows impose their own order). */
class InventorySpec extends SparkSuite {
  import spark.implicits._

  /** Literal sequential simulation: stock_t = max(0, stock_{t-1} + d). */
  private def simulate(ds: Seq[Long]): (Long, Long, Long, Long) = {
    var stock = 0L; var lost = 0L; var peak = 0L
    ds.foreach { d =>
      val next = stock + d
      if (next < 0) { lost += -next; stock = 0 } else stock = next
      peak = math.max(peak, stock)
    }
    (ds.sum, lost, stock, peak)
  }

  private def write(dir: String, moves: Seq[(Long, Int, Long, String)]): Unit = {
    // one synthetic lineitem per move: (part, day, qty, flag)
    moves.zipWithIndex.map { case ((part, day, qty, flag), i) =>
      (i.toLong + 1, part, 1L, 1, qty.toDouble, 1.0, 0.0, 0.0, flag, "O",
        Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("crafted: window form equals the sequential clamp, multi-episode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv").toString
    // part 1: demand-first walk with two clamp episodes
    // part 2: pure draw-down (never restocked)
    val deltas1 = Seq(-5L, 3L, -4L, 10L, -2L)
    val deltas2 = Seq(-7L, -1L)
    write(dir,
      deltas1.zipWithIndex.map { case (d, i) =>
        (1L, i + 1, math.abs(d), if (d > 0) "R" else "N") } ++
      deltas2.zipWithIndex.map { case (d, i) =>
        (2L, i + 1, math.abs(d), if (d > 0) "R" else "N") })
    val got = analytics.Inventory.reflectedStock.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    val (net1, lost1, end1, peak1) = simulate(deltas1)
    val (net2, lost2, end2, peak2) = simulate(deltas2)
    assert(got(1L) === ((net1, lost1, end1, peak1)))
    assert(got(2L) === ((net2, lost2, end2, peak2)))
  }

  test("property: identity equals simulation on 50 hash-driven walks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv-prop").toString
    // deterministic pseudo-random walks: part p, step i, delta in
    // {-8..-1, 1..8} (magnitude ≥ 1, sign and size hash-driven)
    def delta(p: Long, i: Int): Long = {
      val h = scala.util.hashing.MurmurHash3.productHash((p, i))
      val mag = (math.abs(h) % 8) + 1L
      if (h % 2 == 0) mag else -mag
    }
    val walks = (1L to 50L).map(p => p -> (1 to 20).map(i => delta(p, i)))
    write(dir, walks.flatMap { case (p, ds) =>
      ds.zipWithIndex.map { case (d, i) =>
        (p, i + 1, math.abs(d), if (d > 0) "R" else "N") } })
    val expect = walks.map { case (p, ds) => p -> simulate(ds) }.toMap
    val got = analytics.Inventory.reflectedStock.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    // top-20 output: check the 20 parts it returns against the simulation
    got.foreach { case (p, v) => assert(v === expect(p), s"part $p") }
    assert(got.size === 20)
  }

  test("layout invariance: hostile repartition changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inv-l").toString
    val deltas = Seq(-5L, 3L, -4L, 10L, -2L, -9L, 6L)
    write(dir, deltas.zipWithIndex.map { case (d, i) =>
      (1L, i + 1, math.abs(d), if (d > 0) "R" else "N") })
    val base = analytics.Inventory.reflectedStock.fn(spark, dir).collect().toSeq
    // rewrite skewed: partition by quantity value, sorted descending
    val hostile = java.nio.file.Files.createTempDirectory("graft-inv-h").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(7, col("l_quantity"))
      .sortWithinPartitions(col("l_shipdate").desc)
      .write.mode("overwrite").parquet(s"$hostile/lineitem.parquet")
    val got = analytics.Inventory.reflectedStock.fn(spark, hostile).collect().toSeq
    assert(got === base)
  }
}
