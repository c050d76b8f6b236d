package graft

import java.sql.Timestamp

/** x114 RFM segmentation: the oracle pins bit-exact grid parity; these
  * pin the scoring semantics on crafted customers (1 = best on every
  * axis, custkey tie order), and the marginal balance the NTILE
  * derivation guarantees on real data. */
class RfmSpec extends SparkSuite {
  import spark.implicits._

  private def writeOrders(dir: String, rows: Seq[(Long, Long, Double, String)]): Unit =
    rows.zipWithIndex.map { case ((ck, _, p, d), i) =>
      (i.toLong + 1, ck, "O", p, Timestamp.valueOf(d + " 00:00:00"), "p") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("x114 crafted: perfectly separated customers land on the diagonal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rfm").toString
    // customer i (1..5): last order on Jan (11-i), 6-i orders of $100
    // each → strictly better on ALL axes than customer i+1 → cell (i,i,i)
    val rows = for {
      ck <- 1L to 5L
      j <- 1 to (6 - ck.toInt)
    } yield (ck, 0L, 100.0, f"2024-01-${11 - ck.toInt - (j - 1)}%02d")
    writeOrders(dir, rows)
    val got = analytics.Rfm.rfm.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === (1 to 5).map(i =>
      (i.toLong, i.toLong, i.toLong, 1L, (6 - i) * 10000L)))
  }

  test("x114 crafted: fully tied customers split one per quintile by custkey") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rfm2").toString
    writeOrders(dir, (1L to 5L).map(ck => (ck, 0L, 100.0, "2024-01-10")))
    val got = analytics.Rfm.rfm.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === (1 to 5).map(i => (i.toLong, i.toLong, i.toLong, 1L, 10000L)))
  }

  test("x114 real data: grid partitions customers; every marginal is ±1 balanced") {
    val rows = analytics.Rfm.rfm.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val active = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._4).sum === active)
    for (axis <- Seq[((Long, Long, Long, Long, Long)) => Long](_._1, _._2, _._3)) {
      val sizes = rows.groupBy(axis).view.mapValues(_.map(_._4).sum).values.toSeq
      assert(sizes.size === 5)
      assert(sizes.max - sizes.min <= 1, s"unbalanced marginal: $sizes")
    }
    assert(rows.forall(_._5 >= 0))
  }
}
