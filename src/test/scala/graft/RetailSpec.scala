package graft

import java.sql.Timestamp

/** x128 mode / x129 comparable sales: oracles pin bit-exact parity;
  * these pin the tiebreak rule and the mix-shift exclusion — the two
  * semantic choices the hash compare can't distinguish from luck. */
class RetailSpec extends SparkSuite {
  import spark.implicits._

  private def writeStar(dir: String,
      orders: Seq[(Long, Long, Double, String, String)],
      custs: Seq[(Long, String)]): Unit = {
    orders.map { case (ok, ck, p, d, prio) =>
      (ok, ck, "O", p, Timestamp.valueOf(d + " 00:00:00"), prio) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    custs.map { case (ck, seg) => (ck, s"c$ck", 1L, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  test("x128 crafted: clear majority wins; exact count tie falls to the lexicographic value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mode").toString
    writeStar(dir,
      orders = Seq(
        (1L, 1L, 1.0, "2024-01-01", "2-HIGH"), (2L, 1L, 1.0, "2024-01-01", "2-HIGH"),
        (3L, 1L, 1.0, "2024-01-01", "1-URGENT"),
        (4L, 2L, 1.0, "2024-01-01", "3-MEDIUM"), (5L, 2L, 1.0, "2024-01-01", "3-MEDIUM"),
        (6L, 2L, 1.0, "2024-01-01", "1-URGENT"), (7L, 2L, 1.0, "2024-01-01", "1-URGENT")),
      custs = Seq(1L -> "MAJ", 2L -> "TIE"))
    val got = analytics.Retail.mode.fn(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("MAJ") === (("2-HIGH", 2L, 2.0 / 3.0)))
    assert(got("TIE") === (("1-URGENT", 2L, 0.5))) // 2=2 tie -> lex smaller
  }

  test("x129 crafted: only both-week customers count; growth is exact on their pennies") {
    val dir = java.nio.file.Files.createTempDirectory("graft-comp").toString
    // weeks: 2024-01-01 (Mon) and 2024-01-08
    writeStar(dir,
      orders = Seq(
        (1L, 1L, 1.00, "2024-01-02", "P"), (2L, 1L, 1.50, "2024-01-09", "P"),
        (3L, 2L, 9.00, "2024-01-09", "P")), // week-2-only: excluded
      custs = Seq(1L -> "A", 2L -> "A"))
    val got = analytics.Retail.compSales.fn(spark, dir)
      .select($"wk".cast("string"), $"comp_customers", $"rev_cents",
        $"prev_rev_cents", $"growth")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("2024-01-08", 1L, 150L, 100L, 0.5)))
  }
}
