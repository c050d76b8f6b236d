package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** x100 KS drift / x101 Simpson diversity: the oracle pins bit-exact
  * parity; these pin the statistics on crafted distributions (hand-walked
  * CDFs, identical-distribution zero, NULL exclusion), the segmented-scan
  * equivalence against a plain global-window formulation, and bounds on
  * real data.
  */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String, Option[Double])]): Unit =
    rows.map { case (id, uid, et, v) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), uid, et,
        v.map(java.lang.Double.valueOf).orNull, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("x100 crafted: hand-walked CDFs, earliest-value tiebreak, NULL excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ks").toString
    writeEvents(dir, Seq(
      // "s": A(even users)={1.00, 2.00}, B(odd)={2.00, 3.00} →
      // dnum at v: 100→|1·2−0·2|=2, 200→|2·2−1·2|=2, 300→0;
      // max 2, tie → smallest v=100 → at_value 1.0, ks 2/4=0.5
      (1L, 0L, "s", Some(1.0)), (2L, 2L, "s", Some(2.0)),
      (3L, 1L, "s", Some(2.0)), (4L, 3L, "s", Some(3.0)),
      // "z": identical singletons → ks 0
      (5L, 0L, "z", Some(5.0)), (6L, 1L, "z", Some(5.0)),
      // a NULL value must not perturb either cohort
      (7L, 0L, "z", None)))
    val got = ext.Drift.ksDrift.fn(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("s") === ((2L, 2L, 2L, 1.0, 0.5)))
    assert(got("z") === ((1L, 1L, 0L, 5.0, 0.0)))
  }

  test("x100 segmented scan equals the plain per-type global window on real data") {
    val naive = {
      val pts = Tables.events(spark, sf)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"),
          pmod(col("user_id"), lit(2)).cast("long").as("b"))
      val g = pts.groupBy(col("event_type"), col("v"))
        .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = Window.partitionBy(col("event_type"))
      g.withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .withColumn("na", sum(col("ca")).over(t))
        .withColumn("nb", sum(col("cb")).over(t))
        .withColumn("dnum", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
        .withColumn("pick", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("dnum").desc, col("v"))))
        .filter(col("pick") === 1)
        .select(col("event_type"), col("dnum").cast("long"))
        .as[(String, Long)].collect().toMap
    }
    val got = ext.Drift.ksDrift.fn(spark, sf)
      .select(col("event_type"), col("ks_scaled")).as[(String, Long)].collect().toMap
    assert(got === naive)
  }

  test("x100 is invariant under a hostile physical layout") {
    val base = ext.Drift.ksDrift.fn(spark, sf).collect().toSeq
    val hostile = java.nio.file.Files.createTempDirectory("graft-ks-h").toString
    Tables.events(spark, sf).orderBy(col("value").desc_nulls_first).repartition(3)
      .write.mode("overwrite").parquet(s"$hostile/events.parquet")
    val got = ext.Drift.ksDrift.fn(spark, hostile).collect().toSeq
    assert(got === base)
  }

  test("x101 crafted: even split scores 1/2; single source scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-simpson").toString
    Seq(("aa", "x"), ("aa", "x"), ("aa", "y"), ("aa", "y"),
        ("bb", "z"), ("bb", "z"), ("bb", "z"))
      .zipWithIndex.map { case ((l, s0), i) => (i.toLong, s"doc$i", l, s0, 4L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.Drift.simpsonDiversity.fn(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // aa: n=4, Σc²=8 → num 16−8=8, diversity 0.5; bb: n=3, Σc²=9 → 0
    assert(got === Map(
      "aa" -> ((4L, 2L, 8L, 0.5)),
      "bb" -> ((3L, 1L, 0L, 0.0))))
  }

  private def writeCustomers(dir: String, rows: Seq[(String, Long)]): Unit =
    rows.zipWithIndex.map { case ((seg, nat), i) => (i.toLong, s"c$i", nat, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

  test("x103 crafted: uniform grid scores exactly 0; diagonal scores chi2=n, V=1") {
    val indep = java.nio.file.Files.createTempDirectory("graft-chi2a").toString
    // 2 segments × 2 nations, 3 customers per cell → O = r·c/n everywhere
    writeCustomers(indep, for {
      seg <- Seq("A", "B"); nat <- Seq(1L, 2L); _ <- 1 to 3
    } yield (seg, nat))
    val i = ext.Drift.chi2Independence.fn(spark, indep)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(i === ((12L, 2L, 2L, 1L, 0.0, 0.0)))
    // perfect association: A↔1, B↔2 (5 each) → χ² = n = 10, V = 1
    val dep = java.nio.file.Files.createTempDirectory("graft-chi2b").toString
    writeCustomers(dep,
      Seq.fill(5)(("A", 1L)) ++ Seq.fill(5)(("B", 2L)))
    val d = ext.Drift.chi2Independence.fn(spark, dep)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(d === ((10L, 2L, 2L, 1L, 10.0, 1.0)))
  }

  test("x103 real data: statistic nonnegative, V within [0,1], full grid counted") {
    val (n, r, c, dof, chi2, v) = ext.Drift.chi2Independence.fn(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(n === Tables.customer(spark, sf).count())
    assert(dof === (r - 1) * (c - 1))
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("x108 crafted: hand-computed tied mid-ranks, identity ends, NULL excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mwu").toString
    writeEvents(dir, Seq(
      // "s": A(even)={1,2,2}, B(odd)={2,3} → doubled mid-ranks:
      //   v=1: 2·0+1+1=2 (A); v=2: prev=1,t=3 → 2·1+3+1=6 each (A,A,B);
      //   v=3: prev=4,t=1 → 10 (B). R2_A = 2+6+6 = 14;
      //   U2_A = 14 − 3·4 = 2; rho = 2/(2·3·2) = 1/6
      //   (cross-check: P(a>b)+½P(a=b) over 6 pairs = (½+½)/6 = 1/6)
      (1L, 0L, "s", Some(1.0)), (2L, 2L, "s", Some(2.0)), (3L, 4L, "s", Some(2.0)),
      (4L, 1L, "s", Some(2.0)), (5L, 3L, "s", Some(3.0)),
      // "z": identical singletons → all tied → rho exactly 0.5
      (6L, 0L, "z", Some(5.0)), (7L, 1L, "z", Some(5.0)),
      // NULL must not perturb either cohort's ranks
      (8L, 1L, "z", None)))
    val got = ext.Drift.mannWhitney.fn(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("s") === ((3L, 2L, 14L, 2L, 1.0 / 6)))
    assert(got("z") === ((1L, 1L, 3L, 1L, 0.5)))
  }

  test("x108 real data: rank-sum identity and segmented-equals-plain-window") {
    // R2_A + R2_B = n(n+1) (total doubled rank mass) ⟺ via the U form:
    // recompute R2_B with the plain global window and check both the
    // identity and that the segmented R2_A equals the plain one.
    val pts = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("v"),
        pmod(col("user_id"), lit(2)).cast("long").as("b"))
    val g = pts.groupBy(col("event_type"), col("v"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = g
      .withColumn("prev", coalesce(sum(col("ca") + col("cb")).over(w), lit(0L)))
      .withColumn("t", col("ca") + col("cb"))
      .groupBy(col("event_type"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca") * (lit(2L) * col("prev") + col("t") + 1)).as("r2_a"),
        sum(col("cb") * (lit(2L) * col("prev") + col("t") + 1)).as("r2_b"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val got = ext.Drift.mannWhitney.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    for ((et, na, nb, r2a, u2a, rho) <- got) {
      val (pna, pnb, pr2a, pr2b) = plain(et)
      assert((na, nb, r2a) === ((pna, pnb, pr2a)), s"$et segmented vs plain")
      val n = na + nb
      assert(pr2a + pr2b === n * (n + 1), s"$et total rank mass")
      assert(u2a === r2a - na * (na + 1), s"$et U from R")
      assert(rho >= 0.0 && rho <= 1.0, s"$et rho range")
    }
  }

  test("x101 real corpus: diversity within [0, 1-1/k] and recomputable") {
    val rows = ext.Drift.simpsonDiversity.fn(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((lang, n, k, num, d) <- rows) {
      assert(num >= 0 && num <= n.toDouble * n, s"$lang")
      assert(d >= 0.0 && d <= 1.0 - 1.0 / k + 1e-12, s"$lang: $d vs k=$k")
      assert(d === num.toDouble / (n.toDouble * n), s"$lang recompute")
    }
  }

  test("x141 crafted: flags fire exactly where p crosses the 3-sigma band") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-pchart").toString
    // three ISO weeks x 100 items: 2, 50, 26 returns
    def wk(d: String, n: Int, r: Int) = (1 to n).map(i =>
      (Timestamp.valueOf(s"$d 00:00:00"), if (i <= r) "R" else "N"))
    (wk("2024-01-01", 100, 2) ++ wk("2024-01-08", 100, 50) ++
      wk("2024-01-15", 100, 26))
      .toDF("l_shipdate", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = ext.Drift.pChart.fn(spark, dir)
      .as[(java.sql.Date, Long, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq
    val pBar = 78.0 / 300
    val margin = 3.0 * math.sqrt(pBar * (1.0 - pBar) / 100)
    assert(got.map(_._8) === Seq(1L, 1L, 0L)) // low-out, high-out, in
    got.foreach { case (_, n, r, p, pb, ucl, lcl, flag) =>
      assert(n === 100L)
      assert(pb === pBar)
      assert(ucl === pBar + margin)
      assert(lcl === math.max(0.0, pBar - margin))
      assert(p === r.toDouble / 100)
      assert((flag == 1L) === (p > ucl || p < lcl))
    }
  }

  test("x142 crafted: hand-computed F on two groups") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-anova").toString
    // $100-grain values: A -> 1, 3; B -> 5, 7
    Seq((1L, 100.0, "A"), (2L, 300.0, "A"), (3L, 500.0, "B"), (4L, 700.0, "B"))
      .map { case (ok, v, g) =>
        (ok, ok, "O", v, Timestamp.valueOf("2024-01-01 00:00:00"), g) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ext.Drift.anovaF.fn(spark, dir)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    // fold = 16/2 + 144/2 = 80; SSB = 80 - 256/4 = 16; SSW = 84 - 80 = 4
    // F = (16/1)/(4/2) = 8; eta2 = 16/20
    assert(r === ((2L, 4L, 16.0, 4.0, Some(8.0), Some(0.8))))
  }

  test("x142 real data: the ordered fold equals a scalar replay") {
    val grp = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("g"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(floor(col("o_totalprice") / 100).cast("long")).cast("long").as("sg"),
        sum(floor(col("o_totalprice") / 100).cast("decimal(18,0)")
          * floor(col("o_totalprice") / 100).cast("decimal(18,0)"))
          .cast("long").as("syyg"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Long)].collect()
    var sb = 0.0
    grp.foreach { case (_, ng, sg, _) => sb += (sg.toDouble * sg.toDouble) / ng }
    val n = grp.map(_._2).sum; val s = grp.map(_._3).sum
    val syy = grp.map(_._4).sum
    val ssb = sb - (s.toDouble * s.toDouble) / n
    val ssw = syy.toDouble - sb
    val k = grp.length
    val r = ext.Drift.anovaF.fn(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().head
    assert(r._1 === k.toLong)
    assert(r._3 === ssb)
    assert(r._4 === ssw)
    assert(r._5 === Some((ssb / (k - 1)) / (ssw / (n - k))))
  }
}
