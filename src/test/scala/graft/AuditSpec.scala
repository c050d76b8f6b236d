package graft

import java.sql.Timestamp

/** x76/x77 data-quality audits: the oracles certify zeros on the healthy
  * corpus; these pin the DETECTION paths — planted orphans (rows vs
  * distinct keys), and a silent feed's freshness lag. */
class AuditSpec extends SparkSuite {
  import spark.implicits._

  test("x76: planted orphans count rows and distinct keys separately") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // orders 1 and 2 exist; lineitem references 1, 2, and TWICE the
    // missing order 99 (2 orphan rows, 1 orphan key)
    Seq((1L, 10L, "O", 1.0, t0, "p"), (2L, 11L, "O", 1.0, t0, "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 2L), (99L, 3L), (99L, 4L))
      .map { case (ok, ln) => (ok, ln, t0) }
      .toDF("l_orderkey", "l_linenumber", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // satisfy the remaining declared relations with healthy tiny tables
    Seq((10L, 0L), (11L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((0L, "r")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val got = etl.Audit.fkOrphans.fn(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("lineitem.l_orderkey -> orders.o_orderkey") === ((2L, 1L)))
    assert(got.filterKeys(_ != "lineitem.l_orderkey -> orders.o_orderkey")
      .values.forall(_ == ((0L, 0L))))
  }

  test("x77: a silent feed reads as lag; the fresh window counts correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit2").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // 'live' events up to Jan 20 (high-water); 'stale' stopped Jan 5 —
    // 15 days behind, outside the 7-day window
    Seq(
      (1L, ts("2024-01-20 00:00:00"), 1L, "live", 0.0, ""),
      (2L, ts("2024-01-16 00:00:00"), 1L, "live", 0.0, ""),
      (3L, ts("2024-01-01 00:00:00"), 1L, "live", 0.0, ""),
      (4L, ts("2024-01-05 00:00:00"), 2L, "stale", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = etl.Audit.freshness.fn(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val day = 86400000000L
    assert(got("live") === ((0L, 2L)))       // Jan 20 + Jan 16 inside 7d; Jan 1 out
    assert(got("stale") === ((15L * day, 0L)))
  }

  test("x90 crafted: digits counted from the integer part; fractions sum to 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-benford").toString
    // 19.99 → digit 1 (floor first), 900.5 → 9, 2.0 → 2, 0.5 → excluded
    Seq((1L, 19.99), (2L, 900.5), (3L, 2.0), (4L, 0.5), (5L, 150000.0))
      .map { case (k, p) => (k, k, "O", p,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "P") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = etl.Audit.benford.fn(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
    val byDigit = got.map(r => r._1 -> r._2).toMap
    assert(byDigit === Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 1L))
    assert(got.map(_._3).sum === 1.0) // observed fractions over 9 digits
    // expectations are the Benford law values and sum to ~1
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
  }

  test("x90 on real data: every digit present, deviations bounded sanely") {
    import spark.implicits._
    val got = etl.Audit.benford.fn(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq === (1L to 9L))
    assert(got.map(_._2).sum === Tables.orders(spark, sf)
      .filter($"o_totalprice" >= 1).count())
    // the synthetic uniform-ish price distribution is NOT Benford —
    // the audit should show real deviation (that's its job), bounded by 1
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("x96: key-determined FDs hold; attribute pairs report their violations") {
    import spark.implicits._
    val got = etl.Audit.fdAudit.fn(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.size === 5)
    // lhs IS a key → must hold with fan-out exactly 1
    assert(got("part: p_partkey -> p_brand")._4 === 1L)
    assert(got("part: p_partkey -> p_brand")._3 === 1L)
    assert(got("nation: n_nationkey -> n_regionkey")._4 === 1L)
    // attribute pairs on the synthetic data genuinely violate
    val brandType = got("part: p_brand -> p_type")
    assert(brandType._2 > 0L && brandType._4 === 0L && brandType._3 > 1L)
    // n_lhs sanity: one row per distinct lhs value
    assert(got("customer: c_nationkey -> c_mktsegment")._1 ===
      Tables.customer(spark, sf).select($"c_nationkey").distinct().count())
  }

  test("x96 verdict flips when a violation is planted into a holding FD") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("x96-fd").toString
    for (t <- Seq("part", "customer", "orders", "nation"))
      Tables.table(spark, sf, t).write.mode("overwrite").parquet(s"$d/$t.parquet")
    // duplicate one partkey with a DIFFERENT brand → p_partkey→p_brand breaks
    val p = Tables.part(spark, sf)
    p.unionByName(p.limit(1).withColumn("p_brand",
        org.apache.spark.sql.functions.lit("Brand#99")))
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = etl.Audit.fdAudit.fn(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("part: p_partkey -> p_brand") ===
      ((Tables.part(spark, sf).count(), 1L, 2L, 0L)))
    assert(got("nation: n_nationkey -> n_regionkey")._4 === 1L) // unaffected
  }

  test("x105: five declared keys profiled; skew factor >= 1 and recomputable") {
    import spark.implicits._
    val rows = etl.Audit.skewAudit.fn(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq ===
      Seq("events.user_id", "lineitem.l_orderkey", "lineitem.l_partkey",
        "lineitem.l_suppkey", "orders.o_custkey"))
    for ((key, n, k, mx, skew) <- rows) {
      assert(k <= n && mx >= 1 && mx <= n, key)
      // max/mean >= 1 always; == 1 iff perfectly uniform
      assert(skew >= 1.0 - 1e-12, s"$key: $skew")
      assert(skew === mx.toDouble * k / n, s"$key recompute")
    }
    // cross-check one profile against a direct computation
    val li = Tables.events(spark, sf).groupBy($"user_id").count()
      .agg(org.apache.spark.sql.functions.max($"count"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .as[(Long, Long)].collect().head
    val ev = rows.find(_._1 == "events.user_id").get
    assert((ev._4, ev._3) === li)
  }

  test("x113 crafted: every band hit, strict boundaries, exact micros arithmetic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recon").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, 110.00), (2L, 100.05), (3L, 101.00), (4L, 110.00),
      (5L, 200.00), (6L, 50.00), (7L, 100.00), (8L, 216.00))
      .map { case (k, p) => (k, 1L, "O", p, t0, "p") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // (orderkey, extendedprice, discount, tax)
    Seq(
      (1L, 100.00, 0.00, 0.10), // calc 110.00 → 0_exact
      (2L, 100.00, 0.00, 0.00), // diff 0.05/100.05 → 1_lt_0.1pct
      (3L, 100.00, 0.00, 0.00), // diff 1.00/101.00 ≈ 0.99% → 2_lt_1pct
      (4L, 100.00, 0.00, 0.00), // diff 10/110 ≈ 9.1% → 3_lt_10pct
      (5L, 100.00, 0.00, 0.00), // diff 50% → 4_gte_10pct
      // order 6 has NO lines → 5_no_lineitems
      (7L, 99.90, 0.00, 0.00),  // diff 0.10/100.00 = EXACTLY 0.1% →
                                // strict < sends it to 2_lt_1pct
      (8L, 100.00, 0.10, 0.20), // 100·0.90·1.20 = 108.00
      (8L, 100.00, 0.00, 0.08)) // + 108.00 = 216.00 → 0_exact
      .zipWithIndex
      .map { case ((ok, e, d, t), i) => (ok, i.toLong, e, d, t, t0) }
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "l_tax", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = etl.Audit.reconciliation.fn(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("0_exact", 2L, 0L),
      ("1_lt_0.1pct", 1L, 50000L),
      ("2_lt_1pct", 2L, 1100000L),
      ("3_lt_10pct", 1L, 10000000L),
      ("4_gte_10pct", 1L, 100000000L),
      ("5_no_lineitems", 1L, 0L)))
  }

  test("x113 real data: bands partition the orders table exactly") {
    val rows = etl.Audit.reconciliation.fn(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
    val names = Set("0_exact", "1_lt_0.1pct", "2_lt_1pct", "3_lt_10pct",
      "4_gte_10pct", "5_no_lineitems")
    assert(rows.map(_._1).toSet.subsetOf(names))
    assert(rows.forall(_._3 >= 0))
  }

  test("x135 crafted: singleton and pair groups violate exactly the k levels they should") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon").toString
    // groups by (nation, segment, floor(bal/1000)): A has 1 member,
    // B has 2 (one balance at the band seam 999.99 vs 1000.0 SPLITS),
    // C has 5 — so bands: A:1, B1:{2}, B2:{1}... build explicitly:
    //   (1,'S',0) -> 1 member; (2,'S',0) -> 2 members; (3,'S',0) -> 5
    val custs =
      Seq((1L, 1L, 500.0)) ++
        (2L to 3L).map(i => (10L + i, 2L, 500.0)) ++
        (1L to 5L).map(i => (20L + i, 3L, 500.0))
    custs.map { case (ck, nat, bal) => (ck, s"c$ck", nat, bal, "S") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = etl.Audit.kAnonymity.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (2L, 3L, 1L, 1L, 1L),   // only the singleton violates k=2
      (5L, 3L, 2L, 3L, 1L),   // singleton + pair violate k=5 (3 at risk)
      (10L, 3L, 3L, 8L, 1L))) // all three groups violate k=10
  }

  test("x135 real data: counts are monotone in k and bounded by the group total") {
    import spark.implicits._
    val got = etl.Audit.kAnonymity.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val nGroups = got.head._2
    assert(got.forall(_._2 == nGroups))
    assert(got.map(_._3) === got.map(_._3).sorted) // violations monotone in k
    assert(got.forall(r => r._3 <= nGroups && r._4 >= r._3))
  }

  test("x183 crafted: homogeneous groups violate exactly the l levels they should") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ldiv").toString
    // quasi-id is (nation, band=0) everywhere; diversity differs:
    //   nation 1: 4 members, ALL segment 'S'      -> l_div 1 (k=4 hides it)
    //   nation 2: 2 members, segments 'S','T'     -> l_div 2
    //   nation 3: 3 members, segments 'S','T','U' -> l_div 3
    val custs =
      (1L to 4L).map(i => (i, 1L, "S")) ++
        Seq((11L, 2L, "S"), (12L, 2L, "T")) ++
        Seq((21L, 3L, "S"), (22L, 3L, "T"), (23L, 3L, "U"))
    custs.map { case (ck, nat, seg) => (ck, s"c$ck", nat, 500.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = etl.Audit.lDiversity.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (2L, 3L, 1L, 4L, 1L),  // the homogeneous 4-member group violates l=2
      (3L, 3L, 2L, 6L, 1L),  // + the 2-segment pair group at l=3
      (5L, 3L, 3L, 9L, 1L))) // all three at l=5
  }

  test("x183 real data: agrees with a JVM recount of group diversities") {
    import spark.implicits._
    val rows: Array[(Long, Long, String)] = Tables.customer(spark, sf)
      .select($"c_nationkey",
        org.apache.spark.sql.functions.floor($"c_acctbal" / 1000)
          .cast("long").as("band"),
        $"c_mktsegment")
      .as[(Long, Long, String)].collect()
    val groups: Seq[(Long, Long)] = rows.groupBy(r => (r._1, r._2)).values
      .map(rs => (rs.length.toLong, rs.map(_._3).distinct.length.toLong)).toSeq
    val got = etl.Audit.lDiversity.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    got.foreach { case (l, nGroups, viol, atRisk, minDiv) =>
      assert(nGroups == groups.size.toLong)
      assert(viol == groups.count(_._2 < l).toLong)
      assert(atRisk == groups.filter(_._2 < l).map(_._1).sum)
      assert(minDiv == groups.map(_._2).min)
    }
  }
}
