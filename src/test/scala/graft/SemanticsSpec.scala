package graft

import org.apache.spark.sql.functions._

/** The SURVEY §7.3 "hard parts": NULL-semantics drift, rounding parity,
  * HAVING over all-NULL MAX — each pinned on hand-built data so a
  * regression fails loudly rather than silently diverging from the oracle. */
class SemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("A3: sum(a+b) drops rows where either addend is NULL; sum(a)+sum(b) does not") {
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (None, Some(20.0)),
      (Some(3.0), None)).toDF("a", "b")
    val r = df.agg(
      sum($"a" + $"b").as("sum_ab"),
      (sum($"a") + sum($"b")).as("sum_a_plus_b")).head()
    assert(r.getDouble(0) === 11.0)  // only the fully-non-NULL row
    assert(r.getDouble(1) === 34.0)
  }

  test("A9: HAVING max(x) < scalar silently drops all-NULL groups") {
    val facts = Seq((1, Some(5)), (2, None)).toDF("k", "x")
    val kept = facts.groupBy("k").agg(max($"x").as("m")).filter($"m" < 10)
    assert(kept.select("k").as[Int].collect().toSeq === Seq(1))
  }

  test("A5: round is HALF_UP (Postgres/DuckDB parity), bround is HALF_EVEN") {
    val df = Seq(2.5, 3.5, -2.5).toDF("x")
    assert(df.select(round($"x", 0)).as[Double].collect().toSeq === Seq(3.0, 4.0, -3.0))
    assert(df.select(bround($"x", 0)).as[Double].collect().toSeq === Seq(2.0, 4.0, -2.0))
  }

  test("P4: NaN is not NULL — normalize before comparisons") {
    val df = Seq(Double.NaN, 1.0).toDF("x")
    assert(df.filter($"x".isNotNull).count() === 2) // NaN survives isNotNull
    assert(df.filter(!isnan($"x")).count() === 1)
    val normalized = df.select(when(isnan($"x"), lit(null)).otherwise($"x").as("x"))
    assert(normalized.na.drop().count() === 1)
  }

  test("A1 approx variant: HLL++ count-distinct within 5% of exact per week") {
    val exact = SparkEntry.queries("a1_weekly_reporters")(spark, sf)
    val approx = SparkEntry.queries("a1b_weekly_reporters_approx")(spark, sf)
    // groups here are tiny (~4 customers/week): tolerate ±1 absolute or 5%
    val bad = exact.join(approx, "wk")
      .filter(abs($"n_customers_approx" - $"n_customers") >
        greatest(lit(1.0), $"n_customers" * 0.05))
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("A1b HLL++ error stays within the configured rsd at 10x cardinality") {
    // ScaleProbe's key-shifted 10x orders corpus: ~150k distinct
    // customers over sf0.1 — the cardinality regime where sketch error
    // actually bites (the per-week test above has ~4-customer groups).
    // approx_count_distinct's rsd is 0.02 (one standard deviation);
    // gate at 3x rsd, comfortably above noise, far below uselessness.
    val o = ScaleProbe.scaledOrders(spark, "/root/testdata/sf0.1", 10)
    val got = o.agg(
        countDistinct($"o_custkey").as("exact"),
        approx_count_distinct($"o_custkey", 0.02).as("approx"))
      .as[(Long, Long)].head()
    val (exact, approx) = got
    assert(exact > 50000L, s"corpus cardinality too small to test HLL: $exact")
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.06, s"HLL rel error $relErr exceeds 3x rsd (exact=$exact approx=$approx)")
  }

  test("decimal-exact sums are identical across partition counts") {
    val li = Tables.lineitem(spark, sf)
    val a = li.agg(Parity.dsum(col("l_extendedprice"))).head().getDouble(0)
    val b = li.repartition(23).agg(Parity.dsum(col("l_extendedprice"))).head().getDouble(0)
    assert(a === b)
  }

  test("V1's regex parse survives optimization as ONE extract per row") {
    // Inlining the parse into when(parsed.between(1,5), parsed) expands
    // to 6 regexp_extract calls per row in the optimized plan; the
    // hoisted projection keeps it at 1 because CollapseProject only
    // re-inlines cheap expressions. Guard the plan shape — a refactor
    // that re-inlines the alias sextuples the per-row regex cost.
    val plan = SparkEntry.queries("v1_rating_parse")(spark, sf)
      .queryExecution.optimizedPlan.toString()
    val n = "regexp_extract".r.findAllIn(plan).size
    assert(n === 1, s"v1 plans $n regexp_extract calls (want 1):\n$plan")
  }
}
