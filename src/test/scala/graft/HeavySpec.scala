package graft

import graft.ext.Heavy
import org.apache.spark.sql.functions._

/** x54 heavy hitters: the oracle pins the exact end result; this pins
  * the SKETCH layer — the Space-Saving retention bound on adversarial
  * streams, the per-partition superset guarantee under hostile
  * partitionings (the property the two-pass exactness rests on), and
  * end-to-end equality with the naive groupBy at several parallelisms. */
class HeavySpec extends SparkSuite {
  import spark.implicits._

  test("SpaceSaving retains every token above the 1/(k+1) bound (adversarial stream)") {
    // 3 heavy tokens drowned in 5000 distinct singletons, heavies LAST —
    // the order that maximizes evictions before the heavies arrive
    val stream = (1 to 5000).map(i => s"noise$i") ++
      Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma")
    val ss = new Heavy.SpaceSaving(100)
    stream.foreach(ss.offer)
    val kept = ss.tokens.toSet
    // n = 5900; bound n/(k+1) = 58.4 — all three heavies must survive
    assert(Set("alpha", "beta", "gamma").subsetOf(kept), s"lost a heavy: $kept")
  }

  test("SpaceSaving never exceeds k counters") {
    val ss = new Heavy.SpaceSaving(10)
    (1 to 10000).foreach(i => ss.offer(s"t${i % 500}"))
    assert(ss.tokens.size <= 10)
  }

  test("candidates ⊇ exact heavy hitters under hostile partitionings") {
    // heavy tokens concentrated in ONE partition each (the worst case for
    // a per-partition summary is actually the easiest; the hard case is
    // heavies SPREAD THIN — both are exercised via hash repartitioning)
    val rows = (Seq.fill(3000)("hot1") ++ Seq.fill(2000)("hot2") ++
      (1 to 100000).map(i => s"cold${i % 40000}")).toDF("tk")
    val total = rows.count()
    val exact = rows.groupBy($"tk").count()
      .filter($"count" * Heavy.Denom >= total)
      .select($"tk").as[String].collect().toSet
    assert(exact === Set("hot1", "hot2")) // sanity: the plant worked
    for (parts <- Seq(1, 7, 32)) {
      val cand = Heavy.candidates(rows.repartition(parts, $"tk"), Heavy.K)
        .as[String].collect().toSet
      assert(exact.subsetOf(cand), s"superset guarantee broke at $parts partitions")
      val candRR = Heavy.candidates(rows.repartition(parts), Heavy.K)
        .as[String].collect().toSet
      assert(exact.subsetOf(candRR), s"superset guarantee broke at $parts round-robin")
    }
  }

  test("x54 equals the naive groupBy exactly, at several parallelisms") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tk"))
    val total = toks.count()
    val naive = toks.groupBy($"tk").count()
      .filter($"count" * Heavy.Denom >= total)
      .select($"tk".as("token"), $"count".as("n"))
      .orderBy($"token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (parts <- Seq(2, 13)) {
      val got = Heavy.heavyHitters(toks.repartition(parts))
        .select($"token", $"n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === naive, s"sketch-fronted result diverged at $parts partitions")
    }
    assert(naive.nonEmpty, "corpus should have ≥1 heavy token (stopwords)")
  }
}
