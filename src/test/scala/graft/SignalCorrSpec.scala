package graft

import org.apache.spark.sql.functions._

/** x191 signal-correlation panel: the oracle pins cross-engine equality;
  * this replays the whole Spearman computation from independently-fetched
  * signal frames in plain Scala (ranks, Σd², the closed form) and pins
  * the bit-exact match, plus the length-confound discovery the panel
  * exists to make on this corpus. */
class SignalCorrSpec extends SparkSuite {
  import spark.implicits._

  test("x191: pair axis, from-scratch Spearman replay, length confound visible") {
    val got = ext.SignalCorr.signalCorrelation.fn(spark, sf)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._1) === Seq("dsir_vs_heur", "dsir_vs_len", "dsir_vs_lm",
      "heur_vs_len", "heur_vs_lm", "len_vs_lm"))

    // independent signal fetches (the registered component queries /
    // shared frames), then a plain-Scala Spearman replay
    val lm = ext.Corpus.knScore.fn(spark, sf)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val ds = ext.Dsir.scored(spark, sf)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"),
        ext.Curation.qualityScore.as("heur"))
      .filter(col("len") >= 2)
      .as[(Long, Long, Double)].collect().toSeq
    val ids = base.map(_._1)
    assert(ids.toSet === lm.keySet && ids.toSet === ds.keySet,
      "the three signal universes coincide (≥2-token docs)")
    val n = ids.size.toLong
    assert(got.forall(_._2 === n))

    def rankOf(vs: Seq[(Long, Double)]): Map[Long, Long] =
      vs.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val r = Map(
      "len" -> rankOf(base.map(t => t._1 -> t._2.toDouble)),
      "heur" -> rankOf(base.map(t => t._1 -> t._3)),
      "lm" -> rankOf(ids.map(id => id -> lm(id))),
      "dsir" -> rankOf(ids.map(id => id -> ds(id))))
    got.foreach { case (pair, _, sumD2, rho) =>
      val Array(a, b) = pair.split("_vs_")
      val d2 = ids.map { id =>
        val d = BigInt(r(a)(id) - r(b)(id)); d * d
      }.sum
      assert(BigInt(sumD2) === d2, s"$pair sum_d2")
      val nD = n.toDouble
      val expect = 1.0 - 6.0 * sumD2.toDouble / (nD * (nD * nD - 1.0))
      assert(rho.contains(expect), s"$pair rho bit-exact")
      assert(rho.get >= -1.0 && rho.get <= 1.0 + 1e-12)
    }
    // the discovery this panel exists for: on this corpus the
    // distinct-token-ratio heuristic is (inversely) a length filter
    val hl = got.find(_._1 == "heur_vs_len").get._4.get
    assert(hl < -0.5, s"heur-vs-len confound should be strongly negative, got $hl")

    // ---- x191b: top-quartile keep-set overlap, replayed from the same
    // independently-computed ranks ----
    val ov = ext.SignalCorr.topOverlap.fn(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(ov.map(_._1) === got.map(_._1)) // same pair axis
    val k = (n + 3) / 4
    ov.foreach { case (pair, nd, quota, overlap, jaccard, lift) =>
      assert(nd === n && quota === k)
      val Array(a, b) = pair.split("_vs_")
      def keeps(sig: String) =
        ids.filter(id => r(sig)(id) > n - k).toSet
      val expect = (keeps(a) intersect keeps(b)).size.toLong
      assert(overlap === expect, s"$pair overlap")
      assert(overlap >= 0L && overlap <= k)
      assert(jaccard === overlap.toDouble / (2 * k - overlap))
      assert(lift === overlap.toDouble * n / (k * k))
    }
  }
}
