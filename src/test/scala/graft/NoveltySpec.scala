package graft

/** x71/x72 gram analysis: oracles replay the real corpus; these pin the
  * semantics on hand-countable documents — ownership by lowest doc_id,
  * the gramless-doc NULL contract, duplicate grams inside one doc
  * counting once, and the overlap matrix's Jaccard arithmetic. */
class NoveltySpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("x71: lowest doc owns shared grams; gramless docs emit NULL novelty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novel").toString
    write(dir, Seq(
      (1L, "a b c d", "s1"),   // grams: "a b c", "b c d" - owns both
      (2L, "a b c x", "s1"),   // grams: "a b c" (doc 1's), "b c x" (novel)
      (3L, "a b", "s1"),       // < 3 tokens: no grams
      (4L, "q q q q", "s1")))  // "q q q" twice - distinct counts ONCE, owned
    val got = ext.Novelty.gramNovelty.fn(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 2L, Some(1.0))))
    assert(got(2L) === ((2L, 1L, Some(0.5))))
    assert(got(3L) === ((0L, 0L, None)))
    assert(got(4L) === ((1L, 1L, Some(1.0))))
  }

  test("x72: shared counts and Jaccard on a hand-built two-source corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novel2").toString
    write(dir, Seq(
      (1L, "a b c d", "A"),  // A grams: {a b c, b c d}
      (2L, "a b c", "B"),    // B grams: {a b c}
      (3L, "z z z z", "C"))) // C grams: {z z z} - overlaps nobody
    val got = ext.Novelty.sourceOverlap.fn(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only the (A, B) pair overlaps; zero-overlap pairs are absent
    assert(got === Seq(("A", "B", 1L, 2L, 1L, 0.5)))
  }

  test("x164: weighted Jaccard on hand-counted token masses; duplicates score 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ruz").toString
    write(dir, Seq(
      (1L, "a a b", "p"),     // p: a=2, b=1, tot 3
      (2L, "a b b b", "q"),   // q: a=1, b=3, tot 4 — min-sum 2 → 2/(3+4−2)
      (3L, "a a b", "r"),     // exact copy of p → J_w(p, r) = 1
      (4L, "z z", "s")))      // disjoint — its pairs are absent
    val got = ext.Novelty.ruzickaSources.fn(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet === Set(("p", "q"), ("p", "r"), ("q", "r")))
    assert(got(("p", "q")) === (("p", "q", 2L, 3L, 4L, 0.4)))
    assert(got(("p", "r")) === (("p", "r", 3L, 3L, 3L, 1.0)))
    assert(got(("q", "r")) === (("q", "r", 2L, 4L, 3L, 0.4)))
  }

  test("x164 real data: bounds vs the totals, full pair coverage on this corpus") {
    val got = ext.Novelty.ruzickaSources.fn(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got.size === 190) // C(20,2): every source pair shares a token here
    got.foreach { case (a, b, mn, ta, tb, jw) =>
      assert(a < b)
      assert(mn >= 1L && mn <= math.min(ta, tb))
      assert(jw === mn.toDouble / (ta + tb - mn))
      assert(jw > 0.0 && jw <= 1.0)
    }
  }
}
