package graft

/** x120 sorted-neighborhood pairs: the oracle pins bit-exact parity;
  * these pin the WINDOW semantics — who gets compared — which the
  * hash-equality oracle can't distinguish from luck: adjacent dups are
  * found, pairs beyond the window are skipped (the documented SNM
  * recall tradeoff), blocks never leak comparisons across their
  * boundary, and candidates stay O(n·w). */
class SnmSpec extends SparkSuite {
  import spark.implicits._

  private def write(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, t) => (id, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("x120 crafted: adjacent duplicates found; beyond-window and cross-block pairs skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snm").toString
    write(dir, Seq(
      // identical docs — same block, tie-adjacent → found with jac 1.0
      1L -> "aaaa pad one two three four",
      2L -> "aaaa pad one two three four",
      // same 8-char block "cccc pad"; similar endpoints A/D forced
      // w(=3) apart by B/C → (A,D) has jac 6/8 but is NEVER compared
      // (the SNM recall tradeoff)
      10L -> "cccc pad a x y z w",
      11L -> "cccc pad b q r s t",
      12L -> "cccc pad c q r s u",
      13L -> "cccc pad d x y z w",
      // identical tails in DIFFERENT blocks → never compared
      20L -> "dddd tail alpha beta gamma",
      21L -> "eeee tail alpha beta gamma"))
    val got = ext.Snm.snmPairs.fn(spark, dir)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.get((1L, 2L)) === Some(1.0))
    assert(!got.contains((10L, 13L)), "beyond-window pair compared")
    assert(!got.contains((20L, 21L)), "cross-block pair compared")
    // B {cccc,pad,b,q,r,s,t} ∩ C {cccc,pad,c,q,r,s,u} = 5, union 9
    assert(got.get((11L, 12L)) === Some(5.0 / 9.0))
  }

  test("x123 multipass: reversed pass finds the prefix-divergent dup the forward pass misses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snm-mp").toString
    write(dir, Seq(
      // prefix-divergent, suffix-similar: different forward blocks, but
      // reversed texts share their prefix → adjacent in the R pass;
      // jac = |{common,tail,tokens,here}| / 6 = 2/3
      30L -> "xxx common tail tokens here",
      31L -> "yyy common tail tokens here",
      // padding docs in other blocks
      32L -> "zzz other stuff entirely",
      33L -> "www more filler words"))
    val fwd = ext.Snm.snmPairs.fn(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val multi = ext.Snm.snmMultipass.fn(spark, dir)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!fwd.contains((30L, 31L)), "fixture drift: forward pass found the pair")
    assert(multi.get((30L, 31L)) === Some(2.0 / 3.0))
  }

  test("x123 recall is a superset of x120 at identical scoring") {
    val fwd = ext.Snm.snmPairs.fn(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val multi = ext.Snm.snmMultipass.fn(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(fwd.subsetOf(multi))
  }

  test("x120 candidates are O(n*w): window pairs never exceed n*(w-1) on real data") {
    // count the raw candidate relation the query prunes from: bounded by
    // docs * (w-1) by construction — the linearity SNM exists for
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val found = ext.Snm.snmPairs.fn(spark, sf).count()
    assert(found <= n * 2, s"$found pairs from $n docs breaks the O(n*w) bound")
  }
}
