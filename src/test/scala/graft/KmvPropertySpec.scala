package graft

import graft.ext.Kmv
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based properties for the bounded distinct-min-k aggregator —
  * the state type every KMV surface (x66, KmvFeed batch, KmvFeed
  * streaming) shares. The oracle pins one dataset; these pin the
  * ALGEBRA over arbitrary ones: the aggregator must be a homomorphism
  * from multisets onto sorted distinct min-k sets, under ANY split and
  * ANY merge order — which is exactly what makes map-side partials,
  * micro-batch increments, and shuffle nondeterminism invisible. */
class KmvPropertySpec extends SparkSuite {

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(1234L + i)))

  // Small value domain → many duplicates, the regime that breaks a
  // non-deduping heap; occasional wide values exercise ordering.
  private val valsGen: Gen[List[Long]] =
    Gen.choose(0, 120).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.choose(0L, 30L), Gen.choose(0L, 1000000L))))

  private def model(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("property: reduce over any input equals distinct-sorted-take-k") {
    for (k <- Seq(1, 4, 32); xs <- samples(valsGen, 40)) {
      val agg = new Kmv.BoundedDistinctMinK(k)
      val got = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      assert(got === model(xs, k), s"k=$k xs=${xs.take(12)}...")
    }
  }

  test("property: any split point + either merge order gives the unsplit result") {
    for (xs <- samples(valsGen, 40); if xs.nonEmpty) {
      val k = 8
      val agg = new Kmv.BoundedDistinctMinK(k)
      val cut = math.abs(xs.head.toInt) % xs.length
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      val whole = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      assert(agg.merge(bl, br).toSeq === whole)
      assert(agg.merge(br, bl).toSeq === whole)
    }
  }

  test("property: merge is idempotent on saturated buffers (re-delivery safe)") {
    for (xs <- samples(valsGen, 25)) {
      val agg = new Kmv.BoundedDistinctMinK(8)
      val b = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(b, b).toSeq === b.toSeq)
    }
  }

  test("property: estimate is within 3x of the true distinct count at n >= 4k") {
    // The Knuth hash spreads ids ~uniformly over [0, P); for n ≥ 4k the
    // (k-1)/h_k estimator should land within a loose factor — this is a
    // sanity envelope for the statistic, not a tail bound.
    val agg = new Kmv.BoundedDistinctMinK(32)
    for (seed <- 1 to 10) {
      val n = 200 + seed * 100
      val ids = (1 to n).map(i => (i.toLong * 7919 + seed * 1000003L))
      val hs = ids.map(u => ((u % Kmv.P) * Kmv.Kn) % Kmv.P)
      val b = hs.foldLeft(agg.zero)(agg.reduce)
      val Some((_, est)) = Kmv.estimate(b): @unchecked
      val trueN = hs.distinct.size
      assert(est > trueN / 3 && est < trueN * 3L,
        s"estimate $est implausible for true $trueN (seed $seed)")
    }
  }
}
