package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based properties for the snapshot reconciliation family: the
  * engine's full-outer classification must agree with a plain-Scala map
  * diff on arbitrary generated snapshots (nulls included), and the
  * checksum must be a function of the ROW SET alone. */
class DiffPropertySpec extends SparkSuite {
  import spark.implicits._
  import graft.etl.Diff

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(4242L + i)))

  // Small key domain → plenty of key overlap; Option values exercise
  // the null-safe comparison on both sides.
  private val rowGen: Gen[(Long, Option[String], Option[Long])] = for {
    k <- Gen.choose(0L, 15L)
    s <- Gen.option(Gen.oneOf("a", "b", "c"))
    v <- Gen.option(Gen.choose(0L, 3L))
  } yield (k, s, v)

  private val snapGen: Gen[Map[Long, (Option[String], Option[Long])]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, rowGen))
      .map(_.map(r => r._1 -> ((r._2, r._3))).toMap) // last write per key wins

  private def model(old: Map[Long, (Option[String], Option[Long])],
      nw: Map[Long, (Option[String], Option[Long])]): Map[Long, String] =
    (old.keySet ++ nw.keySet).map { k =>
      k -> ((old.get(k), nw.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap

  test("property: engine diff equals the map-model diff on arbitrary snapshots") {
    for (pair <- samples(Gen.zip(snapGen, snapGen), 25)) {
      val (o, n) = pair
      def df(m: Map[Long, (Option[String], Option[Long])]) =
        m.toSeq.map { case (k, (s, v)) => (k, s, v) }.toDF("k", "s", "v")
      val got = Diff.snapshotDiff(df(o), df(n), Seq("k"))
        .as[(Long, String)].collect().toMap
      assert(got === model(o, n), s"old=$o new=$n")
    }
  }
}
