package graft

import org.apache.spark.sql.functions._

/** x193 SoftDeDup reweighting: the oracle pins cross-engine equality;
  * this replays the whole computation (trigram counts, per-doc exact
  * integer sums, the min-anchored weight) from the raw corpus in plain
  * Scala and pins the bit-exact match plus the structural laws of a
  * soft-dedup weighting. */
class SoftDedupSpec extends SparkSuite {
  import spark.implicits._

  test("x193: from-scratch replay, weights in (0,1] anchored at the rarest doc") {
    val got = ext.SoftDedup.softDedup.fn(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq

    // independent replay from the raw corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .as[(Long, Seq[String])].collect().toSeq
      .filter(_._2.size >= 3)
    val gramsOf = docs.map { case (id, ts) =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSeq
    }.toMap
    val counts = gramsOf.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(_._1).toSet === gramsOf.keySet, "universe = docs with >=3 tokens")

    val commonness = gramsOf.map { case (id, gs) =>
      id -> (gs.map(counts).sum.toDouble / gs.size)
    }
    val cmin = commonness.values.min
    got.foreach { case (id, nGrams, sumC, comm, weight) =>
      assert(nGrams === gramsOf(id).size.toLong)
      assert(sumC === gramsOf(id).map(counts).sum)
      assert(comm === sumC.toDouble / nGrams) // bit-exact: same expression
      assert(weight === cmin / comm)          // bit-exact: same expression
      assert(weight > 0.0 && weight <= 1.0)
      // a doc's own occurrences are included: commonness >= 1
      assert(comm >= 1.0)
    }
    // the rarest document keeps full weight exactly
    assert(got.map(_._5).max === 1.0)
    // monotone: higher commonness never gets a higher weight
    val byComm = got.sortBy(_._4)
    assert(byComm.map(_._5).toSeq === byComm.map(_._5).sortBy(-_).toSeq)
  }
}
