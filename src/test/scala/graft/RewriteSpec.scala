package graft

import graft.ext.{Rewrite, Sampling}
import org.apache.spark.sql.functions._

/** x43 block-dedup rewrite + x44 temperature resampling: semantic
  * invariants beyond the DuckDB hash (which pins the values but not the
  * properties that make the operators correct BY CONSTRUCTION). */
class RewriteSpec extends SparkSuite {
  import spark.implicits._

  test("x43: every distinct block content survives exactly once, corpus-wide") {
    // keep-first means the rewritten corpus is a PARTITION of the
    // distinct block space: sum(kept) == |distinct blocks|, and no
    // distinct content is lost.
    val out = Rewrite.blockDedup.fn(spark, sf).cache()
    val keptTotal = out.agg(sum($"kept_blocks")).as[Long].head()
    val docs = Tables.documents(spark, sf)
    val toks = split($"text", " ")
    val distinctBlocks = docs
      .select(explode(transform(
        sequence(lit(0), floor((size(toks) - 1) / lit(10)).cast("int")),
        i => array_join(slice(toks, i * 10 + 1, lit(10)), " "))).as("b"))
      .distinct().count()
    assert(keptTotal == distinctBlocks)
    // and every doc's kept count is bounded by its block count
    assert(out.filter($"kept_blocks" > $"n_blocks").isEmpty)
    out.unpersist()
  }

  test("x43: an exact duplicate document is gutted; the original is untouched") {
    val base = Tables.documents(spark, sf).filter($"doc_id" < 50)
    // doc 9000 is a verbatim copy of doc 7; block-level keep-first must
    // keep doc 7 whole and leave the copy with zero kept blocks.
    val dupText = base.filter($"doc_id" === 7).select($"text").as[String].head()
    val withDup = base.select($"doc_id", $"text")
      .union(Seq((9000L, dupText)).toDF("doc_id", "text"))
    val out = rewriteOf(withDup).cache()
    val orig = out.filter($"doc_id" === 7).head()
    val copy = out.filter($"doc_id" === 9000).head()
    assert(orig.getAs[Long]("kept_blocks") == orig.getAs[Long]("n_blocks"))
    assert(orig.getAs[String]("new_text") == dupText)
    assert(copy.getAs[Long]("kept_blocks") == 0L && copy.getAs[String]("new_text") == "")
    out.unpersist()
  }

  test("x43: rewrite is idempotent — a second pass changes nothing") {
    // after the rewrite every surviving block content occurs exactly
    // once, so re-running the dedup on the rewritten corpus must keep
    // every block of every non-empty doc.
    val first = rewriteOf(
      Tables.documents(spark, sf).filter($"doc_id" < 100).select($"doc_id", $"text"))
    val second = rewriteOf(
      first.filter($"new_text" =!= "").select($"doc_id", $"new_text".as("text"))).cache()
    assert(second.filter($"kept_blocks" =!= $"n_blocks").isEmpty)
    second.unpersist()
  }

  private def rewriteOf(docs: org.apache.spark.sql.DataFrame) =
    graft.ext.Rewrite.pipeline(docs)

  test("x44: smallest language keeps rate 1.0 and survives whole") {
    val out = Sampling.langTemperature.fn(spark, sf).cache()
    val counts = Tables.documents(spark, sf).groupBy($"lang").count()
    val minLang = counts.orderBy($"count", $"lang").select($"lang").as[String].head()
    val minRows = out.filter($"lang" === minLang)
    assert(minRows.agg(min($"rate")).as[Double].head() == 1.0)
    assert(minRows.filter(!$"kept").isEmpty)
    out.unpersist()
  }

  test("x44: kept counts equalize toward sqrt — ordering preserved, spread compressed") {
    val out = Sampling.langTemperature.fn(spark, sf).cache()
    val before = Tables.documents(spark, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val after = out.filter($"kept").groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    // expected kept ≈ n_l · sqrt(n_min/n_l) = sqrt(n_min · n_l); the
    // Knuth-hash uniform is equidistributed enough at 500 docs for a
    // ±30% tolerance band per language.
    val nMin = before.values.min
    before.foreach { case (l, n) =>
      val expected = math.sqrt(nMin.toDouble * n)
      val got = after.getOrElse(l, 0L).toDouble
      assert(math.abs(got - expected) <= 0.3 * expected + 3,
        s"$l: kept $got, expected ~$expected of $n")
    }
    // temperature compresses the ratio between largest and smallest
    val ratioBefore = before.values.max.toDouble / nMin
    val ratioAfter = after.values.max.toDouble / after.values.min
    assert(ratioAfter < ratioBefore)
    out.unpersist()
  }
}
