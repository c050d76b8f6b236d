package graft

import graft.ext.Fuzzy
import org.apache.spark.sql.functions._

/** x55 fuzzy join: the oracle pins the all-pairs semantics; this pins
  * the BLOCKING theorem the plan rests on — deletion-variant candidate
  * generation never misses a distance-≤1 pair (each of the four edit
  * cases exercised explicitly), and the variant table has the promised
  * len+1 shape. */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  test("deletion variants: len+1 entries, self first") {
    val out = Seq("abc").toDF("s")
      .select(Fuzzy.deletionVariants($"s").as("v"))
      .as[Seq[String]].collect()(0)
    assert(out === Seq("abc", "bc", "ac", "ab"))
  }

  test("blocking recall: every edit-≤1 relation produces a candidate pair") {
    // equality is excluded by the name_a < name_b pair rule (distinct
    // labels), so cover: deletion, insertion, substitution — at the
    // start, middle, and end of the string — plus dist-2 decoys that
    // MAY appear as candidates but must die at the verify
    val labels = Seq(
      "widget", "idget", "wdget", "widge",      // deletions of widget
      "xwidget", "widgext",                     // insertions
      "yidget", "widgey",                       // substitutions
      "none-of-it", "totally-else").toDF("name")
    val cand = Fuzzy.candidatePairs(labels, "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = labels.as("a").crossJoin(labels.as("b"))
      .filter(col("a.name") < col("b.name") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.name"), col("b.name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(naive.nonEmpty && naive.subsetOf(cand),
      s"blocking missed pairs: ${naive -- cand}")
  }

  test("x55 equals the naive all-pairs result on the real table") {
    val got = Fuzzy.fuzzyNamePairs.fn(spark, sf)
      .select($"name_a", $"name_b", $"dist").collect().toSeq
    val names = Tables.part(spark, sf).select($"p_name").distinct()
    val want = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.p_name") < col("b.p_name") &&
        levenshtein(col("a.p_name"), col("b.p_name")) <= 1)
      .select(col("a.p_name"), col("b.p_name"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long"))
      .orderBy(col("a.p_name"), col("b.p_name"))
      .collect().toSeq
    assert(got === want)
    assert(got.nonEmpty, "testdata plants cold/old pairs; result must not be empty")
  }
}
