package graft

import org.apache.spark.sql.functions._

/** x154 deletion-neighborhood blocking (completeness for distance ≤ 1,
  * exactness of the verify filter, the hot-bucket guard) and x55 FastSS
  * label pairs (blocking recall theorem, all-pairs equality). */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  private def write(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    rows.toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  private def pairs(dir: String): Set[(String, String)] =
    ext.Fuzzy.edit1Blocking.fn(spark, dir)
      .select($"name_a", $"name_b").as[(String, String)].collect().toSet

  test("substitution, insertion, and deletion pairs are all found; distance-2 is not") {
    val got = pairs(write(Seq(
      (1L, "acme-corp"),   // vs 2: one substitution
      (2L, "acme-korp"),
      (3L, "acme-corps"),  // vs 1: one insertion
      (4L, "acme-cor"),    // vs 1: one deletion
      (5L, "acme-korps"),  // vs 1: distance 2 (sub + ins) — blocked out or filtered
      (6L, "zzz-unrelated"))))
    assert(got.contains(("acme-corp", "acme-korp")))
    assert(got.contains(("acme-corp", "acme-corps")))
    assert(got.contains(("acme-cor", "acme-corp")))
    assert(!got.exists { case (x, y) => Set(x, y) == Set("acme-corp", "acme-korps") })
    assert(!got.exists { case (x, y) => x.startsWith("zzz") || y.startsWith("zzz") })
    // transitivity is NOT implied: korp–korps is also distance 1
    assert(got.contains(("acme-korp", "acme-korps")))
  }

  test("hot-bucket guard: a degenerate shared key cannot go quadratic") {
    // 225 names = one non-'a' char inserted into "aaaaaaaa" (25 chars ×
    // 9 positions): every one of them carries the base string in its
    // deletion set, so the "aaaaaaaa" bucket holds 225 > MaxBucket
    // members — ~25k candidate pairs if it paired. The guard drops it;
    // the only keys that survive are the ≤9-member per-character
    // buckets, whose pairs (same char, different position) are all
    // distance 2 and fall to the exact filter. Output: just the one
    // genuine pair planted next to the blob.
    val blob = for (c <- 'B' to 'Z'; p <- 0 to 8) yield
      (s"$c$p".hashCode.toLong.abs,
        ("a" * p) + c + ("a" * (8 - p)))
    val dir = write(
      blob.zipWithIndex.map { case ((_, n), i) => (i.toLong, n) } ++
        Seq((900L, "stable-name"), (901L, "stable-nam")))
    val got = pairs(dir)
    assert(got === Set(("stable-nam", "stable-name")))
    // the guard's cost is CERTIFIED on the output: exactly one dropped
    // bucket (the "aaaaaaaa" key) carrying its 225 key-rows
    val guard = ext.Fuzzy.edit1Blocking.fn(spark, dir)
      .select($"guard_dropped_keys", $"guard_dropped_rows")
      .as[(Long, Long)].collect().toSet
    assert(guard === Set((1L, 225L)))
  }

  test("real data: every reported pair is exactly distance 1, deterministic order; guard idle") {
    val out = ext.Fuzzy.edit1Blocking.fn(spark, sf)
    // healthy identifier data: the guard drops nothing, and the
    // certificate says so
    val guard = out.select($"guard_dropped_keys", $"guard_dropped_rows")
      .distinct().as[(Long, Long)].collect().toSeq
    assert(guard === Seq((0L, 0L)))
    val rows = out
      .select($"name_a", $"name_b", $"key_a", $"key_b")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, _) =>
      assert(a < b)
      // recompute distance in-JVM: one edit apart exactly
      val d = { // standard DP, small strings
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      assert(d === 1, s"($a, $b) at distance $d")
    }
    assert(rows === rows.sortBy(r => (r._1, r._2)))
  }

  // ---- x55 (restored round 12 with the operator itself) ---------------

  test("x55 deletion variants: len+1 entries, self first") {
    val out = Seq("abc").toDF("s")
      .select(ext.Fuzzy.deletionVariants($"s").as("v"))
      .as[Seq[String]].collect()(0)
    assert(out === Seq("abc", "bc", "ac", "ab"))
  }

  test("x55 blocking recall: every edit-<=1 relation produces a candidate pair") {
    // equality is excluded by the name_a < name_b pair rule (distinct
    // labels), so cover: deletion, insertion, substitution — at the
    // start, middle, and end of the string — plus dist-2 decoys that
    // MAY appear as candidates but must die at the verify
    val labels = Seq(
      "widget", "idget", "wdget", "widge",      // deletions of widget
      "xwidget", "widgext",                     // insertions
      "yidget", "widgey",                       // substitutions
      "none-of-it", "totally-else").toDF("name")
    val cand = ext.Fuzzy.candidatePairs(labels, "name")
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
    val got = ext.Fuzzy.fuzzyNamePairs.fn(spark, sf)
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
