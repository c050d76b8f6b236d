package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** x45 BPE merge learning: the engine-semantics pin the whole design
  * rests on (literal replace = greedy merge), plus the algebraic
  * invariants of the merge sequence. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("literal replace implements greedy left-to-right BPE merge") {
    // consecutive merge sites share no characters in the bracket-wrapped
    // representation, so non-overlapping replace merges them ALL —
    // and overlapping self-pairs merge greedily (aaa → (aa)a).
    val rows = Seq(
      ("[a][b][a][b]", "[a][b]", "[ab]", "[ab][ab]"),
      ("[a][a][a]", "[a][a]", "[aa]", "[aa][a]"),
      ("[x][a][b][y]", "[a][b]", "[ab]", "[x][ab][y]"),
      ("[ab][a][b]", "[a][b]", "[ab]", "[ab][ab]"), // pre-existing equal symbol untouched
      ("[q][r]", "[a][b]", "[ab]", "[q][r]"))
    rows.foreach { case (src, pat, rep, want) =>
      val got = Seq(src).toDF("s")
        .select(replace($"s", lit(pat), lit(rep)).as("r")).as[String].head()
      assert(got == want, s"replace($src, $pat, $rep)")
    }
  }

  test("x45: merge counts are monotonically non-increasing across rounds") {
    // a new pair created by merge r occurs at most as often as the merged
    // symbol itself, and existing pair counts never grow — so the chosen
    // max cannot rise. (Breaking this means the pair recount is wrong.)
    val m = Bpe.bpeMerges.fn(spark, sf).orderBy($"round").collect()
    assert(m.length == 8)
    m.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("pair_count") <= a.getAs[Long]("pair_count"))
    }
  }

  test("x45: round-1 merge is the true argmax of corpus adjacent char pairs") {
    val docs = Tables.documents(spark, sf)
    val chars = docs.select(explode(split($"text", " ")).as("w"))
      .select(split($"w", "").as("c"))
      .filter(size($"c") > 1)
      .select(explode(transform(sequence(lit(1), size($"c") - 1),
        i => struct(element_at($"c", i).as("a"), element_at($"c", i + 1).as("b")))).as("p"))
      .groupBy($"p.a", $"p.b").count()
      .orderBy($"count".desc, $"a", $"b").limit(1).head()
    val r1 = Bpe.bpeMerges.fn(spark, sf).filter($"round" === 1).head()
    assert(r1.getAs[String]("left_sym") == chars.getAs[String]("a"))
    assert(r1.getAs[String]("right_sym") == chars.getAs[String]("b"))
    assert(r1.getAs[Long]("pair_count") == chars.getAs[Long]("count"))
  }

  test("x45b: subword counts sit between word count and char count, every doc") {
    // merging only ever SHRINKS a word's segmentation, and a word is at
    // least one subword — so n_words ≤ n_subwords ≤ non-space chars.
    val enc = graft.ext.Bpe.bpeEncode.fn(spark, sf)
    val chars = Tables.documents(spark, sf).select($"doc_id",
      aggregate(transform(split($"text", " "), w => length(w)),
        lit(0), (acc, x) => acc + x).cast("long").as("n_chars_nospace"))
    val bad = enc.join(chars, "doc_id")
      .filter($"n_subwords" < $"n_words" || $"n_subwords" > $"n_chars_nospace")
    assert(bad.isEmpty)
    // and the learned merges actually compress: corpus-wide fertility
    // strictly below the char-level baseline
    val Row2 = enc.agg(sum($"n_subwords"), sum($"n_words")).head()
    assert(Row2.getLong(0) < chars.agg(sum($"n_chars_nospace")).head().getLong(0))
    assert(Row2.getLong(0) >= Row2.getLong(1))
  }

  test("x45: later rounds can consume earlier merged symbols (true recurrence)") {
    // the learned table must be usable as a SEQUENTIAL program: every
    // symbol referenced in round r is either a single char or the
    // product of some earlier round — i.e. the table is well-founded.
    val m = Bpe.bpeMerges.fn(spark, sf).orderBy($"round").collect()
    val produced = scala.collection.mutable.Set.empty[String]
    m.foreach { r =>
      Seq(r.getAs[String]("left_sym"), r.getAs[String]("right_sym")).foreach { s =>
        assert(s.length == 1 || produced.contains(s),
          s"round ${r.getAs[Int]("round")}: symbol '$s' has no producer")
      }
      produced += r.getAs[String]("left_sym") + r.getAs[String]("right_sym")
    }
  }

  test("x178: per-lang fertility grid is an exact partition of the x45b per-doc encode") {
    // same tokenizer, same corpus — the lang rollup must sum to the
    // per-doc table exactly, and each ratio must respect the subword
    // bounds (1 ≤ fertility, 1 ≤ chars_per_subword, and their product
    // is that lang's mean word length).
    val byLang = graft.ext.Bpe.fertilityByLang.fn(spark, sf).collect()
    val enc = graft.ext.Bpe.bpeEncode.fn(spark, sf)
      .agg(sum($"n_words"), sum($"n_subwords")).head()
    assert(byLang.map(_.getAs[Long]("n_words")).sum == enc.getLong(0))
    assert(byLang.map(_.getAs[Long]("n_subwords")).sum == enc.getLong(1))
    assert(byLang.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    byLang.foreach { r =>
      val fert = r.getAs[Double]("fertility")
      val cps = r.getAs[Double]("chars_per_subword")
      assert(fert >= 1.0 && cps >= 1.0)
      assert(math.abs(fert * cps -
        r.getAs[Long]("n_chars").toDouble / r.getAs[Long]("n_words")) < 1e-9)
    }
  }
}
