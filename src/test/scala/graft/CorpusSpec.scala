package graft

import org.apache.spark.sql.functions._

/** Semantic invariants + plan-shape audits for the corpus-prep operators
  * (ext/Corpus.scala: x34-x38). Cross-engine value equality is carried by
  * the DuckDB oracles; these tests pin the properties an oracle diff
  * would not localize — chunk geometry, rank-fusion monotonicity,
  * vocabulary density, and the scale-critical plan shapes. */
class CorpusSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x35 chunks tile each document: strides cover, sizes clamp, text reassembles") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val chunks = q("x35_chunk_sliding")
    // Per doc: starts are 0, 48, 96…; every start < n_tokens; the last
    // chunk is the only one allowed to be short; interior chunks are 64.
    val joined = chunks.join(docs, "doc_id")
      .select(col("doc_id"), col("chunk_start"), col("n_chunk_tokens"),
        col("chunk_text"), size(col("toks")).as("n"))
      .collect()
    joined.foreach { r =>
      val (start, len, n) = (r.getLong(1), r.getLong(2), r.getInt(4).toLong)
      assert(start % 48 == 0 && start < n, s"bad start $start for n=$n")
      assert(len == math.min(64L, n - start), "chunk length must clamp at the tail")
      assert(r.getString(3).split(" ", -1).length.toLong == len,
        "chunk_text token count must equal n_chunk_tokens")
    }
    // Full coverage: per doc, sum of non-overlapped stride widths == n.
    val perDoc = joined.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    perDoc.foreach { case (id, starts) =>
      assert(starts.head == 0L, s"doc $id first chunk must start at 0")
      starts.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1) - w(0) == 48L, s"doc $id has a stride gap")
      }
    }
  }

  test("x34 RRF: doc ranked first by both systems wins; scores bounded by 2/(k+1)") {
    val fused = q("x34_rrf_fusion").collect()
    val maxPossible = 2.0 / 61.0
    assert(fused.forall(r => r.getDouble(2) <= maxPossible + 1e-15))
    // Top fused doc per query must appear in both systems' pools with
    // rank sums no worse than any competitor (RRF monotonicity spot
    // check: its score ≥ every other fused score in the query).
    fused.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val scores = rows.map(_.getDouble(2))
      assert(scores.sorted.reverse.sameElements(scores),
        "results must be ordered by rrf desc within each query")
    }
  }

  test("x34 plans through the bounded-heap TopKPerKey node, not a full-rank window") {
    val plan = q("x34_rrf_fusion").queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKey"), s"x34 lost its bounded-heap truncation:\n$plan")
  }

  test("x35 is shuffle-free: a pure map+explode plan") {
    // The ORDER BY for the determinism contract plans a range exchange;
    // nothing else may shuffle (the chunking itself is per-row).
    val chunkOnly = q("x35_chunk_sliding").queryExecution.executedPlan
    val exchanges = flattenPlan(chunkOnly)
      .count(_.getClass.getSimpleName.startsWith("ShuffleExchange"))
    assert(exchanges <= 1, s"x35 must shuffle only for the final sort, saw $exchanges")
  }

  test("x36 vocabulary ids are dense 1..k and ordered by (cnt desc, token)") {
    val v = q("x36_vocab_build").collect()
    assert(v.map(_.getLong(0)).sameElements(1L to v.length.toLong))
    val order = v.map(r => (-r.getLong(2), r.getString(1))).toSeq
    assert(order == order.sorted, "ids must follow the frequency total order")
  }

  test("x37 bigram construction matches a hand computation on a tiny frame") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a b c"), (2L, "a"), (3L, "b c")).toDF("doc_id", "text")
    val t = split(col("text"), " ")
    val pairs = filter(
      zip_with(t, slice(t, lit(2), size(t)), (a, b) => concat(a, lit(" "), b)),
      p => p.isNotNull)
    val got = tiny.select(explode(pairs).as("bigram"))
      .groupBy("bigram").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b" -> 2L, "b a" -> 1L, "b c" -> 2L),
      s"bigram zip construction broke: $got (single-token docs must emit none)")
  }

  test("x38 oov accounting: rate in [0,1], n_oov ≤ n_tokens, vocab hits never counted") {
    val rows = q("x38_oov_rate").collect()
    rows.foreach { r =>
      val (n, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-15)
    }
    // Cross-check total OOV mass against an independent computation.
    val docs = Tables.documents(spark, sf)
    val vocabToks = q("x36_vocab_build").select(col("token")).collect().map(_.getString(0)).toSet
    val totalOov = docs.select(explode(split(col("text"), " ")).as("t"))
      .collect().count(r => !vocabToks.contains(r.getString(0)))
    assert(rows.map(_.getLong(2)).sum == totalOov.toLong)
  }

  test("x38 joins the vocabulary broadcast (map-side), never shuffling the token stream by token") {
    val plan = q("x38_oov_rate").queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"x38 vocab join must broadcast:\n$plan")
  }

  test("x40 LM score matches an add-one-smoothing hand computation on a tiny corpus") {
    import spark.implicits._
    // corpus: "a b a" + "a b" → c12 = {(a,b):2, (b,a):1}, c1 = {a:2, b:1},
    // V = 2. P(b|a) = 3/4, P(a|b) = 2/3.
    val dir = java.nio.file.Files.createTempDirectory("x40tiny").toString
    Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x40_bigram_lm_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L, s"bigram counts wrong: $got")
    assert(got(1L)._2 == (3.0 / 4 + 2.0 / 3) / 2, "doc 1 mean of P(b|a), P(a|b)")
    assert(got(2L)._2 == 3.0 / 4, "doc 2 is the single bigram P(b|a)")
  }

  test("x172 KN: continuation counts rank versatile words above context-bound ones where add-one ties") {
    import spark.implicits._
    // "fran" occurs 4 times, always after "san" (the classic Francisco
    // shape); "multi" occurs 4 times after 4 DIFFERENT predecessors.
    // Probe docs "z fran" / "z multi" each contribute one bigram with
    // identical raw counts (c12 = 1, c1(z) = 2, n1v(z) = 2), so x40's
    // add-one scores TIE — but KN's continuation term sees
    // N1+(. multi) = 5 contexts vs N1+(. fran) = 2 and must rank the
    // versatile word strictly higher.
    val dir = java.nio.file.Files.createTempDirectory("x172kn").toString
    Seq(
      (1L, "san fran san fran san fran san fran"),
      (2L, "p1 multi p2 multi p3 multi p4 multi"),
      (10L, "z fran"), (11L, "z multi")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    def scores(name: String): Map[Long, Double] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val kn = scores("x172_kneser_ney_score")
    val addOne = scores("x40_bigram_lm_score")
    assert(addOne(10L) === addOne(11L), "add-one cannot tell the probes apart")
    assert(kn(11L) > kn(10L),
      s"KN must score the 5-context word above the 2-context one: $kn")
    // the discounted term is exact: every probability is a finite sum of
    // quarter-unit divisions, so both probe scores are strictly positive
    assert(kn(10L) > 0.0 && kn(11L) > 0.0)
  }

  test("x40 forces no broadcast of the LM count tables (only the 1-row vocab scalar is hinted)") {
    // The bigram/unigram count tables scale with the corpus; whether to
    // broadcast them is AQE's call from runtime stats, never a hint. The
    // one explicit hint must be the 1-row vocab-size aggregate.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    val hints = q("x40_bigram_lm_score").queryExecution.analyzed
      .collect { case h: ResolvedHint => h }
    assert(hints.size == 1, s"exactly one explicit hint expected, got ${hints.size}")
    assert(hints.head.child.collectFirst { case a: Aggregate => a }.nonEmpty,
      "the hinted subtree must be the bounded 1-row vocab aggregate")
  }

  test("x87 phrase counts: overlaps counted, adjacency required, short docs safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    Seq(
      (1L, "the table the table sits"),   // two non-overlapping occurrences
      (2L, "the the the"),                // "the the" overlaps: sliding count 2 — but phrase is "the table": 0
      (3L, "the big table"),              // non-adjacent: 0
      (4L, "table the table"),            // one occurrence (positions 2-3)
      (5L, "the"),                        // 1 token: the sequence() guard path
      (6L, "the table"))                  // exactly the phrase
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.Search.phraseSearch.fn(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 4L -> 1L, 6L -> 1L))
  }

  test("x89 lift separates a true collocation from a frequent-but-independent pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-colloc").toString
    // "new york" always adjacent (fully bound); "and" is followed by
    // "the" in only HALF its occurrences (template B follows it with
    // "new") — a half-associated pair must get half the lift. 12 docs
    // per template clears MinSupport=10.
    val docs = (0 until 12).flatMap { i =>
      Seq((i.toLong * 2, "new york is big and the cat sat"),
        (i.toLong * 2 + 1, "the dog is old and new york sat"))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.Corpus.collocations.fn(spark, dir)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val ny = got(("new", "york"))
    // 24 docs × 8 tokens = 192 unigrams, ×7 = 168 bigrams; "new"/"york"/
    // "new york" each 24 → lift = (24/168) / ((24/192)(24/192)) = 64/7
    assert(ny._1 === 24L)
    assert(math.abs(ny._2 - (24.0 / 168) / ((24.0 / 192) * (24.0 / 192))) < 1e-12)
    val andThe = got(("and", "the"))
    assert(andThe._1 === 12L)
    // exactly half the binding → exactly half the lift
    assert(math.abs(ny._2 - 2.0 * andThe._2) < 1e-12)
  }

  test("x87 overlapping occurrences use the sliding window (crafted aaa case)") {
    import spark.implicits._
    // with phrase "the table" overlaps can't occur (distinct tokens);
    // prove the SLIDING semantics on the machinery itself: "t t t" has
    // two sliding "t t" bigrams — count via the same transform+filter
    val df = Seq(("t t t")).toDF("text").select(split($"text", " ").as("t"))
      .select(size(filter(
        expr("transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"),
        g => g === lit("t t"))).as("n"))
    assert(df.as[Int].head() === 2)
  }

  test("x132 crafted: Zipf toy corpus gives the hand-computed coverage staircase") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-x132").toString
    // occurrences: a×4, b×2, c×1 → total 7; top-1 = 4/7, top-2 = 6/7,
    // top-k≥4 (vocab exhausted at 3) = 7/7
    Seq((1L, "a a a a", "en", "s", 7L), (2L, "b b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.Corpus.vocabCoverage.fn(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.take(3) === Seq(
      (1L, 1L, 4L, 4.0 / 7.0), (2L, 2L, 6L, 6.0 / 7.0), (4L, 3L, 7L, 1.0)))
    // every later checkpoint stays saturated at full coverage
    assert(got.drop(2).forall(r => r._2 == 3L && r._4 == 1.0))
  }

  test("x132 real corpus: coverage is monotone and saturates iff vocab fits the checkpoint") {
    import spark.implicits._
    val got = ext.Corpus.vocabCoverage.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._4) === got.map(_._4).sorted)
    assert(got.forall(r => r._2 <= r._1))
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    got.foreach { case (k, covered, _, cov) =>
      if (k >= vocab) { assert(covered === vocab); assert(cov === 1.0) }
    }
  }

  test("x162 crafted: hand-counted Good-Turing mass and Chao1; N2=0 gives NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gt").toString
    Seq(
      // aa: counts a=2, b=2, c=1 → N=5 V=3 N1=1 N2=2 → 0.2, 3 + 1/4
      (1L, "a a b", "aa"), (2L, "b c", "aa"),
      // bb: x=1, y=1 → N1=2 N2=0 → unseen 1.0, Chao1 undefined
      (3L, "x y", "bb"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ext.Corpus.goodTuring.fn(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("aa") === (("aa", 5L, 3L, 1L, 2L, 0.2, Some(3.25))))
    assert(got("bb") === (("bb", 2L, 2L, 2L, 0L, 1.0, None)))
  }

  test("x162 real data: estimator bounds hold on every language") {
    val got = ext.Corpus.goodTuring.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(got.size >= 2)
    got.foreach { case (_, n, v, n1, n2, mass, chao1) =>
      assert(n >= v && v >= n1 + n2) // types dominate hapax+doubletons
      assert(n1 + 2 * n2 <= n)       // their token mass fits the corpus
      assert(mass >= 0.0 && mass <= 1.0 && mass === n1.toDouble / n)
      chao1.foreach(c => assert(c >= v.toDouble)) // richness ≥ observed
    }
  }

  test("x188 CCNet buckets: exact per-lang thirds, score-monotone, x172's universe") {
    val got = ext.Corpus.ccnetBuckets.fn(spark, sf)
      .as[(Long, String, Long, Double, String)].collect().toSeq
    // universe = exactly the scoreable docs (x172's contract), each once
    val scored = ext.Corpus.knScore.fn(spark, sf)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    assert(got.map(_._1).distinct.size === got.size)
    assert(got.map(_._1).toSet === scored.keySet)
    got.foreach { case (id, _, _, score, bucket) =>
      assert(score === scored(id)) // the bucketed score IS x172's score
      assert(Set("head", "middle", "tail")(bucket))
    }
    got.groupBy(_._2).foreach { case (lang, docs) =>
      val n = docs.size
      val byB = docs.groupBy(_._5).view.mapValues(_.size).toMap
      // NTILE(3): first n%3 buckets carry ceil(n/3), the rest floor(n/3)
      val sizes = Seq("head", "middle", "tail").map(b => byB.getOrElse(b, 0))
      assert(sizes.sum === n)
      assert(sizes.max - sizes.min <= 1, s"$lang thirds $sizes")
      assert(sizes === sizes.sorted.reverse, s"$lang NTILE big-first $sizes")
      // buckets are score-ordered: every head score >= every middle
      // score >= every tail score (ties at a boundary split by doc_id,
      // so equality is legal)
      def scores(b: String) = docs.filter(_._5 == b).map(_._4)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").min >= scores("middle").max)
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").min >= scores("tail").max)
    }
  }
}
