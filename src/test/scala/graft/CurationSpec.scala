package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant specs for the curation operators (x21–x26, a20) beyond the
  * driver's oracle hash-compare: structural properties that must hold on
  * ANY corpus, checked on sf0.001. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)
  private lazy val docs = Tables.documents(spark, sf).cache()

  test("x21 repetition fractions are well-formed and bigram <= token max") {
    val r = q("x21_repetition").collect()
    assert(r.length === docs.count())
    r.foreach { row =>
      val (nTok, topTok, topBg) = (row.getLong(1), row.getLong(2), row.getLong(4))
      assert(topTok >= 1 && topTok <= nTok)
      // every occurrence of the top bigram contains the bigram's first
      // token, so its count can never exceed the top token count
      assert(topBg <= topTok)
      val frac = row.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("x21 matches a hand-computed doc") {
    val first = docs.orderBy($"doc_id").select($"doc_id", $"text").head()
    val toks = first.getString(1).split(" ")
    val topTok = toks.groupBy(identity).values.map(_.length).max
    val topBg = toks.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.length).max
    val got = q("x21_repetition").filter($"doc_id" === first.getLong(0)).head()
    assert(got.getLong(1) === toks.length.toLong)
    assert(got.getLong(2) === topTok.toLong)
    assert(got.getLong(4) === topBg.toLong)
  }

  test("x22 decontam covers exactly the train split and agrees with a JVM recount") {
    val out = q("x22_decontam").collect()
    val split = q("x17_hash_split").select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    assert(out.map(_.getLong(0)).toSet === split.collect { case (id, "train") => id }.toSet)
    // recount one contaminated doc's overlapping shingles from raw text
    val holdShingles = docs.filter(substring(md5($"doc_id".cast("string")), 1, 1)
        .isin("0", "1"))
      .select($"text").as[String].collect()
      .flatMap(_.split(" ").sliding(3).map(_.mkString(" "))).toSet
    out.filter(_.getBoolean(2)).take(3).foreach { row =>
      val text = docs.filter($"doc_id" === row.getLong(0)).select($"text").as[String].head()
      val mine = text.split(" ").sliding(3).map(_.mkString(" ")).toSet
        .count(holdShingles.contains)
      assert(row.getLong(1) === mine.toLong, s"doc ${row.getLong(0)}")
    }
  }

  test("x23 packing: spans tile each doc exactly and fill every interior sequence") {
    val out = q("x23_pack_sequences").cache()
    // per doc: spans are contiguous from 0 and sum to the token count
    val perDoc = out.groupBy($"doc_id")
      .agg(sum($"tok_len").as("covered"), min($"tok_start").as("s0"),
        count(lit(1)).as("n_spans"))
    val nToks = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    assert(perDoc.join(nToks, "doc_id").filter($"covered" =!= $"n" || $"s0" =!= 0).isEmpty)
    // per sequence: every seq except the last carries exactly SeqLen tokens
    val lastSeq = out.agg(max($"seq_id")).head().getLong(0)
    val bad = out.groupBy($"seq_id").agg(sum($"tok_len").as("filled"))
      .filter($"seq_id" < lastSeq && $"filled" =!= ext.Curation.SeqLen)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("x23 segmented prefix scan equals the single-window formulation") {
    val d = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val naive = d.withColumn("gs",
      coalesce(sum($"n").over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", explode(sequence(expr("gs DIV 64"), expr("(gs + n - 1) DIV 64")))
        .as("seq_id"))
      .select($"doc_id", $"seq_id".cast("long").as("seq_id"))
    val got = q("x23_pack_sequences").select($"doc_id", $"seq_id")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("x24 scrub removes every stopword and nothing else") {
    val out = q("x24_stopword_scrub")
      .join(docs.select($"doc_id", $"text"), "doc_id")
    val reTok = split($"clean_text", " ")
    assert(out.filter(array_contains(reTok, "a") || array_contains(reTok, "the")).isEmpty)
    val recount = size(filter(split($"text", " "), t => t === "a" || t === "the"))
    assert(out.filter($"n_removed" =!= recount.cast("long")).isEmpty)
  }

  test("x25 deciles partition the corpus into balanced, ordered bins") {
    val d = q("x25_quality_deciles").collect()
    assert(d.map(_.getLong(1)).sum === docs.count())
    val sizes = d.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"NTILE balance violated: ${sizes.toSeq}")
    d.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2) + 1e-15,
        s"decile ${lo.getLong(0)} max > decile ${hi.getLong(0)} min")
    case _ => ()
    }
  }

  test("x25b approx binning agrees with exact NTILE up to tie-group size") {
    // x25b keeps tied scores in one bin where NTILE splits them by doc_id,
    // so cumulative populations at each decile boundary may differ by at
    // most the largest tie group; everything else must line up.
    val exact = q("x25_quality_deciles")
      .select($"decile", $"n_docs").as[(Long, Long)].collect().toMap
    val approx = q("x25b_quality_deciles_approx")
      .select($"decile", $"n_docs").as[(Long, Long)].collect().toMap
    assert(approx.values.sum === docs.count(), "x25b dropped or duplicated docs")
    assert(approx.keySet.subsetOf((1L to 10L).toSet), s"bins out of range: $approx")
    val maxTie = docs
      .groupBy((size(array_distinct(split($"text", " "))).cast("double")
        / size(split($"text", " "))).as("score"))
      .count().agg(max($"count")).as[Long].head()
    def cum(m: Map[Long, Long], d: Long) = (1L to d).map(m.getOrElse(_, 0L)).sum
    (1L to 9L).foreach { d =>
      val diff = math.abs(cum(approx, d) - cum(exact, d))
      assert(diff <= maxTie,
        s"decile $d: cum approx ${cum(approx, d)} vs exact ${cum(exact, d)}, tie bound $maxTie")
    }
  }

  test("x26 weighted sample keeps exactly the u<score set, monotone in quality") {
    val kept = q("x26_weighted_sample").select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id",
        (($"doc_id" * lit(2654435761L)) % lit(1000003L)).cast("double")
          ./(lit(1000003)).as("u"),
        (size(array_distinct(split($"text", " "))).cast("double")
          / size(split($"text", " "))).as("score"))
      .as[(Long, Double, Double)].collect()
    all.foreach { case (id, u, score) =>
      assert(kept.contains(id) === (u < score), s"doc $id u=$u score=$score")
    }
    assert(kept.nonEmpty && kept.size < all.length)
  }

  test("PII scrub masks emails/SSNs/phones with typed placeholders, counts match") {
    import graft.ext.Curation
    val cases = Seq(
      ("write to bob.smith+spam@example.co.uk today", "write to <EMAIL> today", 1L),
      ("ssn 123-45-6789 and phone (412) 555-1234 ok", "ssn <SSN> and phone <PHONE> ok", 2L),
      ("call +1 412-555-1234 or 412.555.1234", "call <PHONE> or <PHONE>", 2L),
      ("no pii here at all", "no pii here at all", 0L),
      ("a@b.io c@d.io", "<EMAIL> <EMAIL>", 2L),
      // a phone-shaped digit run inside an email local part is ONE email
      // replacement, not email + phone — counts mirror piiScrubbed's
      // replacement order (email, then SSN, then phone on masked text)
      ("reach 412 555-1234x@example.com now", "reach 412 <EMAIL> now", 1L))
    val got = cases.map(_._1).toDF("text")
      .select($"text", Curation.piiScrubbed($"text").as("clean"),
        Curation.piiRedactions($"text").as("n"))
      .as[(String, String, Long)].collect().toSeq
    got.zip(cases).foreach { case ((orig, clean, n), (_, expClean, expN)) =>
      assert(clean === expClean, s"scrub of '$orig'")
      assert(n === expN, s"count of '$orig'")
    }
    // the whole corpus passes through unchanged (no PII in the synthetic
    // docs) — the scrub is safe to leave in the standing DAG
    val corpus = docs.select($"text", Curation.piiScrubbed($"text").as("c"))
    assert(corpus.filter($"text" =!= $"c").isEmpty)
  }

  test("x39 mixture rebalance fills each lang to min(quota, available), deterministically") {
    val quotas = Map("en" -> 80L, "de" -> 40L, "es" -> 40L, "fr" -> 20L, "zh" -> 20L)
    val avail = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("x39_domain_mix").groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    quotas.foreach { case (l, tgt) =>
      assert(got.getOrElse(l, 0L) === math.min(tgt, avail.getOrElse(l, 0L)),
        s"lang $l: want min($tgt, ${avail.getOrElse(l, 0L)})")
    }
    assert(got.keySet.subsetOf(quotas.keySet), "no lang outside the target mixture")
    // determinism: identical membership on a second run
    val a = q("x39_domain_mix").collect().toSeq
    val b = q("x39_domain_mix").collect().toSeq
    assert(a === b)
  }

  test("a20 grouping-set rollup levels are mutually consistent") {
    val rows = q("a20_grouping_sets").collect()
    val total = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(total.length === 1)
    val n = total.head.getLong(5)
    val byStatus = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    val byPair = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    assert(byStatus.map(_.getLong(5)).sum === n)
    assert(byPair.map(_.getLong(5)).sum === n)
    assert(rows.length === 1 + byStatus.length + byPair.length)
  }

  test("x184 curriculum novelty: hand-computed introduction curve on a crafted schedule") {
    // one source, 10 docs: doc k carries 11−k distinct private tokens
    // padded to 10 with repeats, so uniq ratio (11−k)/10 puts it at
    // src_rank k → position k → decile k. Every doc's vocabulary is
    // private, so decile k introduces exactly 11−k types.
    val docsRows = (1 to 10).map { k =>
      val distinct = (1 to (11 - k)).map(i => s"t${k}_$i")
      val padded = distinct ++ Seq.fill(k - 1)(distinct.head)
      (k.toLong, padded.mkString(" "), "x", "s0")
    }
    val dir = java.nio.file.Files.createTempDirectory("x184").toString
    docsRows.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x184_curriculum_novelty")(spark, dir)
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.size == 10)
    var cum = 0L
    (1 to 10).foreach { k =>
      val r = rows(k.toLong)
      cum += (11 - k).toLong
      assert(r.getAs[Long]("n_docs") == 1L, s"decile $k docs")
      assert(r.getAs[Long]("n_tokens") == 10L, s"decile $k tokens")
      assert(r.getAs[Long]("new_types") == (11 - k).toLong, s"decile $k new")
      assert(r.getAs[Long]("cum_types") == cum, s"decile $k cum")
      assert(r.getAs[Double]("vocab_share") == (11 - k).toDouble / 55, s"decile $k share")
    }
  }

  test("x184 on the real corpus: shares sum to 1, cum ends at the vocabulary size") {
    val rows = q("x184_curriculum_novelty").orderBy(col("decile")).collect()
    val vocab = docs.select(explode(split(col("text"), " "))).distinct().count()
    assert(rows.last.getAs[Long]("cum_types") == vocab)
    assert(rows.map(_.getAs[Long]("new_types")).sum == vocab)
    assert(math.abs(rows.map(_.getAs[Double]("vocab_share")).sum - 1.0) < 1e-12)
    assert(rows.map(_.getAs[Long]("cum_types")).toSeq ==
      rows.map(_.getAs[Long]("cum_types")).sortBy(identity).toSeq)
  }

  test("x182 span decontam agrees with a JVM recount and with x22's boolean") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def isHoldout(id: Long) = "01".contains(md5hex(id.toString).charAt(0))
    def grams(t: String): Seq[(Int, String)] = {
      val ts = t.split(" ")
      (0 until math.max(0, ts.length - 2)).map(i =>
        (i + 1, s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}"))
    }
    val holdGrams = texts.filter(kv => isHoldout(kv._1))
      .values.flatMap(grams(_).map(_._2)).toSet
    val got = q("x182_decontam_spans").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == texts.keySet.filterNot(isHoldout))
    got.foreach { case (id, r) =>
      val ts = texts(id).split(" ")
      val hits = grams(texts(id)).filter(g => holdGrams(g._2))
      val covered = hits.flatMap(g => g._1 to g._1 + 2).toSet.size
      assert(r.getAs[Long]("n_tokens") == ts.length.toLong, s"doc $id tokens")
      assert(r.getAs[Long]("n_match_pos") == hits.size.toLong, s"doc $id matches")
      assert(r.getAs[Long]("covered_tokens") == covered.toLong, s"doc $id coverage")
      assert(r.getAs[Double]("contam_frac") == covered.toDouble / ts.length)
      assert(r.getAs[Long]("dirty") == (if (5 * covered > 4 * ts.length) 1L else 0L))
    }
    // span grain refines x22's boolean: covered > 0 ⟺ contaminated
    val x22 = q("x22_decontam").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("contaminated")).toMap
    got.foreach { case (id, r) =>
      assert((r.getAs[Long]("covered_tokens") > 0) == x22(id), s"doc $id vs x22")
    }
  }

  test("x182b rewrite: drops exactly the dirty docs, masks exactly the covered set") {
    val spans = q("x182_decontam_spans").collect()
      .map(r => r.getLong(0) -> r).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("x182b_decontam_rewrite").collect()
      .map(r => r.getLong(0) -> r).toMap
    val expectKept = spans.filter(_._2.getAs[Long]("dirty") == 0L).keySet
    assert(got.keySet == expectKept, "kept set = non-dirty train docs")
    got.foreach { case (id, r) =>
      val orig = texts(id).split(" ")
      val clean = r.getAs[String]("text_clean").split(" ")
      assert(clean.length == orig.length, s"doc $id preserves positions")
      val masked = clean.zipWithIndex.collect {
        case (t, i) if t == "__MASK__" => i }.toSet
      assert(masked.size.toLong == r.getAs[Long]("masked_tokens"), s"doc $id count")
      assert(r.getAs[Long]("masked_tokens")
        == spans(id).getAs[Long]("covered_tokens"), s"doc $id = x182 coverage")
      orig.indices.filterNot(masked).foreach(i =>
        assert(clean(i) == orig(i), s"doc $id unmasked token $i unchanged"))
    }
  }

  test("x182b idempotence: re-cleaning the cleaned corpus is a no-op") {
    val first = q("x182b_decontam_rewrite").collect()
    val cleanedTrain = q("x182b_decontam_rewrite")
      .select(col("doc_id"), col("text_clean").as("text"))
    val holdout = docs.filter(
        substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("x182b").toString
    cleanedTrain.unionByName(holdout)
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val second = SparkEntry.queries("x182b_decontam_rewrite")(spark, dir).collect()
    assert(second.length == first.length, "no further drops")
    val firstClean = first.map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    second.foreach { r =>
      assert(r.getAs[Long]("masked_tokens") == 0L, s"doc ${r.getLong(0)} re-masked")
      assert(r.getAs[String]("text_clean") == firstClean(r.getLong(0)),
        s"doc ${r.getLong(0)} text changed on re-clean")
    }
  }

  test("x182c telemetry equals a JVM recount from the x182 span verdicts") {
    val spans = q("x182_decontam_spans").collect().map(r => r.getLong(0) -> r).toMap
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = spans.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, rs) =>
        val dirty = rs.filter(_._2.getAs[Long]("dirty") == 1L)
        val kept = rs.filterNot(_._2.getAs[Long]("dirty") == 1L)
        src -> (rs.size.toLong, dirty.size.toLong,
          rs.map(_._2.getAs[Long]("n_tokens")).sum,
          dirty.map(_._2.getAs[Long]("n_tokens")).sum,
          kept.map(_._2.getAs[Long]("covered_tokens")).sum)
      }
    val got = q("x182c_decontam_telemetry").collect()
    assert(got.map(_.getString(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (nd, drop, tin, tdrop, tmask) = expect(r.getString(0))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_dropped") == drop)
      assert(r.getAs[Long]("tokens_in") == tin)
      assert(r.getAs[Long]("tokens_dropped") == tdrop)
      assert(r.getAs[Long]("tokens_masked") == tmask)
      assert(r.getAs[Double]("removed_frac") == (tdrop + tmask).toDouble / tin)
    }
  }

  test("x180 curriculum order: a permutation, quality-monotone within source, proportional in every prefix") {
    val rows = q("x180_curriculum_order").collect()
    val n = rows.length
    // positions are a permutation of 1..n
    assert(rows.map(_.getAs[Long]("position")).toSet === (1L to n).toSet)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // within each source: position strictly increases with src_rank
    // (earlier-consumed docs are the better-quality ones), and ranks
    // are a per-source permutation
    bySource.foreach { case (src, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("src_rank"))
      assert(ordered.map(_.getAs[Long]("src_rank")).toSeq == (1L to rs.length).toSeq, src)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("position") < b.getAs[Long]("position"), src)
        case _ =>
      }
    }
    // stride-scheduling guarantee: any prefix holds each source in
    // proportion to its size (priority = r/n_src, so a source's count in
    // the first P positions is within ±2 of n_src·P/n — the interleave,
    // not a source-by-source concatenation)
    Seq(n / 4, n / 2, 3 * n / 4).foreach { p =>
      val prefix = rows.filter(_.getAs[Long]("position") <= p)
        .groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
      bySource.foreach { case (src, rs) =>
        val want = rs.length.toDouble * p / n
        val got = prefix.getOrElse(src, 0)
        assert(math.abs(got - want) <= 2.0,
          s"prefix $p: source $src has $got docs, expected ~$want")
      }
    }
    // the within-source order IS the quality order: the top-ranked doc
    // of each source carries its maximal quality score
    val scored = docs.select(col("doc_id"), col("source"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("score"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    bySource.foreach { case (src, rs) =>
      val r1 = rs.minBy(_.getAs[Long]("src_rank"))
      val maxScore = rs.map(r => scored(r.getAs[Long]("doc_id"))._2).max
      assert(scored(r1.getAs[Long]("doc_id"))._2 == maxScore, src)
    }
  }
}
