package graft

import graft.ext.{Bpe, Rewrite, Sampling}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based property tests for the round-7 corpus operators: each
  * engine pipeline is compared, on ScalaCheck-generated corpora, against
  * an independent plain-Scala reference implementation (same style as
  * PropertySpec — direct Gen with fixed seeds; the scalatest bridge is
  * not in the offline dependency set). The DuckDB oracles pin one
  * corpus; these pin the ALGORITHM over arbitrary ones. */
class PropertyOpsSpec extends SparkSuite {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(77L + i)))

  // Small alphabet → dense pair collisions, the interesting BPE regime.
  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val docGen: Gen[String] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, docGen))

  /** Reference BPE trainer: per-word char sequences weighted by corpus
    * occurrence counts; each round counts adjacent pairs, takes the
    * (count desc, a, b) argmax, and applies one greedy left-to-right
    * non-overlapping merge pass. Independent of the engine's
    * bracket-string encoding. */
  private def refBpe(texts: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
    val freqs = texts.flatMap(_.split(" ")).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    var words: Seq[(Vector[String], Long)] =
      freqs.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        words = words.map { case (syms, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { buf += (a + b); i += 2 }
            else { buf += syms(i); i += 1 }
          }
          (buf.result(), f)
        }
        r += 1
      }
    }
    out.result()
  }

  test("property: x45 merge table equals the reference BPE trainer on random corpora") {
    samples(corpusGen, 5).foreach { texts =>
      val expected = refBpe(texts, Bpe.Merges)
      // precondition of the registered query: enough pair inventory for
      // all rounds — generated corpora occasionally run dry; the
      // comparison then covers the rounds that exist on BOTH sides (a
      // dry reference means the engine's later argmaxes are undefined).
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (_, tops) = Bpe.train(docs)
      val got = tops.take(expected.size).map(
        _.select(col("a"), col("b"), col("cnt")).as[(String, String, Long)].head())
      assert(got == expected, s"corpus: ${texts.take(3)}...")
    }
  }

  /** Reference trainer variant returning the final per-word symbol
    * counts (the x45b encode table). */
  private def refBpeSegments(texts: Seq[String], rounds: Int): Map[String, Int] = {
    val freqs = texts.flatMap(_.split(" ")).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    var words: Map[String, Vector[String]] =
      freqs.keys.map(w => w -> w.map(_.toString).toVector).toMap
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + freqs(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        words = words.map { case (w, syms) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { buf += (a + b); i += 2 }
            else { buf += syms(i); i += 1 }
          }
          w -> buf.result()
        }
        r += 1
      }
    }
    words.map { case (w, syms) => w -> syms.size }
  }

  test("property: x45b per-doc subword counts equal the reference encode on random corpora") {
    samples(corpusGen, 4).foreach { texts =>
      val seg = refBpeSegments(texts, Bpe.Merges)
      val expected = texts.zipWithIndex.map { case (t, i) =>
        val ws = t.split(" ").toSeq
        (i.toLong, ws.size.toLong, ws.map(seg(_).toLong).sum)
      }.sortBy(_._1)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val (words, _) = Bpe.train(docs)
      val got = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        .join(words.select($"w",
          size(split(expr("substring(repr, 2, length(repr) - 2)"), "\\]\\[")).as("ns")), "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("nw"), sum($"ns").cast("long").as("nsw"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"corpus: ${texts.take(3)}...")
    }
  }

  test("property: x47 integer distances and flags equal the plain-Scala model") {
    val vecGen = Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 64.0f))
    val tableGen = Gen.choose(4, 30).flatMap(n =>
      Gen.listOfN(n, vecGen)).map(_.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) })
    samples(tableGen, 5).foreach { rows =>
      // the model, in exact integer arithmetic mirroring the scaladoc:
      // q = floor(x * 2^20); centroid = floor-mean per dim; dist2 exact;
      // cut at 2 * floor-mean(dist2)
      val q = rows.map { case (id, v) => id -> v.map(x => math.floor(x.toDouble * 1048576.0).toLong) }
      val dim = 8
      val cent = (0 until dim).map { i =>
        math.floor(q.map(_._2(i)).sum.toDouble / q.size).toLong
      }.toArray
      val d = q.map { case (id, v) =>
        id -> (0 until dim).map(i => (v(i) - cent(i)) * (v(i) - cent(i))).sum
      }
      val md = math.floor(d.map(_._2).sum.toDouble / d.size).toLong
      val expected = d.map { case (id, dd) => (id, dd, dd > 2 * md) }.sortBy(_._1)
      // the engine pipeline is Dim=64-wide; pad the 8 generated dims
      // with zeros (zero dims contribute zero to every sum — the model
      // above IS the 64-dim computation)
      val padded = rows.map { case (id, v) => (id, v ++ Array.fill(64 - dim)(0f)) }
        .toDF("vec_id", "embedding")
      val got = graft.ext.Outlier.pipeline(padded)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == expected)
    }
  }

  test("property: x43 rewrite equals the keep-first reference model on random corpora") {
    samples(corpusGen, 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // reference: blocks of 10 tokens per doc; first (doc_id, blk)
      // occurrence of each content survives
      val blocks = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").grouped(10).zipWithIndex.map { case (g, b) => (i.toLong, b, g.mkString(" ")) }
      }
      val firstOf = blocks.groupBy(_._3).map { case (c, occ) => c -> occ.minBy(o => (o._1, o._2)) }
      val expected = texts.indices.map { i =>
        val mine = blocks.filter(_._1 == i.toLong)
        val kept = mine.filter(b => firstOf(b._3) == b).sortBy(_._2)
        (i.toLong, mine.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
      }
      val got = Rewrite.pipeline(docs)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"corpus: ${texts.take(3)}...")
    }
  }

  test("property: x44 rates and membership equal the plain-Scala model") {
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 2000000L), Gen.oneOf("aa", "bb", "cc", "dd")))
    samples(rowGen, 6).foreach { rows0 =>
      val rows = rows0.distinctBy(_._1)
      val docs = rows.toDF("doc_id", "lang")
      val counts = rows.groupBy(_._2).map { case (l, r) => l -> r.size.toLong }
      val nMin = counts.values.min
      val P = 1000003L
      val K = 2654435761L % P
      val expected = rows.map { case (id, l) =>
        val rate = math.sqrt(nMin.toDouble / counts(l))
        (id, l, rate, ((id % P) * K % P).toDouble / P < rate)
      }.sortBy(_._1)
      val got = Sampling.temperaturePipeline(docs)
        .as[(Long, String, Double, Boolean)].collect().toSeq
      assert(got == expected)
    }
  }
}
