package graft

import org.apache.spark.sql.functions._

/** x186 semantic pins the oracle hash can't express: the averaged
  * perceptron SEPARATES a linearly separable crafted corpus, the label
  * proxy is exactly lang=en ∧ x176-keep, and the output's derived
  * columns (pred/agree/in_train) are internally consistent. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  /** Crafted separable corpus: positives (en, vocab A) vs negatives
    * (zh, vocab B) — 30 tokens each so every doc passes the C4 gate
    * (3 full 10-token pseudo-lines, no block word, no brace). */
  private def separableCorpus(): String = {
    def doc(v: String, salt: Int) =
      (0 until 30).map(i => s"$v${(i * 7 + salt) % 6}").mkString(" ")
    val pos = (1L to 12L).map(i => (i, doc("aa", i.toInt), "en", "s1"))
    val neg = (13L to 24L).map(i => (i, doc("bb", i.toInt), "zh", "s2"))
    val dir = java.nio.file.Files.createTempDirectory("x186").toString
    (pos ++ neg).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("x186 separates a linearly separable crafted corpus perfectly") {
    val dir = separableCorpus()
    val rows = SparkEntry.queries("x186_quality_classifier")(spark, dir).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      assert(r.getAs[Long]("agree") == 1L,
        s"doc ${r.getLong(0)}: pred ${r.getAs[Long]("pred")} != label ${r.getAs[Long]("label")}")
      assert(r.getAs[Long]("in_train") == 1L) // 24 docs < TrainN: all sampled
    }
    assert(rows.count(_.getAs[Long]("pred") == 1L) == 12, "both classes predicted")
  }

  test("x186 label proxy is exactly lang=en AND x176 keep") {
    val keep = SparkEntry.queries("x176_c4_quality")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("keep")).toMap
    val lang = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    SparkEntry.queries("x186_quality_classifier")(spark, sf).collect().foreach { r =>
      val id = r.getLong(0)
      val expect = if (lang(id) == "en" && keep(id) == 1L) 1L else -1L
      assert(r.getAs[Long]("label") == expect, s"doc $id label")
    }
  }

  test("x186 derived columns are consistent; in_train = the TrainN smallest ids") {
    val rows = SparkEntry.queries("x186_quality_classifier")(spark, sf).collect()
    val trainIds = rows.map(_.getLong(0)).sorted.take(ext.Classifier.TrainN).toSet
    rows.foreach { r =>
      val score = r.getAs[Long]("score")
      assert(r.getAs[Long]("pred") == (if (score > 0) 1L else -1L))
      assert(r.getAs[Long]("agree")
        == (if (r.getAs[Long]("pred") == r.getAs[Long]("label")) 1L else 0L))
      assert(r.getAs[Long]("in_train")
        == (if (trainIds(r.getLong(0))) 1L else 0L))
    }
  }

  test("x186b census equals a JVM recount from x186 and x177") {
    val clf = SparkEntry.queries("x186_quality_classifier")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("pred") == 1L)).toMap
    val dsir = SparkEntry.queries("x177_dsir_select")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("selected") == 1L)).toMap
    val r = SparkEntry.queries("x186b_clf_vs_dsir")(spark, sf).collect().head
    val both = clf.keySet.count(id => clf(id) && dsir(id))
    assert(r.getAs[Long]("n_docs") == clf.size.toLong)
    assert(r.getAs[Long]("n_clf") == clf.values.count(identity).toLong)
    assert(r.getAs[Long]("n_dsir") == dsir.values.count(identity).toLong)
    assert(r.getAs[Long]("n_both") == both.toLong)
  }
}
