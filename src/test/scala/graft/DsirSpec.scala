package graft

/** x177 DSIR: semantic pins the oracle hash can't express — target-like
  * documents outscore non-target-like ones REGARDLESS of their lang tag
  * (the tag only defines the target distribution; scoring sees text), and
  * the deterministic resampling step keeps exactly ⌈n/4⌉ docs. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(): (String, Set[Long], Set[Long], Long) = {
    // target vocab A (en docs), background vocab B (zh docs), and one
    // IMPOSTOR: zh-tagged but written in vocab A — DSIR's whole point
    // is that it selects by content, not by the metadata tag.
    def doc(v: String, salt: Int) =
      (0 until 12).map(i => s"$v${(i * 7 + salt) % 6}").mkString(" ")
    val aDocs = (1L to 4L).map(i => (i, doc("a", i.toInt), "en"))
    val bDocs = (5L to 8L).map(i => (i, doc("b", i.toInt), "zh"))
    val impostor = (9L, doc("a", 5), "zh")
    val dir = java.nio.file.Files.createTempDirectory("x177").toString
    (aDocs ++ bDocs :+ impostor).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    (dir, aDocs.map(_._1).toSet + impostor._1, bDocs.map(_._1).toSet, impostor._1)
  }

  test("x177: target-vocab docs outscore background docs; impostor rides its text") {
    val (dir, aIds, bIds, imp) = corpus()
    val rows = SparkEntry.queries("x177_dsir_select")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val score = rows.view.mapValues(_.getAs[Double]("score")).toMap
    val maxB = bIds.map(score).max
    aIds.foreach(a => assert(score(a) > maxB,
      s"target-vocab doc $a (${score(a)}) must outscore every background doc ($maxB)"))
    assert(score(imp) > maxB, "zh-tagged impostor written in target vocab must score by its text")
    // n_feats = bigram occurrences = tokens − 1
    rows.values.foreach(r => assert(r.getAs[Long]("n_feats") == 11L))
  }

  test("x177: an unscoreable (<2-token) doc stays in the output universe, unselected") {
    val dir = java.nio.file.Files.createTempDirectory("x177u").toString
    Seq((1L, "alpha beta gamma", "en"), (2L, "alpha beta delta", "en"),
        (3L, "solo", "zh"), (4L, "", "zh"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x177_dsir_select")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), "one row per corpus doc")
    Seq(3L, 4L).foreach { id =>
      assert(rows(id).getAs[Long]("n_feats") == 0L)
      assert(rows(id).isNullAt(rows(id).fieldIndex("score")))
      assert(rows(id).getAs[Long]("selected") == 0L)
    }
    // the quota ranks only scoreable docs: ⌈2/4⌉ = 1 selected
    assert(rows.values.count(_.getAs[Long]("selected") == 1L) == 1)
  }

  test("x177: deterministic resampling keeps exactly the top ⌈n/4⌉ by (score, doc_id)") {
    val (dir, _, _, _) = corpus()
    val rows = SparkEntry.queries("x177_dsir_select")(spark, dir).collect()
    val k = (rows.length + 3) / 4
    val selected = rows.filter(_.getAs[Long]("selected") == 1L)
    assert(selected.length == k)
    val ordered = rows.sortBy(r => (r.getAs[Double]("score"), r.getLong(0)))
    val topIds = ordered.takeRight(k).map(_.getLong(0)).toSet
    assert(selected.map(_.getLong(0)).toSet == topIds)
  }
}
