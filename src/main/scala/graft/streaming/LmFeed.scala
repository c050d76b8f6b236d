package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** x40/x172's language-model count tables as CONTINUOUS ingestion — the
  * feed family's most compute-heavy axis closed (r13 verdict #4): LM
  * quality-scoring a GROWING corpus re-paid the full unigram/bigram
  * aggregation per drop, yet the tables are PURE SUMS — mergeable exactly
  * like [[CmsFeed]]'s grid — so only the increment needs counting.
  *
  * State: two [[BucketStore]] APPEND stores of per-batch partial counts,
  *   `<dir>/uni` (tok, c, batch)  bucketed by xxhash64(tok)
  *   `<dir>/bi`  (w1, w2, c, batch) bucketed by xxhash64(w1, w2)
  * Each [[ingest]] appends ONE aggregated partial per store — cost
  * follows the batch, never history. Reads fold the partials with a sum
  * (addition is associative+commutative, so any batch split of the
  * corpus folds to the identical tables — incremental == from-scratch,
  * exactly; LmFeedSpec pins bit-equality of the scores against the
  * registered x40/x172 batch queries).
  *
  * Crash discipline — sums are NOT idempotent, so this feed needs one
  * more guard than [[BlockDedupFeed]]:
  *  - the `_APPLIED_BATCH` stamp (written AFTER both append-commits)
  *    makes a replayed batch id a no-op, and is REQUIRED for
  *    correctness after compaction: a late replay of a batch whose
  *    partials were already folded into the `batch = -1` row would
  *    otherwise double-count (ids must be monotonic — the foreachBatch
  *    epoch contract);
  *  - a crash BETWEEN the append-commit and the stamp leaves committed
  *    partials that the replay duplicates — both read paths therefore
  *    dedup on (batch, key) first (replay determinism makes the twins
  *    byte-identical, the [[BucketStore]] append-store read contract);
  *  - [[compact]] folds the visible partials to one row per key
  *    (`batch = -1`) and commits via [[BucketStore.commitReplaced]] —
  *    an atomic manifest swap, because two GENERATIONS visible at once
  *    would double-sum where BlockDedupFeed's immutable rows just
  *    dedup; the replaced partials become invisible garbage reclaimed
  *    by [[BucketStore.vacuum]].
  *
  * Scale shape per batch: one batch-sized aggregation per table and a
  * bucketed append; per view, one fold of the state (vocab-bounded
  * after compaction) and the x40/x172 scoring joins — never a
  * re-aggregation of corpus history.
  */
object LmFeed {

  val DefaultBuckets = 8
  private val AppliedStamp = "_APPLIED_BATCH"

  private def uniDir(dir: String) = s"$dir/uni"
  private def biDir(dir: String) = s"$dir/bi"

  private val uniSchema = StructType(Seq(
    StructField("tok", StringType), StructField("c", LongType),
    StructField("batch", LongType), StructField("b", IntegerType)))
  private val biSchema = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType),
    StructField("c", LongType), StructField("batch", LongType),
    StructField("b", IntegerType)))

  /** (doc_id, i, w1, w2) with 1-based bigram position — x40's explode,
    * shared by ingest (positions dropped) and the scoring views (the
    * position drives the ordered per-doc fold). */
  private def bigramFrame(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs
      .select(col("doc_id"), posexplode(
        filter(zip_with(t, slice(t, lit(2), size(t)),
          (a, b) => struct(a.as("w1"), b.as("w2"))),
          p => p.getField("w2").isNotNull)).as(Seq("i0", "p")))
      .select(col("doc_id"), (col("i0") + 1).as("i"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Append one batch's aggregated partial counts to a store — pin
    * before first append, snapshot/commit protocol, one file per
    * touched bucket. Test hook (private[graft]): LmFeedSpec drives this
    * directly to simulate the crash-between-commit-and-stamp twin. */
  private[graft] def appendPartials(spark: SparkSession, store: String,
      partials: DataFrame, keys: Seq[String], numBuckets: Int): Unit =
    BucketStore.appendRows(spark, store, partials, keys, numBuckets)

  /** Count one document batch into the feed. `batchId` must be
    * monotonic (foreachBatch epochs); a replayed id is a no-op. */
  def ingest(spark: SparkSession, dir: String, docs: DataFrame,
      batchId: Long, numBuckets: Int = DefaultBuckets): Unit = {
    require(batchId >= 0, "batch ids are nonnegative (-1 marks compacted rows)")
    if (AggView.readStamp(spark, dir, AppliedStamp) >= batchId) return // replay
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val uni = toks.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("batch", lit(batchId))
    val bi = bigramFrame(docs).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("batch", lit(batchId))
    appendPartials(spark, uniDir(dir), uni, Seq("tok"), numBuckets)
    appendPartials(spark, biDir(dir), bi, Seq("w1", "w2"), numBuckets)
    AggView.writeStamp(spark, dir, AppliedStamp, batchId)
  }

  /** Visible rows of one store, crash-twin-healed (dedup on
    * (batch, key)) — NOT yet folded. */
  private def visible(spark: SparkSession, store: String,
      schema: StructType, keys: Seq[String]): DataFrame =
    BucketStore.readBuckets(spark, store, None, Some(schema))
      .drop("b")
      .dropDuplicates(keys :+ "batch")

  /** Folded unigram table (tok, c) — token OCCURRENCE counts; its row
    * count is the corpus's distinct-token count (x40's `v`). */
  def uniCounts(spark: SparkSession, dir: String): DataFrame =
    visible(spark, uniDir(dir), uniSchema, Seq("tok"))
      .groupBy(col("tok")).agg(sum(col("c")).cast("long").as("c"))

  /** Folded bigram table (w1, w2, c) — x40/x172's `c12`. */
  def biCounts(spark: SparkSession, dir: String): DataFrame =
    visible(spark, biDir(dir), biSchema, Seq("w1", "w2"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("c")).cast("long").as("c"))

  /** Fold each store to one row per key (`batch = -1`) — the LSM
    * maintenance pass that makes the view's fold vocab-bounded instead
    * of Σ-batch-vocab-bounded. Commit is [[BucketStore.commitReplaced]]
    * (atomic manifest swap; see object doc), then the replaced partials
    * are vacuumed. Idempotent: re-folding a folded store is the
    * identity. */
  def compact(spark: SparkSession, dir: String): Unit = {
    def one(store: String, schema: StructType, keys: Seq[String]): Unit =
      if (BucketStore.storeExists(spark, store)) {
        BucketStore.ensureManifest(spark, store)
        val n = BucketStore.pinnedBuckets(spark, store)
        val folded = visible(spark, store, schema, keys)
          .groupBy(keys.map(col): _*).agg(sum(col("c")).cast("long").as("c"))
          .withColumn("batch", lit(-1L))
          .withColumn("b", BucketStore.bucketCol(keys, n))
          .localCheckpoint() // materialize BEFORE the manifest swap hides sources
        val touched = (0 until n).toSeq // replace-commit must cover every bucket
        val before = BucketStore.snapshotBuckets(spark, store, touched)
        folded.repartition(col("b")) // one file per bucket
          .write.partitionBy("b").mode("append").parquet(store)
        BucketStore.commitReplaced(spark, store, touched, before)
        BucketStore.vacuum(spark, store)
      }
    one(uniDir(dir), uniSchema, Seq("tok"))
    one(biDir(dir), biSchema, Seq("w1", "w2"))
  }

  /** x40 add-one-smoothed per-doc mean bigram probability, scored
    * against the FOLDED state — the identical expression tree as the
    * registered batch query (same exact-integer counts, same one
    * correctly-rounded division, same ordered fold), so for docs ==
    * the ingested corpus the scores are bit-equal (LmFeedSpec pins it).
    * Scored docs are assumed ingested: an unseen bigram has no count
    * row and drops from the mean (the batch query has the same
    * semantics — every doc it scores is in its corpus). */
  def scoreAddOne(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val bg = bigramFrame(docs)
    val c12 = biCounts(spark, dir)
      .select(col("w1"), col("w2"), col("c").as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).cast("long").as("c1"))
    val v = uniCounts(spark, dir).agg(count(lit(1)).cast("long").as("v"))
    val p = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v)) // one scalar row
      .select(col("doc_id"), col("i"),
        ((col("c12") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double")).as("p"))
    foldScores(p)
  }

  /** x172 interpolated Kneser–Ney (D = 3/4, dyadic) against the folded
    * state — same expression tree as the batch query (see
    * [[graft.ext.Corpus]] x172 for the formula's exactness argument). */
  def scoreKneserNey(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val bg = bigramFrame(docs)
    val c12 = biCounts(spark, dir)
      .select(col("w1"), col("w2"), col("c").as("c12"))
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"),
        count(lit(1)).cast("long").as("n1v"))
    val n1w = c12.groupBy(col("w2"))
      .agg(count(lit(1)).cast("long").as("n1w"))
    val bt = c12.agg(count(lit(1)).cast("long").as("nbt"))
    val p = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .join(n1w, Seq("w2"))
      .crossJoin(broadcast(bt)) // one scalar row
      .select(col("doc_id"), col("i"),
        (greatest(lit(4) * col("c12") - 3, lit(0)).cast("double")
            / (lit(4) * col("c1"))
          + (lit(3.0) * col("n1v") / (lit(4) * col("c1")))
            * (col("n1w").cast("double") / col("nbt"))).as("p"))
    foldScores(p)
  }

  /** The shared per-doc mean: x40/x172's position-ordered left fold
    * (collect (i, p) pairs, array_sort on i, exact-order summation). */
  private def foldScores(p: DataFrame): DataFrame =
    p.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        array_sort(collect_list(struct(col("i"), col("p")))).as("ps"))
      .select(col("doc_id"), col("n_bigrams"),
        (aggregate(col("ps"), lit(0.0), (acc, x) => acc + x.getField("p")) /
          col("n_bigrams")).as("score"))
      .orderBy(col("doc_id"))
}
