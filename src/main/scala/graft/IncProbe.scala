package graft

import graft.streaming.{AggView, BitmapFeed, BlockDedupFeed, Cdc, CmsFeed, KmvFeed}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-operator scaling probe (`runMain graft.IncProbe
  * [maxFactor]`) — the round-8 companion to [[ScaleProbe]]. ScaleProbe
  * measures batch throughput vs CORPUS size; this probe measures
  * PER-INCREMENT cost vs ACCUMULATED HISTORY — the claim that makes
  * incremental ingestion worth having ("only the increment pays", not
  * "every batch re-pays for the corpus"). For each factor f ∈ {1, 4,
  * maxF}: seed f history units into the operator's store, then time
  * applying ONE FIXED-SIZE batch. A flat curve means increment cost is
  * bounded by the batch, not the history; the bucket-pruned stores
  * (BlockDedupFeed round 8, Cdc/AggView since round 6) are what make it
  * flat — each batch reads only the bucket slice its keys hash into.
  *
  * Two fixed-work probes ride along (both round-8 judge tasks):
  *  - BPE merge-loop DEPTH: train at M ∈ {8, 64, 256} on the 10×
  *    corpus; per-round cost must stay flat because every round runs on
  *    the word table, never the corpus (`ext/Bpe.scala`).
  *  - bounded probe selection at LARGE K: `SemDedup.probeTable` at
  *    K = 1,000 cells (cellBits 10) — the O(NProbe)-state aggregation
  *    must absorb a 100× larger quantizer without per-row state blowup
  *    (`Ivf.BoundedMinN`; the round-7 collect-all-K form was O(K)).
  *
  * History units reuse ScaleProbe's bijective constructions (token
  * rename / key shift), so every copy is an isomorphic replica in a
  * disjoint key space and increments never collide with history. */
object IncProbe {

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def emit(op: String, factor: Int, sec: Double, extra: String = ""): Unit =
    println(f"""{"probe":"inc","op":"$op","factor":$factor,"sec":$sec%.3f$extra}""")

  def main(args: Array[String]): Unit = {
    val maxFactor = args.headOption.map(_.toInt).getOrElse(10)
    // Optional 2nd arg: comma-separated section filter
    // (bdf,cdc,aggview,pqfeed,kmv,cms,bitmap,trailing,holt,lmfeed,dsirfeed,
    // minhash,bpe,probek) for fast re-probe of one.
    val only = args.lift(1).map(_.split(",").toSet)
    def section(name: String)(body: => Unit): Unit =
      if (only.forall(_.contains(name))) body
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "/root/testdata/sf0.1"
    val factors = Seq(1, 4, maxFactor).distinct

    // ---- BlockDedupFeed: span-dedup increment vs index history --------
    // History unit = the 5k-doc corpus, token-renamed per copy (disjoint
    // blocks). Timed batch = 20 fresh docs (~200 blocks) — the "daily
    // drop ≪ corpus" regime bucket pruning exists for. 1,024 buckets;
    // compacted after seeding (the LSM posture: appends O(batch), a
    // maintenance pass bounds files-read).
    val docs = Tables.documents(spark, base)
    def renamed(tag: String): DataFrame =
      docs.select(col("doc_id"), array_join(transform(split(col("text"), " "),
        t => concat(t, lit(s"_$tag"))), " ").as("text"))
    def freshBatch(tag: String): DataFrame =
      spark.range(20).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 100).map(i => concat(lit(s"fb${tag}w${i}x"), col("id"))): _*).as("text"))
    section("bdf") { factors.foreach { f =>
      val idx = s"/tmp/graft-inc-bdf-$f"
      deleteDir(spark, idx)
      (0 until f).foreach { k =>
        BlockDedupFeed.applyBatch(renamed(s"h$k"), idx, numBuckets = 1024)
          .write.format("noop").mode("overwrite").save()
      }
      BlockDedupFeed.compact(spark, idx)
      BlockDedupFeed.applyBatch(freshBatch(s"w$f"), idx)
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        BlockDedupFeed.applyBatch(freshBatch(s"t$f"), idx)
          .write.format("noop").mode("overwrite").save()
      }
      emit("blockdedup_apply", f, sec)
    } }

    // ---- Cdc: MERGE increment vs snapshot history ---------------------
    // History unit = the sf0.1 orders table, key-shifted per copy.
    // Timed batch = 100 updated images of copy-0 keys. CONSTANT
    // OCCUPANCY: each factor's store is created with 64·f buckets (the
    // same growth rule SemDeDup adopted this round — store partitions
    // scale with the snapshot, so bucket size stays ~2.3k rows at every
    // f). A 100-key batch then reads ≤100 constant-size buckets back:
    // cost is bounded by batch-key-count × occupancy, independent of
    // history. (The first probe of this round seeded every factor at a
    // FIXED 256 buckets and measured 5.1/9.9/27.4s at 1×/4×/10× — the
    // linear curve is exactly the occupancy growing with history, the
    // defect the growth rule removes.)
    section("cdc") { factors.foreach { f =>
      val store = s"/tmp/graft-inc-cdc-$f"
      deleteDir(spark, store)
      (0 until f).foreach { k =>
        val copy = ScaleProbe.scaledOrders(spark, base, k + 1)
          .filter(col("o_orderkey") >= k * 100000000L)
        Cdc.mergeIntoStore(copy, store, Seq("o_orderkey"), "o_orderdate", numBuckets = 64 * f)
      }
      // mod 1499 over the 150k-order base ≈ 100 keys. (Rounds 8–10 used
      // mod 149 ≈ 1,000 keys — at 64·f buckets that batch touched MOST
      // of the store at every factor (504/640 dirs at 10×), so the row
      // measured bulk-rewrite throughput, not the trickle regime the
      // bucket pruning + manifest exist for, and raw walls crept with
      // the touched-bucket saturation curve rather than history.)
      def images(seed: Int) = Tables.orders(spark, base)
        .filter(pmod(col("o_orderkey") + seed, lit(1499L)) === 0) // ~100 keys
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      // The fixed 100-key batch touches min(~100, buckets·(1−e^{−100/buckets}))
      // DISTINCT buckets — ≤64 at 1× history, ~97 at 10× (key-collision
      // saturation), so the RAW wall rises ~1.5× across factors even
      // when per-touched-bucket cost is flat. Emit the touched count so
      // the flat claim ("cost follows the batch's touched buckets, not
      // history") is checkable from the JSON line directly.
      val touched = images(2)
        .select(pmod(xxhash64(col("o_orderkey")), lit((64L * f))).cast("int"))
        .distinct().count()
      Cdc.mergeIntoStore(images(1), store, Seq("o_orderkey"), "o_orderdate") // warm
      val sec = time {
        Cdc.mergeIntoStore(images(2), store, Seq("o_orderkey"), "o_orderdate")
      }
      emit("cdc_merge", f, sec, s""","touched_buckets":$touched""")
    } }

    // ---- AggView: incremental grouped view vs base history ------------
    // History unit = 15k keyed images over a 100-group domain. Timed
    // batch = 200 fresh-key images: deltas touch ≤ 200 keys' buckets in
    // the base and ≤ 100 groups in the view.
    def imgs(keyLo: Long, n: Int, seq: Long) =
      spark.range(keyLo, keyLo + n).select(col("id").as("k"),
        concat(lit("g"), pmod(col("id"), lit(100L))).as("g"),
        (col("id") % 1000L).as("v"), lit(seq).as("seq"))
    section("aggview") { factors.foreach { f =>
      val store = s"/tmp/graft-inc-av-$f"
      val view = s"/tmp/graft-inc-av-view-$f"
      deleteDir(spark, store); deleteDir(spark, view)
      deleteDir(spark, AggView.walDir(view))
      (0 until f).foreach { k =>
        AggView.mergeWithView(imgs(k * 1000000L, 15000, k + 1), store, view,
          Seq("k"), "seq", Seq("g"), Seq("v"), numBuckets = 64)
      }
      AggView.mergeWithView(imgs(900000000L, 200, 1000L), store, view,
        Seq("k"), "seq", Seq("g"), Seq("v")) // warm
      val sec = time {
        AggView.mergeWithView(imgs(910000000L, 200, 1001L), store, view,
          Seq("k"), "seq", Seq("g"), Seq("v"))
      }
      emit("aggview_merge", f, sec)
    } }

    // ---- PqIndexFeed: encode increment vs code-store history ----------
    // History unit = the 2k sf0.1 embeddings, vec_id-shifted per copy.
    // Timed batch = 100 fresh vectors. The encode stage reads NO history
    // by construction (frozen-codebook broadcast join over the batch);
    // the only history touch is the replay anti-join against ≤100
    // touched buckets — the flattest possible incremental shape.
    section("pqfeed") { factors.foreach { f =>
      val store = s"/tmp/graft-inc-pq-$f"
      deleteDir(spark, store)
      graft.streaming.PqIndexFeed.init(
        ScaleProbe.scaledEmbeddings(spark, base, 1), store)
      (1 until f).foreach { k =>
        graft.streaming.PqIndexFeed.applyBatch(
          ScaleProbe.scaledEmbeddings(spark, base, k + 1)
            .filter(col("vec_id") >= k * 100000000L), store)
      }
      def fresh(seed: Long) = spark.range(100).select(
        (col("id") + 900000000L + seed * 1000L).as("vec_id"),
        transform(sequence(lit(1), lit(graft.ext.Ivf.Dim)),
          i => pmod(xxhash64(col("id") * lit(seed), i), lit(1000L)).cast("float") / 500.0f - 1.0f)
          .as("embedding"))
      graft.streaming.PqIndexFeed.applyBatch(fresh(1), store)
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        graft.streaming.PqIndexFeed.applyBatch(fresh(2), store)
          .write.format("noop").mode("overwrite").save()
      }
      emit("pqfeed_apply", f, sec)
    } }

    // ---- KmvFeed: sketch merge increment vs event history -------------
    // History unit = the sf0.1 events (10k rows), user-shifted per copy
    // (each unit contributes 150 fresh users per type). Timed batch =
    // 2,000 fresh-user events. The claim is the degenerate best case of
    // the incremental family: the store after ANY history is ≤ 5 keys ×
    // 32 longs, so the batch cost CANNOT grow with history — this row
    // demonstrates the mergeable-sketch contract the KmvFeed scaladoc
    // states, where BlockDedupFeed/Cdc must engineer bucket pruning to
    // approximate it.
    section("kmv") { factors.foreach { f =>
      val dir = s"/tmp/graft-inc-kmv-$f"
      deleteDir(spark, dir)
      var store: DataFrame =
        Seq.empty[(String, Array[Long])].toDF("event_type", "mins")
      (0 until f).foreach { k =>
        val unit = ScaleProbe.scaledEvents(spark, base, k + 1)
          .filter(col("user_id") >= k * 100000000L) // copy k only
        KmvFeed.applyBatch(store, unit)
          .write.mode("overwrite").parquet(s"$dir/sketch.parquet")
        store = spark.read.parquet(s"$dir/sketch.parquet")
      }
      // Fresh events reuse the store's REAL event_type values, so the
      // timed applyBatch exercises the sketch-MERGE path (new users
      // folding into existing per-type sketches) — disjoint t0..t4 types
      // would time fresh-key sketch creation plus store pass-through
      // instead, a weaker claim than the merge-increment one.
      val storeTypes = Tables.events(spark, base)
        .select(col("event_type")).distinct().as[String].collect().sorted
      def fresh(seed: Long) = spark.range(2000).select(
        (col("id") * 7919L + seed * 1000000L + 900000000L).as("user_id"),
        element_at(
          array(storeTypes.map(lit): _*),
          (pmod(col("id"), lit(storeTypes.length.toLong)) + 1).cast("int")
        ).as("event_type"))
      KmvFeed.applyBatch(store, fresh(1))
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        KmvFeed.applyBatch(store, fresh(2))
          .write.format("noop").mode("overwrite").save()
      }
      emit("kmvfeed_apply", f, sec)
    } }

    // ---- CMS feed: grid merge vs accumulated history ------------------
    // KmvFeed's sibling: the store after ANY history is ≤ 5 types × 48
    // cell rows (counters, not keys), so like kmv this is the degenerate
    // best case — the timed batch exercises the vector-ADD path into
    // cells that every history unit has already touched.
    section("cms") { factors.foreach { f =>
      val dir = s"/tmp/graft-inc-cms-$f"
      deleteDir(spark, dir)
      var store: DataFrame =
        Seq.empty[(String, Long, Long)].toDF("event_type", "idx", "c")
      (0 until f).foreach { k =>
        val unit = ScaleProbe.scaledEvents(spark, base, k + 1)
          .filter(col("user_id") >= k * 100000000L) // copy k only
        CmsFeed.applyBatch(store, unit)
          .write.mode("overwrite").parquet(s"$dir/grid.parquet")
        store = spark.read.parquet(s"$dir/grid.parquet")
      }
      val storeTypes = Tables.events(spark, base)
        .select(col("event_type")).distinct().as[String].collect().sorted
      def fresh(seed: Long) = spark.range(2000).select(
        (col("id") * 7919L + seed * 1000000L + 900000000L).as("user_id"),
        element_at(
          array(storeTypes.map(lit): _*),
          (pmod(col("id"), lit(storeTypes.length.toLong)) + 1).cast("int")
        ).as("event_type"))
      CmsFeed.applyBatch(store, fresh(1))
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        CmsFeed.applyBatch(store, fresh(2))
          .write.format("noop").mode("overwrite").save()
      }
      emit("cmsfeed_apply", f, sec)
    } }

    // ---- BitmapFeed: exact word-table merge vs accumulated history ----
    // The EXACT end of the kmv/cms trade: the store grows with distinct
    // users / 64 (one long per occupied word), so unlike the two sketch
    // rows the history axis DOES grow state — the claim under test is
    // that the per-batch cost rides the TOUCHED words (batch-sized),
    // not the store width: the merge is one (type, word) hash agg whose
    // store side is a column-pruned scan, no shuffle of untouched words'
    // bit population into the batch's partitions beyond the agg itself.
    section("bitmap") { factors.foreach { f =>
      val dir = s"/tmp/graft-inc-bitmap-$f"
      deleteDir(spark, dir)
      var store: DataFrame =
        Seq.empty[(String, Long, Long)].toDF("event_type", "word_idx", "word")
      (0 until f).foreach { k =>
        val unit = ScaleProbe.scaledEvents(spark, base, k + 1)
          .filter(col("user_id") >= k * 100000000L) // copy k only
        BitmapFeed.applyBatch(store, unit)
          .write.mode("overwrite").parquet(s"$dir/words.parquet")
        store = spark.read.parquet(s"$dir/words.parquet")
      }
      val storeTypes = Tables.events(spark, base)
        .select(col("event_type")).distinct().as[String].collect().sorted
      def fresh(seed: Long) = spark.range(2000).select(
        (col("id") * 7919L + seed * 1000000L + 900000000L).as("user_id"),
        element_at(
          array(storeTypes.map(lit): _*),
          (pmod(col("id"), lit(storeTypes.length.toLong)) + 1).cast("int")
        ).as("event_type"))
      BitmapFeed.applyBatch(store, fresh(1))
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        BitmapFeed.applyBatch(store, fresh(2))
          .write.format("noop").mode("overwrite").save()
      }
      emit("bitmapfeed_apply", f, sec)
    } }

    // ---- TrailingFeed: rolling-WAU increment vs stream AGE ------------
    // History unit = the full sf0.1 event log time-shifted 8 weeks
    // forward per epoch, so after f epochs the stream has covered ~8f
    // calendar weeks. The claim under test is RETIREMENT: the store
    // holds only the trailing WindowWeeks weeks no matter how long the
    // stream has run, so a fresh batch's merge cost must be FLAT in f —
    // the property an unbounded BitmapFeed store cannot offer.
    section("trailing") { factors.foreach { f =>
      import graft.streaming.TrailingFeed
      val dir = s"/tmp/graft-inc-trailing-$f"
      deleteDir(spark, dir)
      val epochUs = 8L * 604800L * 1000000L
      var store = TrailingFeed.emptyStore(spark)
      (0 until f).foreach { k =>
        val unit = Tables.events(spark, base)
          .withColumn("ts",
            timestamp_micros(unix_micros(col("ts")) + lit(k * epochUs)))
        TrailingFeed.applyBatch(store, unit)
          .write.mode("overwrite").parquet(s"$dir/weeks.parquet")
        store = spark.read.parquet(s"$dir/weeks.parquet")
      }
      val storeTypes = Tables.events(spark, base)
        .select(col("event_type")).distinct().as[String].collect().sorted
      val hwUs = store.agg(max(col("wk"))).as[java.sql.Date].head().getTime * 1000L
      // fresh events land inside the retained window (high-water week),
      // reusing the store's real event types so the merge path — not
      // fresh-key creation — is what the timer sees
      def fresh(seed: Long) = spark.range(2000).select(
        timestamp_micros(lit(hwUs) + col("id") * 1000000L).as("ts"),
        (col("id") * 7919L + seed * 1000000L).as("user_id"),
        element_at(
          array(storeTypes.map(lit): _*),
          (pmod(col("id"), lit(storeTypes.length.toLong)) + 1).cast("int")
        ).as("event_type"))
      TrailingFeed.applyBatch(store, fresh(1))
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        TrailingFeed.applyBatch(store, fresh(2))
          .write.format("noop").mode("overwrite").save()
      }
      val weeksHeld = store.select(col("wk")).distinct().count()
      emit("trailingfeed_apply", f, sec, s""","weeks_held":$weeksHeld""")
    } }

    // ---- HoltFeed: smoother state vs accumulated history --------------
    // The analytic best case alongside kmv/cms: ALL history collapses
    // into (level, trend) — 5 columns per key forever — so the timed
    // fresh batch (the next 30 complete days, reusing the store's real
    // event types so the advance path is what the timer sees) must cost
    // the same after 10 folded months as after one.
    section("holt") { factors.foreach { f =>
      import graft.streaming.HoltFeed
      val dir = s"/tmp/graft-inc-holt-$f"
      deleteDir(spark, dir)
      val monthUs = 31L * 86400L * 1000000L
      def shifted(k: Int) = Tables.events(spark, base)
        .withColumn("ts",
          timestamp_micros(unix_micros(col("ts")) + lit(k * monthUs)))
      var store: DataFrame =
        Seq.empty[(String, java.sql.Date, Long, Long, Long, Long)]
          .toDF("event_type", "last_day", "l", "b", "n_days", "n_ignored")
      (0 until f).foreach { k =>
        HoltFeed.applyBatch(store, shifted(k))
          .write.mode("overwrite").parquet(s"$dir/state.parquet")
        store = spark.read.parquet(s"$dir/state.parquet")
      }
      HoltFeed.applyBatch(store, shifted(f))
        .write.format("noop").mode("overwrite").save() // warm
      val sec = time {
        HoltFeed.applyBatch(store, shifted(f))
          .write.format("noop").mode("overwrite").save()
      }
      val daysHeld = store.agg(sum(col("n_days"))).as[Long].head()
      emit("holtfeed_apply", f, sec, s""","days_held":$daysHeld""")
    } }

    // ---- LmFeed: LM count ingest vs accumulated count history ---------
    // History unit = the 5k-doc corpus, token-renamed per copy (disjoint
    // vocabulary, so state genuinely GROWS ~linearly with f — the
    // adversarial case for a count store, unlike kmv/cms's bounded
    // sketches). Timed batch = 20 fresh docs with fresh tokens. The
    // claim: ingest aggregates the BATCH and appends its partials —
    // history is never read (the only history touch is the touched-
    // bucket manifest snapshot, O(touched-buckets) listings) — so the
    // curve must be flat while the store's key space grows 10×.
    // Compacted after seeding (the LSM posture, as bdf).
    section("lmfeed") { factors.foreach { f =>
      import graft.streaming.LmFeed
      val dir = s"/tmp/graft-inc-lm-$f"
      deleteDir(spark, dir)
      (0 until f).foreach { k =>
        LmFeed.ingest(spark, dir, renamed(s"h$k"), k, numBuckets = 64)
      }
      LmFeed.compact(spark, dir)
      LmFeed.ingest(spark, dir, freshBatch(s"w$f"), f.toLong) // warm
      val sec = time {
        LmFeed.ingest(spark, dir, freshBatch(s"t$f"), f.toLong + 1)
      }
      val vocab = LmFeed.uniCounts(spark, dir).count()
      emit("lmfeed_ingest", f, sec, s""","vocab":$vocab""")
    } }

    // ---- DsirFeed: importance-selection state vs corpus history -------
    // History unit = the 5k-doc corpus, token-renamed (disjoint feature
    // mass) and doc_id-shifted per copy (the doc-once contract). Timed
    // batch = 20 fresh docs. The claim: ingest aggregates the BATCH into
    // three O(batch)-sized partials (bucket counts bounded at 256 rows,
    // per-doc facts, universe ids) and appends — history is never read,
    // so the curve must be flat while the ingested corpus grows 10×.
    // (The SELECTED view is corpus-sized on read by DSIR's semantics —
    // a new batch re-ranks everything — which is exactly the batch
    // operator's cost; the feed makes the STATE incremental.)
    section("dsirfeed") { factors.foreach { f =>
      import graft.streaming.DsirFeed
      val dir = s"/tmp/graft-inc-dsir-$f"
      deleteDir(spark, dir)
      val langs = docs.select(col("doc_id"), col("lang"))
      def hist(k: Int): DataFrame = renamed(s"h$k").join(langs, "doc_id")
        .select((col("doc_id") + k.toLong * 1000000000L).as("doc_id"),
          col("text"), col("lang"))
      (0 until f).foreach(k => DsirFeed.ingest(spark, dir, hist(k), k,
        numBuckets = 64))
      DsirFeed.compact(spark, dir)
      def fresh(tag: String, off: Long): DataFrame = freshBatch(tag)
        .select((col("doc_id") + off).as("doc_id"), col("text"),
          lit("en").as("lang"))
      DsirFeed.ingest(spark, dir, fresh(s"w$f", 900000000000L), f.toLong) // warm
      val sec = time {
        DsirFeed.ingest(spark, dir, fresh(s"t$f", 910000000000L), f.toLong + 1)
      }
      val nb = DsirFeed.bucketCounts(spark, dir).count()
      emit("dsirfeed_ingest", f, sec, s""","feature_buckets":$nb""")
    } }

    // ---- MinHashFeed: near-dup ingest vs band/shingle-index history ---
    // History unit = the 5k-doc corpus, token-renamed AND doc_id-shifted
    // per copy (disjoint shingles and unique ids — the feed's doc-once
    // contract). Timed batch = 20 docs: 10 fresh-vocab (probe-only path)
    // + 10 near-dup copies of history docs (the probe → verify → pair
    // path actually fires). 1,024 buckets, compacted after seeding (the
    // bdf LSM posture). The claim: the batch signs itself, probes ONLY
    // its bands' touched buckets, and verifies only implicated docs'
    // shingle sets — so the curve follows the touched slice, not
    // history.
    section("minhash") { factors.foreach { f =>
      import graft.streaming.MinHashFeed
      val dir = s"/tmp/graft-inc-mh-$f"
      deleteDir(spark, dir)
      def shifted(df: DataFrame, k: Int): DataFrame =
        df.select((col("doc_id") + k.toLong * 1000000000L).as("doc_id"), col("text"))
      (0 until f).foreach { k =>
        MinHashFeed.ingest(spark, dir, shifted(renamed(s"h$k"), k), k,
          numBuckets = 1024)
      }
      MinHashFeed.compact(spark, dir)
      def mixedBatch(tag: String, k: Int): DataFrame =
        freshBatch(tag)
          .select((col("doc_id") + k.toLong * 1000000000L + 500000000L).as("doc_id"),
            col("text"))
          .unionByName(shifted(renamed("h0"), k).filter(col("doc_id") % 500 === 0)
            .select((col("doc_id") + 250000000L).as("doc_id"), col("text")))
      MinHashFeed.ingest(spark, dir, mixedBatch(s"w$f", 40), f.toLong) // warm
      val sec = time {
        MinHashFeed.ingest(spark, dir, mixedBatch(s"t$f", 41), f.toLong + 1)
      }
      val nPairs = MinHashFeed.pairs(spark, dir).count()
      emit("minhash_ingest", f, sec, s""","pairs_held":$nPairs""")
    } }

    // ---- BPE depth: merge rounds at fixed corpus ----------------------
    // The 10× renamed corpus (≈ 10× vocabulary) gives the pair inventory
    // depth for 256 rounds; per-round cost must stay flat because each
    // round runs on the word table only.
    section("bpe") {
      val corpus10 = ScaleProbe.corpus(spark, base, 10).localCheckpoint()
      Seq(8, 64, 256).foreach { m =>
        val (words, tops) = graft.ext.Bpe.train(corpus10, m) // includes warm JIT from prior sizes
        val sec = time {
          val (w2, t2) = graft.ext.Bpe.train(corpus10, m)
          w2.write.format("noop").mode("overwrite").save()
          assert(t2.size == m)
        }
        assert(tops.size == m)
        words.unpersist()
        emit("bpe_train", m, sec, f""","sec_per_round":${sec / m}%.4f""")
      }
    }

    // ---- Bounded probe selection at K = 1,000 -------------------------
    // 2,000 sf0.1 vectors, c = 2 → K = 1,000 cells (cellBits 10): the
    // probe-SELECTION stage (Ivf.topNCells — the one-pass bounded-heap
    // aggregation this round replaced the collect-all-K form with) must
    // absorb a ~7× larger quantizer with O(NProbe) per-vector state.
    // Centroid TRAINING is a one-time model-build cost, not per-probe —
    // it runs outside the timer (the first probe of this round timed the
    // whole pipeline and read 74.8s, almost all of it Lloyd iterations
    // at K=1,000). Compute necessarily grows ~K (N·K distance evals);
    // the bounded aggregation keeps per-row STATE at O(NProbe), so the
    // K ratio is the expected ceiling on the time ratio.
    section("probek") {
      val emb = Tables.embeddings(spark, base)
      val vq = graft.ext.Ivf.quantized(emb).localCheckpoint()
      val bigK = graft.ext.SemDedup.cellsFor(emb.count(), c = 2)
      Seq(graft.ext.Ivf.K, bigK).distinct.foreach { k =>
        val bits = graft.ext.SemDedup.cellBitsFor(k)
        val cents = graft.ext.Ivf.refinedCentroids(vq, graft.ext.Ivf.LloydIters, k, bits)
          .localCheckpoint()
        def probeOnce(): Unit =
          graft.ext.Ivf.topNCells(vq, cents, graft.ext.SemDedup.NProbe, bits)
            .write.format("noop").mode("overwrite").save()
        probeOnce() // warm
        val sec = time(probeOnce())
        emit("probe_select", k, sec)
      }
      // The two-level hierarchy at the same large K — this timing
      // INCLUDES its own quantizer training (supers + per-super Lloyd),
      // which the flat numbers above exclude: the hierarchy's whole
      // point is that training + selection together are O(N·√K).
      def hierOnce(): Unit =
        graft.ext.Ivf.hierTopNCells(vq, bigK, graft.ext.SemDedup.NProbe)
          .write.format("noop").mode("overwrite").save()
      hierOnce() // warm
      emit("probe_select_hier", bigK, time(hierOnce()))
    }

    spark.stop()
  }
}
