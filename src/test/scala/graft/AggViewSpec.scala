package graft

import graft.streaming.{AggView, Cdc}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Delta-maintained aggregate view over the bucketed CDC store: the
  * incremental path must equal a full recompute from the final store
  * after every batch, under inserts, value updates, cross-group moves,
  * stale images, order ties, and group extinction — and must leave
  * view buckets its deltas don't hash into byte-identical on disk. */
class AggViewSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  private val keys = Seq("k")
  private val groupCols = Seq("g")
  private val sumCols = Seq("v")

  private def img(rows: (Long, String, Long, Long)*): DataFrame =
    rows.toDF("k", "g", "v", "seq")

  private def recompute(store: String): Seq[(String, Long, Long)] =
    Cdc.readStore(spark, store).groupBy($"g")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq

  private def view(viewDir: String): Seq[(String, Long, Long)] =
    AggView.readView(spark, viewDir).orderBy($"g")
      .select($"g", $"cnt", $"sum_v").as[(String, Long, Long)].collect().toSeq

  test("incremental view equals recompute across inserts/updates/moves/stale/ties/extinction") {
    val store = tmpDir("av-store") + "/base"
    val viewDir = tmpDir("av-view") + "/view"
    def step(b: DataFrame): Unit =
      AggView.mergeWithView(b, store, viewDir, keys, "seq", groupCols, sumCols)

    // batch 1: seed
    step(img((1L, "A", 10L, 1L), (2L, "A", 20L, 1L), (3L, "B", 30L, 1L), (4L, "C", 5L, 1L)))
    assert(view(viewDir) === Seq(("A", 2L, 30L), ("B", 1L, 30L), ("C", 1L, 5L)))
    assert(view(viewDir) === recompute(store))

    // batch 2: cross-group move (k=2 A→B), stale image (k=3 seq 0 must
    // not apply), insert (k=5), same-group value update (k=4)
    step(img((2L, "B", 25L, 2L), (3L, "B", 999L, 0L), (5L, "A", 7L, 1L), (4L, "C", 6L, 2L)))
    assert(view(viewDir) === Seq(("A", 2L, 17L), ("B", 2L, 55L), ("C", 1L, 6L)))
    assert(view(viewDir) === recompute(store))

    // batch 3: order tie on k=1 (incoming wins, v 10→11) and group
    // extinction (k=4 C→D leaves C empty → C's view row is dropped)
    step(img((1L, "A", 11L, 1L), (4L, "D", 6L, 3L)))
    assert(view(viewDir) === Seq(("A", 2L, 18L), ("B", 2L, 55L), ("D", 1L, 6L)))
    assert(view(viewDir) === recompute(store))

    // recovery path: rebuilding from the base store gives the same view
    AggView.rebuild(spark, store, viewDir, groupCols, sumCols)
    assert(view(viewDir) === Seq(("A", 2L, 18L), ("B", 2L, 55L), ("D", 1L, 6L)))
  }

  test("a batch's deltas rewrite only the view buckets its groups hash into") {
    val store = tmpDir("av2-store") + "/base"
    val viewDir = tmpDir("av2-view") + "/view"
    // many groups so several view buckets exist
    val seed = (1L to 40L).map(k => (k, s"g${k % 10}", k, 1L))
    AggView.mergeWithView(img(seed: _*), store, viewDir, keys, "seq", groupCols, sumCols)

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(viewDir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()
    // touch exactly one group (g3): its old and new images share the group
    AggView.mergeWithView(img((3L, "g3", 100L, 2L)), store, viewDir,
      keys, "seq", groupCols, sumCols)
    assert(view(viewDir) === recompute(store))
    val g3Bucket = Seq("g3").toDF("g")
      .select(pmod(xxhash64($"g"), lit(Cdc.DefaultBuckets.toLong)).cast("int"))
      .as[Int].head()
    val after = fileState()
    val untouched = before.filter { case (p, _) => !p.contains(s"b=$g3Bucket") }
    assert(untouched.nonEmpty, "test needs at least one untouched view bucket")
    untouched.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"untouched view bucket changed: $p")
    }
  }

  test("crash between base merge and view apply: replay converges without manual rebuild") {
    val store = tmpDir("av4-store") + "/base"
    val viewDir = tmpDir("av4-view") + "/view"
    AggView.mergeWithView(img((1L, "A", 10L, 1L), (2L, "B", 20L, 1L)),
      store, viewDir, keys, "seq", groupCols, sumCols, batchId = 0L)
    assert(view(viewDir) === recompute(store))

    // batch 1 dies in the round-5 lost-delta window: base merged, view not
    val b1 = img((1L, "A", 11L, 2L), (3L, "B", 5L, 1L))
    intercept[RuntimeException] {
      AggView.mergeWithView(b1, store, viewDir, keys, "seq",
        groupCols, sumCols, batchId = 1L, crashAfterMerge = true)
    }
    // the base absorbed the batch but the view is one batch behind
    assert(view(viewDir) !== recompute(store))

    // streaming re-delivers the SAME batch id; the persisted write-ahead
    // delta (not a recompute that would net to zero) brings the view up
    AggView.mergeWithView(b1, store, viewDir, keys, "seq",
      groupCols, sumCols, batchId = 1L)
    assert(view(viewDir) === recompute(store))
    assert(view(viewDir) === Seq(("A", 1L, 11L), ("B", 2L, 25L)))
    // the WAL is gone after a clean apply
    assert(!new java.io.File(AggView.walDir(viewDir)).exists())

    // replaying an already-applied batch is a no-op, and life goes on
    AggView.mergeWithView(b1, store, viewDir, keys, "seq",
      groupCols, sumCols, batchId = 1L)
    AggView.mergeWithView(img((4L, "C", 7L, 1L)), store, viewDir, keys, "seq",
      groupCols, sumCols, batchId = 2L)
    assert(view(viewDir) === recompute(store))
    assert(view(viewDir) === Seq(("A", 1L, 11L), ("B", 2L, 25L), ("C", 1L, 7L)))
  }

  test("crash in the lost-delta window with DEFAULT batch id: retry resumes the pending id") {
    // Round-6 advice: self-assigning max+1 after a crash (base=N,
    // view=N-1, WAL=N) skipped both recovery branches — computeDeltas
    // ran against the already-merged base, netted to zero, and the view
    // permanently diverged. The self-assign path must resume id N.
    val store = tmpDir("av6-store") + "/base"
    val viewDir = tmpDir("av6-view") + "/view"
    def step(b: DataFrame, crash: Boolean = false): Unit =
      AggView.mergeWithView(b, store, viewDir, keys, "seq",
        groupCols, sumCols, crashAfterMerge = crash) // batchId defaulted
    step(img((1L, "A", 10L, 1L), (2L, "B", 20L, 1L)))
    assert(view(viewDir) === recompute(store))

    val b1 = img((1L, "A", 11L, 2L), (3L, "B", 5L, 1L))
    intercept[RuntimeException] { step(b1, crash = true) }
    assert(view(viewDir) !== recompute(store)) // base merged, view behind

    // batch-local retry of the SAME batch, still with the default id:
    // must replay the persisted delta, not compute a zero delta
    step(b1)
    assert(view(viewDir) === recompute(store))
    assert(view(viewDir) === Seq(("A", 1L, 11L), ("B", 2L, 25L)))
    assert(!new java.io.File(AggView.walDir(viewDir)).exists())

    // and new work proceeds with a fresh id afterwards
    step(img((4L, "C", 7L, 1L)))
    assert(view(viewDir) === Seq(("A", 1L, 11L), ("B", 2L, 25L), ("C", 1L, 7L)))
    assert(view(viewDir) === recompute(store))
  }

  test("crash mid-apply (APPLYING marker up): replay auto-rebuilds the view") {
    val store = tmpDir("av5-store") + "/base"
    val viewDir = tmpDir("av5-view") + "/view"
    AggView.mergeWithView(img((1L, "A", 10L, 1L), (2L, "B", 20L, 1L)),
      store, viewDir, keys, "seq", groupCols, sumCols, batchId = 0L)

    // simulate a crash after the apply STARTED: WAL + marker present and
    // the view half-written (we corrupt it by dropping a row's worth —
    // any partial state must be repaired, not patched)
    val b1 = img((3L, "C", 9L, 1L))
    intercept[RuntimeException] {
      AggView.mergeWithView(b1, store, viewDir, keys, "seq",
        groupCols, sumCols, batchId = 1L, crashAfterMerge = true)
    }
    AggView.writeStamp(spark, AggView.walDir(viewDir), "APPLYING", 1L)

    AggView.mergeWithView(b1, store, viewDir, keys, "seq",
      groupCols, sumCols, batchId = 1L)
    assert(view(viewDir) === recompute(store))
    assert(view(viewDir) === Seq(("A", 1L, 10L), ("B", 1L, 20L), ("C", 1L, 9L)))
    assert(!new java.io.File(AggView.walDir(viewDir)).exists())
  }

  test("min/max maintenance: inserts are delta-only, extremum retraction converges via bounded rescan") {
    val store = tmpDir("av7-store") + "/base"
    val viewDir = tmpDir("av7-view") + "/view"
    def step(b: DataFrame): Unit =
      AggView.mergeWithView(b, store, viewDir, keys, "seq",
        groupCols, sumCols, minMaxCols = Seq("v"))
    def viewMM: Seq[(String, Long, Long, Long, Long)] =
      AggView.readView(spark, viewDir).orderBy($"g")
        .select($"g", $"cnt", $"sum_v", $"max_v", $"min_v")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    def recomputeMM: Seq[(String, Long, Long, Long, Long)] =
      Cdc.readStore(spark, store).groupBy($"g")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
          max($"v").as("max_v"), min($"v").as("min_v"))
        .orderBy($"g").as[(String, Long, Long, Long, Long)].collect().toSeq

    // seed: A{10,20}, B{30}
    step(img((1L, "A", 10L, 1L), (2L, "A", 20L, 1L), (3L, "B", 30L, 1L)))
    assert(viewMM === Seq(("A", 2L, 30L, 20L, 10L), ("B", 1L, 30L, 30L, 30L)))
    // insert raising A's max — the delta-only direction
    step(img((4L, "A", 25L, 1L)))
    assert(viewMM === recomputeMM)
    assert(viewMM.head === (("A", 3L, 55L, 25L, 10L)))
    // RETRACT A's max: the row holding 25 drops to 5 — the view must
    // converge to the surviving max (20), which only a rescan knows
    step(img((4L, "A", 5L, 2L)))
    assert(viewMM === recomputeMM)
    assert(viewMM.head === (("A", 3L, 35L, 20L, 5L)))
    // retract A's min the same way (5 -> 15): new min is 10
    step(img((4L, "A", 15L, 3L)))
    assert(viewMM === recomputeMM)
    assert(viewMM.head === (("A", 3L, 45L, 20L, 10L)))
    // group-key move that retracts the source group's max: k=2 (A's 20)
    // moves to B; A rescans to 15, B extends delta-only to 30/20... and
    // B's max stays 30 (insert below current max, no rescan needed)
    step(img((2L, "B", 20L, 2L)))
    assert(viewMM === recomputeMM)
    assert(viewMM === Seq(("A", 2L, 25L, 15L, 10L), ("B", 2L, 50L, 30L, 20L)))
    // extremum retracted AND re-established in the same batch (k=1 value
    // 10 -> 40 raises the max; k=4's 15 was the max witness? no — cover
    // the tie case: remove a duplicated extremum witness)
    step(img((5L, "A", 15L, 1L))) // A now {10, 15, 15}: max 15 twice
    step(img((5L, "A", 12L, 2L))) // retract ONE witness; max must stay 15
    assert(viewMM === recomputeMM)
    assert(viewMM.head === (("A", 3L, 37L, 15L, 10L)))
  }

  test("min/max retraction rescans touched groups only — other view buckets stay byte-identical") {
    val store = tmpDir("av8-store") + "/base"
    val viewDir = tmpDir("av8-view") + "/view"
    val seed = (1L to 40L).map(k => (k, s"g${k % 10}", k, 1L))
    AggView.mergeWithView(img(seed: _*), store, viewDir, keys, "seq",
      groupCols, sumCols, minMaxCols = Seq("v"))
    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(viewDir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()
    // g3's max is k=33 (v=33); retract it to 1 — rescan path, one group
    AggView.mergeWithView(img((33L, "g3", 1L, 2L)), store, viewDir,
      keys, "seq", groupCols, sumCols, minMaxCols = Seq("v"))
    val got = AggView.readView(spark, viewDir).filter($"g" === "g3")
      .select($"cnt", $"sum_v", $"max_v", $"min_v")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((4L, 40L, 23L, 1L))) // {3, 13, 23, 1}
    // a full rebuild would rewrite every bucket; the rescan must not
    val g3Bucket = Seq("g3").toDF("g")
      .select(pmod(xxhash64($"g"), lit(Cdc.DefaultBuckets.toLong)).cast("int"))
      .as[Int].head()
    val after = fileState()
    val untouched = before.filter { case (p, _) => !p.contains(s"b=$g3Bucket") }
    assert(untouched.nonEmpty)
    untouched.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"untouched view bucket changed: $p")
    }
  }

  test("NULL group key is one group on the min/max path too (join null-rejection fixed)") {
    // groupBy treats NULL as a regular group; the min/max path's joins
    // must match it with null-safe equality or the null group splits
    // into duplicate view rows (full-outer apply) and vanishes from
    // rebuilds (inner join).
    val store = tmpDir("av10-store") + "/base"
    val viewDir = tmpDir("av10-view") + "/view"
    val ng: String = null
    def step(b: DataFrame): Unit =
      AggView.mergeWithView(b, store, viewDir, keys, "seq",
        groupCols, sumCols, minMaxCols = Seq("v"))
    def viewMM: Seq[(String, Long, Long, Long, Long)] =
      AggView.readView(spark, viewDir).orderBy($"g")
        .select($"g", $"cnt", $"sum_v", $"max_v", $"min_v")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    def recomputeMM: Seq[(String, Long, Long, Long, Long)] =
      Cdc.readStore(spark, store).groupBy($"g")
        .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
          max($"v").as("max_v"), min($"v").as("min_v"))
        .orderBy($"g").as[(String, Long, Long, Long, Long)].collect().toSeq

    step(img((1L, "A", 10L, 1L), (2L, ng, 7L, 1L), (3L, ng, 9L, 1L)))
    assert(viewMM === Seq((ng, 2L, 16L, 9L, 7L), ("A", 1L, 10L, 10L, 10L)))
    assert(viewMM === recomputeMM)
    // delta-only insert into the null group
    step(img((4L, ng, 20L, 1L)))
    assert(viewMM === recomputeMM)
    // retract the null group's max (20 -> 2): rescan must find 9
    step(img((4L, ng, 2L, 2L)))
    assert(viewMM === recomputeMM)
    assert(viewMM.head === ((ng, 3L, 18L, 9L, 2L)))
    // and a rebuild keeps the null group (inner joins were the trap)
    AggView.rebuild(spark, store, viewDir, groupCols, sumCols,
      minMaxCols = Seq("v"))
    assert(viewMM === recomputeMM)
  }

  test("min/max survives the lost-delta crash window via the WAL") {
    val store = tmpDir("av9-store") + "/base"
    val viewDir = tmpDir("av9-view") + "/view"
    AggView.mergeWithView(img((1L, "A", 10L, 1L), (2L, "A", 20L, 1L)),
      store, viewDir, keys, "seq", groupCols, sumCols,
      batchId = 0L, minMaxCols = Seq("v"))
    val b1 = img((2L, "A", 5L, 2L)) // retracts A's max
    intercept[RuntimeException] {
      AggView.mergeWithView(b1, store, viewDir, keys, "seq", groupCols,
        sumCols, batchId = 1L, crashAfterMerge = true, minMaxCols = Seq("v"))
    }
    AggView.mergeWithView(b1, store, viewDir, keys, "seq", groupCols,
      sumCols, batchId = 1L, minMaxCols = Seq("v"))
    val got = AggView.readView(spark, viewDir)
      .select($"g", $"cnt", $"sum_v", $"max_v", $"min_v")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 2L, 15L, 10L, 5L)))
  }

  test("streaming entry: runCdcWithView maintains base + view from file drops") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("v", LongType), StructField("seq", LongType)))
    val drop = tmpDir("av3-drop"); val cp = tmpDir("av3-cp")
    val store = tmpDir("av3-store") + "/base"
    val viewDir = tmpDir("av3-view") + "/view"
    img((1L, "A", 10L, 1L), (2L, "B", 20L, 1L))
      .coalesce(1).write.mode("append").parquet(drop)
    AggView.runCdcWithView(spark, drop, schema, store, viewDir, cp,
      keys, "seq", groupCols, sumCols).awaitTermination()
    img((2L, "A", 21L, 2L), (3L, "B", 5L, 1L))
      .coalesce(1).write.mode("append").parquet(drop)
    AggView.runCdcWithView(spark, drop, schema, store, viewDir, cp,
      keys, "seq", groupCols, sumCols).awaitTermination()
    assert(view(viewDir) === Seq(("A", 2L, 31L), ("B", 1L, 5L)))
    assert(view(viewDir) === recompute(store))
  }
}
