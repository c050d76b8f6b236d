package graft

import graft.streaming.BlockDedupFeed
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental block dedup: the streaming face of x43. The load-bearing
  * claims — increment-equals-batch, replay idempotence, append-only
  * index — each get a direct check. */
class BlockDedupFeedSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("blockdedup").toString

  private def docsOf(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("processing batches incrementally equals batch x43 on the concatenation") {
    val idx = tmp()
    // 10-token blocks; doc 3 repeats doc 1's first block, doc 5 repeats
    // a block from its own batch and one from an earlier batch
    val blkA = (1 to 10).map(i => s"a$i").mkString(" ")
    val blkB = (1 to 10).map(i => s"b$i").mkString(" ")
    val blkC = (1 to 10).map(i => s"c$i").mkString(" ")
    val b1 = docsOf(1L -> s"$blkA $blkB", 2L -> blkC)
    val b2 = docsOf(3L -> s"$blkA $blkC", 4L -> s"d1 d2 d3")
    val b3 = docsOf(5L -> s"$blkB d1 d2 d3")
    val streamed = Seq(b1, b2, b3)
      .map(BlockDedupFeed.applyBatch(_, idx))
      .reduce(_ unionByName _)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = graft.ext.Rewrite.pipeline(b1.unionByName(b2).unionByName(b3))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    // and the duplicates were actually removed across batches
    val byId = streamed.map(r => r._1 -> r).toMap
    assert(byId(3L)._3 == 0L, "doc 3 is all re-delivered blocks")
    assert(byId(5L)._4 == "", "doc 5's blocks all arrived earlier")
  }

  test("reads tolerate rebuild-resurrected orphan twins; compaction heals them") {
    val idx = tmp()
    val b1 = docsOf(1L -> (1 to 20).map(i => s"w$i").mkString(" "))
    val b2 = docsOf(2L -> ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"z$i")).mkString(" "))
    BlockDedupFeed.applyBatch(b1, idx).collect()
    val first = BlockDedupFeed.applyBatch(b2, idx)
      .as[(Long, Long, Long, String)].collect().toSeq
    val cleanRows = spark.read.parquet(idx).count()
    // simulate a crashed append whose orphan a later rebuildManifest
    // resurrects next to its byte-identical replayed twin: duplicate a
    // committed file inside its bucket dir, then rebuild the manifest
    val bucketDir = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("b="))
      .find(_.listFiles().exists(_.getName.endsWith(".parquet"))).get
    val src = bucketDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(src.toPath, new java.io.File(bucketDir, "part-orphan.parquet").toPath)
    graft.streaming.BucketStore.rebuildManifest(spark, idx)
    assert(spark.read.parquet(idx).count() > cleanRows,
      "the orphan twin must be physically present")
    // the duplicate-carrying index must not multiply block rows: the
    // replayed batch still reproduces the identical rewrite and appends
    // nothing (the left join sees ONE owner row per block hash)
    val replay = BlockDedupFeed.applyBatch(b2, idx)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(replay == first)
    // and compaction heals the physical duplication permanently
    BlockDedupFeed.compact(spark, idx)
    assert(spark.read.parquet(idx).count() === cleanRows)
  }

  test("replaying a batch reproduces its output and appends nothing") {
    val idx = tmp()
    val b1 = docsOf(1L -> (1 to 20).map(i => s"w$i").mkString(" "))
    val b2 = docsOf(2L -> ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"z$i")).mkString(" "))
    BlockDedupFeed.applyBatch(b1, idx).collect()
    val first = BlockDedupFeed.applyBatch(b2, idx)
      .as[(Long, Long, Long, String)].collect().toSeq
    val idxRows = spark.read.parquet(idx).count()
    val replay = BlockDedupFeed.applyBatch(b2, idx)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(replay == first, "replay must reproduce the identical rewrite")
    assert(spark.read.parquet(idx).count() == idxRows, "replay must append nothing")
  }

  test("index reads partition-prune to the batch's touched buckets; compaction bounds files-read by batch coverage") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val idx = tmp()
    // history: 6 batches, each with 4 distinct blocks -> owners spread
    // across (almost certainly) every one of the 8 default buckets, one
    // append file per touched bucket per batch
    (0 until 6).foreach { k =>
      BlockDedupFeed.applyBatch(
        docsOf((10L + k) -> (1 to 40).map(i => s"h${k}_$i").mkString(" ")), idx)
    }
    def parquetFiles(dir: java.io.File): Seq[java.io.File] =
      dir.listFiles().toSeq.flatMap {
        case d if d.isDirectory => parquetFiles(d)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Seq.empty
      }
    val allFiles = parquetFiles(new java.io.File(idx))
    // the touched-bucket set of a single-block batch, via the same
    // arithmetic applyBatch uses
    val one = docsOf(99L -> (1 to 10).map(i => s"q$i").mkString(" "))
    val touched = graft.ext.Rewrite.blockFrame(one.select($"doc_id", $"text"))
      .select(pmod(xxhash64(md5($"btxt")), lit(8L)).cast("int").as("b"))
      .distinct().as[Int].collect().toSeq
    assert(touched.size == 1)
    val pruned = BlockDedupFeed.readIndex(spark, idx, touched)
    val scanned = flattenPlan(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    assert(scanned.nonEmpty, "expected a file scan in the pruned read")
    assert(scanned.forall(_.contains(s"b=${touched.head}")),
      s"pruned read leaked outside touched buckets: ${scanned.take(3)}")
    assert(scanned.size < allFiles.size,
      "pruning read the whole index - partition filter did not engage")
    // compaction folds per-batch appends: the same pruned read is then
    // EXACTLY one file per touched bucket, independent of how many
    // batches history took
    val before = spark.read.parquet(idx).select($"bh", $"owner")
      .as[(String, Long)].collect().toSet
    BlockDedupFeed.compact(spark, idx)
    assert(spark.read.parquet(idx).select($"bh", $"owner")
      .as[(String, Long)].collect().toSet == before, "compaction changed rows")
    val prunedAfter = BlockDedupFeed.readIndex(spark, idx, touched)
    val scannedAfter = flattenPlan(prunedAfter.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    assert(scannedAfter.size == touched.size,
      s"post-compaction files-read must equal touched buckets: ${scannedAfter.size}")
    // and the feed still behaves: the new batch dedups correctly on top
    val out = BlockDedupFeed.applyBatch(one, idx)
      .as[(Long, Long, Long, String)].collect().head
    assert(out._2 == 1L && out._3 == 1L, "fresh block must be kept")
  }

  test("end-to-end stream: per-batch output dirs land, index grows append-only") {
    val in = tmp(); val idx = tmp(); val out = tmp(); val ck = tmp()
    val blk = (1 to 10).map(i => s"s$i").mkString(" ")
    // two part files in one flat dir → two micro-batches (maxFilesPerTrigger=1)
    docsOf(1L -> blk).withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("ingest_ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .coalesce(1).write.mode("append").parquet(in)
    docsOf(2L -> s"$blk t1 t2").withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("ingest_ts", lit(java.sql.Timestamp.valueOf("2026-01-01 01:00:00")))
      .coalesce(1).write.mode("append").parquet(in)
    BlockDedupFeed.run(spark, in, idx, out, ck).awaitTermination(120000)
    val all = spark.read.parquet(s"$out/batch=*")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(all.map(_._1) == Seq(1L, 2L))
    // whichever arrival order the file source chose, exactly one of the
    // two docs owns the shared block
    assert(all.map(_._3).sum == all.map(_._2).sum - 1)
    assert(spark.read.parquet(idx).count() == spark.read.parquet(idx).select("bh").distinct().count())
  }
}
