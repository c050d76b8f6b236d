package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet store: S6's version-and-swap commit grown into the
  * capabilities a snapshot store needs at scale — linear history with
  * time travel, O(1) rollback, and small-file compaction.
  *
  * Layout: `<root>/v=<n>/` parquet per version plus a one-line `_LATEST`
  * pointer file. A commit writes the new version directory FULLY, then
  * swaps the pointer — readers either see the old pointer or the new
  * one, never a half-written directory (the same two-phase shape as
  * SnapshotStore, with history retained instead of overwritten).
  * Rollback is a pointer swap to an older version; nothing is rewritten.
  *
  * Scale notes: the pointer file is the only mutable object; version
  * data is immutable-once-written, so concurrent readers never block
  * and object-store eventual consistency on the data files is harmless.
  * Compaction rewrites one version's data into `ceil(rows/target)`
  * files as a NEW version — history stays intact. */
object VersionedStore {

  private def latestFile(root: String) = new java.io.File(root, "_LATEST")

  private def versionDir(root: String, v: Int) = s"$root/v=$v"

  /** Current version number, 0 if the store is empty. */
  def latestVersion(root: String): Int = {
    val f = latestFile(root)
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toInt
    else 0
  }

  /** Commit `df` as the next version and swap the pointer; returns the
    * new version number. */
  def commit(df: DataFrame, root: String): Int = {
    val next = latestVersion(root) + 1
    df.write.mode("overwrite").parquet(versionDir(root, next))
    setLatest(root, next)
    next
  }

  /** Read the latest version, or an explicit one (time travel). */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(root))
    require(v >= 1, s"empty store at $root")
    spark.read.parquet(versionDir(root, v))
  }

  /** Roll the pointer back to an existing older version — O(1), no data
    * movement; later versions remain readable by explicit time travel. */
  def rollback(root: String, toVersion: Int): Unit = {
    require(new java.io.File(versionDir(root, toVersion)).exists(),
      s"version $toVersion does not exist under $root")
    setLatest(root, toVersion)
  }

  /** Rewrite the latest version's data into ~`targetRowsPerFile` chunks
    * as a new version — the small-file compaction a long-running
    * micro-batch writer needs (every commit of a trickle feed otherwise
    * adds a file, and 10k tiny files turn scan planning into the
    * bottleneck long before data volume does). */
  def compact(spark: SparkSession, root: String, targetRowsPerFile: Long): Int = {
    val df = read(spark, root)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    commit(df.repartition(files), root)
  }

  private def setLatest(root: String, v: Int): Unit = {
    val dir = new java.io.File(root)
    if (!dir.exists()) dir.mkdirs()
    // write-then-rename: the pointer swap itself is atomic on any POSIX
    // filesystem; on an object store this maps to a conditional put
    val tmp = new java.io.File(root, "_LATEST.tmp")
    java.nio.file.Files.write(tmp.toPath, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, latestFile(root).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
