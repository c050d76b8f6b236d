package graft

/** x68 snapshot diff: the oracle replays the rollup; this pins the
  * row-level library semantics — all four classes on crafted frames,
  * null-safe comparison (null → value, value → null, null → null are
  * changed/changed/unchanged respectively), composite keys, and the
  * loud schema-mismatch guard. */
class DiffSpec extends SparkSuite {
  import spark.implicits._
  import graft.etl.Diff

  test("all four change classes, null-safe value comparison") {
    val old = Seq(
      (1L, Option("a"), Option(10.0)),  // unchanged
      (2L, Option("b"), Option(20.0)),  // changed (value)
      (3L, Option("c"), Option(30.0)),  // removed
      (4L, None: Option[String], Option(40.0)), // unchanged (null == null)
      (5L, Option("e"), None: Option[Double])   // changed (null -> value)
    ).toDF("k", "s", "v")
    val nw = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(99.0)),
      (4L, None: Option[String], Option(40.0)),
      (5L, Option("e"), Option(5.0)),
      (6L, Option("f"), Option(60.0))   // added
    ).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, nw, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("composite keys join on all parts") {
    val old = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val nw = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k1", "k2", "v")
    val got = Diff.snapshotDiff(old, nw, Seq("k1", "k2"))
      .as[(Long, String, String)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got === Map(
      (1L, "x") -> "unchanged", (1L, "y") -> "removed", (2L, "y") -> "added"))
  }

  test("x74 checksum: one flipped cell moves exactly one bucket; counts hold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cksum").toString
    def write(rows: Seq[(Long, Long, String, Double, java.sql.Timestamp, String)], d: String) =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val base = (1L to 200L).map(i => (i, i % 7, "O", i * 1.25, t0, "1-URGENT"))
    write(base, dir)
    val a = graft.etl.Diff.tableChecksum.fn(spark, dir)
      .as[(Long, Long, Long)].collect().toMap2
    val dir2 = java.nio.file.Files.createTempDirectory("graft-cksum2").toString
    write(base.map(r => if (r._1 == 42L) r.copy(_3 = "F") else r), dir2)
    val b = graft.etl.Diff.tableChecksum.fn(spark, dir2)
      .as[(Long, Long, Long)].collect().toMap2
    // row COUNT per bucket may move (the row re-hashes into another
    // bucket) but at most two buckets differ, and at least one does
    val diff = (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
    assert(diff.nonEmpty && diff.size <= 2, s"diverged buckets: $diff")
    // and the checksum is partitioning/order-invariant
    val shuffled = spark.read.parquet(s"$dir/orders.parquet").repartition(13)
    val dir3 = java.nio.file.Files.createTempDirectory("graft-cksum3").toString
    shuffled.write.parquet(s"$dir3/orders.parquet")
    val c = graft.etl.Diff.tableChecksum.fn(spark, dir3)
      .as[(Long, Long, Long)].collect().toMap2
    assert(c === a)
  }

  private implicit class Tup3Map(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("schema mismatch fails loud") {
    val old = Seq((1L, "a")).toDF("k", "s")
    val nw = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.etl.Diff.snapshotDiff(old, nw, Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }
}
