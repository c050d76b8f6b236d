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

  test("schema mismatch fails loud") {
    val old = Seq((1L, "a")).toDF("k", "s")
    val nw = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.etl.Diff.snapshotDiff(old, nw, Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }
}
