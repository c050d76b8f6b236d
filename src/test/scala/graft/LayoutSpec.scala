package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness plus the measurable claim —
  * a 2-d box predicate over a z-clustered table reads a small fraction
  * of the row groups an unclustered layout reads. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("Morton code interleaves bits exactly (hand-checked values)") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 5), (65535, 65535))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): spread(3)=0b000101=5, spread(5)=0b010001=17, 5 | 17<<1 = 39
    assert(got === Seq(0L, 1L, 2L, 3L, 12L, 39L, 4294967295L))
  }

  test("inputs wider than 16 bits clamp to their low bits instead of corrupting the code") {
    val z = Seq((65536 + 3, 65536 * 4 + 5)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().head.getLong(0)
    assert(z === 39L, "overflowing bits must be masked away")
  }

  /** Rows the parquet reader actually emitted for a query = scan-node
    * numOutputRows after row-group/page pruning (the residual Filter
    * runs downstream of the scan and does not affect this metric). */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute THIS queryExecution so its metrics populate
    flattenPlan(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups for a 2-d box predicate; random layout reads everything") {
    val base = Tables.lineitem(spark, sf).select(
      datediff(col("l_shipdate"), to_date(lit("1992-01-01"))).as("day"),
      col("l_partkey").cast("int").as("part"),
      col("l_quantity"))
    val total = base.count()
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft-r").toString
    Layout.writeZOrdered(base, "day", "part", nFiles = 16, path = zDir)
    base.repartition(16).write.mode("overwrite").parquet(rDir) // round-robin: worst locality
    // A selective box in both dimensions (day domain is ~[1097, 3595],
    // part is [0, 199] at this SF): ~20% of the day axis, ~25% of part.
    val (d0, d1) = (1500, 2000)
    val (p0, p1) = (50, 100)
    def box(path: String) = spark.read.parquet(path)
      .filter(col("day").between(d0, d1) && col("part").between(p0, p1))
    val zRows = scanOutputRows(box(zDir))
    val rRows = scanOutputRows(box(rDir))
    // Identical answers...
    assert(box(zDir).count() === box(rDir).count())
    // ...but the clustered layout must let min/max stats reject most
    // row groups while the random layout reads the full table.
    assert(rRows === total, s"random layout should read everything, read $rRows of $total")
    assert(zRows <= total / 2,
      s"z-order pruned too little: read $zRows of $total rows")
    assert(zRows < rRows, "z-order must read strictly less than the random layout")
  }

  test("lexicographic sort only helps the leading column; z-order helps both") {
    val base = Tables.lineitem(spark, sf).select(
      datediff(col("l_shipdate"), to_date(lit("1992-01-01"))).as("day"),
      col("l_partkey").cast("int").as("part"))
    val total = base.count()
    val lexDir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft-z2").toString
    base.repartitionByRange(16, col("day"), col("part"))
      .sortWithinPartitions(col("day"), col("part"))
      .write.mode("overwrite").parquet(lexDir)
    Layout.writeZOrdered(base, "day", "part", nFiles = 16, path = zDir)
    // Predicate on the SECOND column only — the one a (day, part) sort
    // cannot bound per file (every file spans most of the part range).
    // ~10% of the part domain [0, 199].
    def q(path: String) = spark.read.parquet(path)
      .filter(col("part").between(100, 120))
    val lexRows = scanOutputRows(q(lexDir))
    val zRows = scanOutputRows(q(zDir))
    assert(q(lexDir).count() === q(zDir).count())
    assert(zRows < lexRows,
      s"z-order must out-prune lexicographic on the trailing dimension: z=$zRows lex=$lexRows total=$total")
  }
}
