package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) file-layout clustering — a data-LAYOUT operator, not
  * a query: it decides what the parquet row-group min/max statistics look
  * like, which decides how much of a 100 TB table a multi-dimensional
  * predicate has to read.
  *
  * Why not `sortBy(a, b)`: a lexicographic sort gives tight file stats on
  * `a` only — every file spans the full `b` range, so a predicate on `b`
  * (or a 2-d box) prunes nothing. Interleaving the bits of both columns
  * makes every file cover a small RECTANGLE of (a, b) space, so row-group
  * stats prune on either column or both (the Delta/Iceberg OPTIMIZE
  * ZORDER technique, built here from plain Column expressions).
  *
  * Scale shape: the z-value is a pure per-row bit-twiddling projection
  * (codegen'd, no UDF); the clustering write is one range shuffle on the
  * z-value — the same cost as any global sort, paid once at layout time
  * to make every later scan cheaper.
  *
  * Reference scope being re-expressed: the reference leans on Postgres
  * btree indexes for selective access (`nb` DDL, Phase1_updated.ipynb
  * cells 4-13); columnar engines answer the same need with clustering +
  * min/max pruning, and z-order is the multi-column form.
  */
object Layout {

  /** Bits kept per dimension. Two 16-bit dimensions fill 32 z-bits —
    * plenty of resolution for file-level clustering (65k cells per
    * axis); inputs are masked, so wider domains degrade gracefully to
    * their low bits rather than corrupting the interleave. */
  private val Bits = 16

  /** Spread the low 16 bits of `c` to the even bit positions of a long
    * (classic Morton spreading: widen the gaps by OR-shifting, then
    * mask). Pure integer Column arithmetic — whole-stage codegen keeps
    * this in registers. */
  /** Magic OR-shift-mask chain (shared by the Column form and x69's SQL
    * oracle generator, so the two interleaves cannot drift). */
  private[ext] val SpreadSteps =
    Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  private[ext] def spread16(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton code of two non-negative int columns: bits of `a` at even
    * positions, bits of `b` at odd. Raw form — callers with unequal
    * domains want [[writeZOrdered]], which normalizes first: if one
    * dimension spans more bits than the other, its high bits monopolize
    * the top of the code and the z-ranges degenerate to a
    * single-column sort (measured: a 12-bit day axis × 8-bit part axis
    * z-ordered raw prunes NOTHING on part-only predicates). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Morton code of k ≥ 2 dimensions: bit i of dimension d lands at z-bit
    * `i*k + d`. The magic-mask spreading above only exists for stride 2,
    * so the general form extracts-and-places each bit — `bits` OR-terms
    * per dimension, still pure integer Column arithmetic inside
    * whole-stage codegen, paid once per row at layout time. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, "z-order needs at least 2 dimensions")
    require(k * bits <= 63, s"$k dims x $bits bits overflow a long")
    cols.zipWithIndex.map { case (c, d) =>
      val x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * k + d): Column
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Affine-scale `c` from [lo, hi] onto the full `bits`-bit range so all
    * interleaved dimensions contribute equally at every bit position —
    * the same reason Delta/Iceberg z-order rank-normalizes columns. */
  private def scaleBits(c: Column, lo: Long, hi: Long, bits: Int): Column =
    (c.cast("long") - lit(lo)) * lit((1L << bits) - 1) / lit(math.max(hi - lo, 1L))

  /** The z-clustered form of `df`: each dimension normalized to the
    * per-dimension bit budget (min(16, 63/k)), range-partitioned on the
    * Morton code so each of `nFiles` output files owns a contiguous
    * z-range (a small BOX of value space), sorted within partitions so
    * row groups inside a file are tight too. The helper column never
    * reaches the caller. Returned as a frame so store lifecycles
    * ([[graft.model.VersionedStore.compact]]) can commit it through
    * their own write path.
    *
    * `bounds` — per-dimension (min, max), aligned with `cols` — lets a
    * caller that already scanned the data (compaction computes a row
    * count anyway; at 100 TB the bounds come from table/manifest stats
    * for free) skip the min/max aggregate entirely: with bounds supplied
    * this method schedules NO job, it is pure plan construction. Without
    * bounds, one min/max aggregate runs here; on empty input (null
    * mins) the frame is returned unchanged — zero rows need no
    * clustering, and scaling against null bounds would NPE. */
  def zOrderedBy(df: DataFrame, cols: Seq[String], nFiles: Int,
      bounds: Seq[(Long, Long)] = Nil): DataFrame = {
    val k = cols.size
    require(k >= 2, "z-order needs at least 2 dimensions")
    require(bounds.isEmpty || bounds.size == k,
      s"bounds must align with cols: got ${bounds.size} for $k dims")
    val bits = math.min(Bits, 63 / k)
    val bnds: Seq[(Long, Long)] =
      if (bounds.nonEmpty) bounds
      else {
        val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        // Empty input, or a dimension with no non-NULL values: no bounds
        // exist to scale against (min/max aggregates skip nulls, so ANY
        // null cell means that dimension is all-NULL — checking only
        // column 0 would misdiagnose or NPE). Return unclustered.
        if ((0 until 2 * cols.size).exists(r.isNullAt)) return df
        cols.indices.map(i => (r.getAs[Number](2 * i).longValue(),
          r.getAs[Number](2 * i + 1).longValue()))
      }
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      scaleBits(col(c), bnds(i)._1, bnds(i)._2, bits)
    }
    val z = if (k == 2) zValue(scaled(0), scaled(1)) else zValueN(scaled, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` into `nFiles` files clustered by the z-order of `cols`. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], nFiles: Int,
      path: String): Unit =
    zOrderedBy(df, cols, nFiles).write.mode("overwrite").parquet(path)

  /** Two-dimension convenience form. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String,
      nFiles: Int, path: String): Unit =
    writeZOrdered(df, Seq(c1, c2), nFiles, path)

  // ---- x69: the clustering-quality query (oracle-visible z-order) ----

  /** Day index of o_orderdate in pure integer epoch arithmetic. */
  private val DayUs = 86400000000L
  /** Bucket = z >> ZShift: 32 z-bits → ≤ 256 contiguous z-ranges, the
    * file-grain a layout write would target. */
  private val ZShift = 24

  /** The scaled-dimension SQL mirror of [[scaleBits]] + truncation:
    * the multiply stays < 2^53 (span × 65535), the division is one
    * correctly-rounded IEEE op in both engines, and FLOOR-then-CAST
    * matches Spark's double→long truncation on these non-negative
    * values (a bare DuckDB CAST would ROUND — a real divergence, found
    * by construction not by luck). */
  private def scaleSql(c: String, lo: String, hi: String): String =
    s"CAST(FLOOR(CAST(($c - $lo) AS DOUBLE) * ${(1L << Bits) - 1} / GREATEST($hi - $lo, 1)) AS BIGINT)"

  /** [[spread16]] replayed in SQL from the same [[SpreadSteps]]. */
  private def spreadSql(e: String): String =
    SpreadSteps.foldLeft(s"($e & 65535)") { case (x, (s, m)) =>
      s"((($x | ($x << $s)) & $m))"
    }

  private def zorderOracle: String = {
    val sck = scaleSql("o.ck", "b.cklo", "b.ckhi")
    val sday = scaleSql("o.day", "b.daylo", "b.dayhi")
    s"""WITH o AS MATERIALIZED (
       |  SELECT o_custkey AS ck, epoch_us(o_orderdate) // $DayUs AS day
       |  FROM orders),
       |b AS MATERIALIZED (
       |  SELECT MIN(ck) AS cklo, MAX(ck) AS ckhi,
       |         MIN(day) AS daylo, MAX(day) AS dayhi FROM o),
       |z AS (
       |  SELECT o.ck, o.day,
       |    (${spreadSql(sck)} | (${spreadSql(sday)} << 1)) >> $ZShift AS bucket
       |  FROM o CROSS JOIN b)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MAX(ck) - MIN(ck) AS ck_span,
       |  MAX(day) - MIN(day) AS day_span
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** x69: z-order clustering statistics — each contiguous z-range's row
    * count and per-dimension value span over (o_custkey, order-day).
    * This is the measurable form of the layout claim: under a
    * lexicographic sort every range spans the FULL secondary dimension;
    * under the Morton code every range is a small box of (ck, day)
    * space, which is exactly what parquet row-group min/max stats prune
    * on. LayoutSpec asserts the file-level pruning; this query makes the
    * interleave itself oracle-checked (bit-for-bit, including the
    * scale-normalization arithmetic).
    *
    * Scale shape: one 1-row bounds aggregate broadcast into a pure-map
    * z computation, one bucket-keyed aggregation — the stats pass of a
    * layout job, linear in the table with bounded output. */
  val zorderStats = graft.Q.withOracle(
    "x69_zorder_stats",
    "x69: per-z-range row counts and dimension spans over (o_custkey, order day)",
    zorderOracle) { (s, dir) =>
    val o = graft.Tables.orders(s, dir)
      .select(col("o_custkey").as("ck"),
        expr(s"unix_micros(o_orderdate) div $DayUs").as("day"))
    val b = o.agg(min(col("ck")).as("cklo"), max(col("ck")).as("ckhi"),
      min(col("day")).as("daylo"), max(col("day")).as("dayhi"))
    def scaled(c: Column, lo: Column, hi: Column): Column =
      floor((c - lo).cast("double") * lit((1L << Bits) - 1) /
        greatest(hi - lo, lit(1L)))
    val z = o.crossJoin(broadcast(b)) // 1-row bounds scalar
      .select(col("ck"), col("day"),
        shiftright(zValue(
          scaled(col("ck"), col("cklo"), col("ckhi")),
          scaled(col("day"), col("daylo"), col("dayhi"))), ZShift).as("bucket"))
    z.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        (max(col("ck")) - min(col("ck"))).as("ck_span"),
        (max(col("day")) - min(col("day"))).as("day_span"))
      .orderBy(col("bucket"))
  }

  // ---- Bucketed tables: the co-located-join layout -------------------

  /** Write `df` as a Hive-bucketed, per-bucket-sorted parquet TABLE —
    * the layout that makes a recurring equi-join on `key` SHUFFLE-FREE:
    * both sides pre-hashed into the same bucket count means Spark's
    * planner drops the Exchange on each bucketed side entirely (and with
    * `sortBy` the per-bucket sort too), turning every later sort-merge
    * join into a zip of co-located files. Z-order answers selective
    * SCANS; bucketing answers repeated JOINS — the two halves of layout
    * design at 100 TB, where re-shuffling a fact table per query is the
    * single largest avoidable cost. The price: a one-time hash shuffle
    * at write, and bucket counts must match across co-joined tables
    * (LayoutSpec pins both the dropped Exchange and the equal results).
    *
    * `saveAsTable` is required — bucket metadata lives in the catalog,
    * not the files; plain `.parquet(path)` writes would silently lose
    * the bucketing contract. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val sorted = sortCols match {
      case Nil => w
      case h +: t => w.sortBy(h, t: _*)
    }
    sorted.saveAsTable(table)
  }

  /** Target bucket count for x111's range-partition plan. */
  private val RangeBuckets = 32

  /** Segment granularity for the exact-rank scan: price pennies >> 20
    * (≈ $10.5k segments over this data's price range). */
  private val RpBktBits = 20

  /** x111: range-partition boundary planner — the layout decision that
    * precedes every big sorted write: pick $RangeBuckets split points on
    * (o_totalprice, o_orderkey) such that the buckets are balanced to
    * within one row, and report each bucket's row count and price
    * bounds. This is the plan a `repartitionByRange`/sort-order write of
    * a 100 TB table executes; skew in THIS table is skew in the write.
    *
    * Semantics are exactly SQL NTILE over the unique total order
    * (price, orderkey): with n rows, the first n mod K buckets carry
    * ⌈n/K⌉ rows, the rest ⌊n/K⌋ — the bucket index is DERIVED from the
    * exact global rank by that formula, not approximated. Bounds are
    * plain MIN/MAX (no arithmetic — bit-exact in any engine).
    *
    * Scale shape: Spark's own ntile() would be a single-partition window
    * (the planner warns exactly because it cannot scale); here the exact
    * global rank comes from the x92/x95 segmented-scan composition — a
    * per-(price-segment) row_number in parallel plus broadcast segment
    * offsets — so the only full-data shuffle is the segment hash
    * partition, and no executor ever sees more than one segment's rows
    * sorted. At 100 TB the same plan holds (segments are data-bounded);
    * a production writer that tolerates ±1% balance can swap the exact
    * rank for approx_percentile bounds, but the exact form costs one
    * shuffle either way. */
  val rangePlan = graft.Q.withOracle(
    "x111_range_plan",
    s"x111: balanced $RangeBuckets-way range-partition plan over (o_totalprice, o_orderkey)",
    s"""WITH r AS (
       |  SELECT o_totalprice AS price,
       |    NTILE($RangeBuckets) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
       |  FROM orders)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(price) AS lo_price, MAX(price) AS hi_price
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val o = graft.Tables.orders(s, dir)
      .select(col("o_totalprice").as("price"), col("o_orderkey").as("key"))
    // segment = high bits of the fixed-point price — monotone in price
    val segCol = shiftright(
      (col("price").cast("decimal(12,2)") * 100).cast("long"), RpBktBits)
    val ranked = SegmentedRank.withGlobalRank(o, segCol,
      Seq(col("price"), col("key")))
    ranked.withColumn("bucket", SegmentedRank.ntileExpr(RangeBuckets).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("price")).as("lo_price"), max(col("price")).as("hi_price"))
      .orderBy(col("bucket"))
  }

  val all: Seq[graft.Q] = Seq(zorderStats, rangePlan)
}
