package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** x66: KMV (k-minimum-values) distinct-count sketch — the ORACLE-EXACT
  * cardinality sketch, complementing a1b's HLL row (which is inherently
  * no_oracle). The estimator (Bar-Yossef et al., RANDOM'02): hash every
  * value into [0, P), keep the k smallest DISTINCT hashes per group; if
  * h_k is the k-th smallest, the distinct count ≈ (k−1) · P / h_k.
  * Every step here is integer arithmetic — the Knuth multiplicative hash
  * shared with x26/x44 and one integer division — so DuckDB replays the
  * sketch bit-for-bit and the driver hash-compare holds EXACTLY, not
  * within-tolerance: the one sketch in the registry whose error is
  * oracle-pinned rather than spec-pinned.
  *
  * Scale shape — why this beats `COUNT(DISTINCT)` at 100 TB: the state
  * is the [[Kmv.BoundedDistinctMinK]] typed Aggregator — a sorted
  * distinct array CAPPED AT k, partial-aggregable map-side — so each
  * partition ships ≤ k longs per group key and the exchange never
  * carries the value universe (an exact distinct shuffles every distinct
  * value; a 10⁹-user log shuffles 10⁹ rows vs k=32 here). The exact
  * count is computed alongside ONLY because this is the QA query that
  * certifies the estimator; production drops that column and with it the
  * full-width shuffle.
  */
object Kmv {

  /** Hash modulus/multiplier — x26's Knuth modular hash (Curation.scala
    * documents the overflow bound; identical on any engine). Shared with
    * [[graft.streaming.KmvFeed]] so the incremental sketch merges into
    * the same hash space. */
  private[graft] val P = 1000003L
  private[graft] val Kn = 2654435761L % P // = 427799
  /** Sketch size: 32 mins → ~18% standard error, the textbook k/ε² rule. */
  private[graft] val SketchK = 32

  /** The sketch hash as a Column (shared batch/streaming). */
  private[graft] def hashCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((c % P) * Kn) % P

  /** (h_k, estimate) read off a sorted distinct min-k buffer; None while
    * the group holds fewer than k distinct hashes (the buffer IS the
    * exact set there). Integer division matches the oracle's `//`. */
  private[graft] def estimate(mins: Array[Long]): Option[(Long, Long)] =
    if (mins.length < SketchK) None
    else Some((mins(SketchK - 1), (SketchK - 1) * P / mins(SketchK - 1)))

  /** Bounded DISTINCT smallest-k collector over longs — [[Ivf]]'s
    * BoundedMinN with duplicate suppression (KMV is defined over the
    * distinct hash set; an exact-match probe in the binary search is
    * what makes pre-deduplication — and its corpus-wide shuffle —
    * unnecessary). State is a sorted ≤ k array; reduce is binary-search
    * + arraycopy; merges concatenate two ≤ k arrays. */
  final class BoundedDistinctMinK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    private def insert(b: Array[Long], v: Long): Array[Long] = {
      if (b.length == k && v >= b(k - 1)) return b
      val i = java.util.Arrays.binarySearch(b, v)
      if (i >= 0) return b // already present: KMV state is a SET
      val ins = -i - 1
      val len = math.min(b.length + 1, k)
      val out = new Array[Long](len)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(b, ins, out, ins + 1, len - ins - 1)
      out
    }
    override def reduce(b: Array[Long], a: Long): Array[Long] = insert(b, a)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      y.foldLeft(x)(insert)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = Kmv.arrayLongEnc
    override def outputEncoder: Encoder[Array[Long]] = Kmv.arrayLongEnc
  }

  private val arrayLongEnc: Encoder[Array[Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Array[Long]]()
  }

  private def kmvOracle: String =
    s"""WITH h AS MATERIALIZED (
       |  SELECT DISTINCT event_type,
       |    ((user_id % $P) * $Kn) % $P AS h
       |  FROM events),
       |r AS MATERIALIZED (
       |  SELECT event_type, h,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |x AS MATERIALIZED (
       |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type)
       |SELECT x.event_type, x.n_exact, k.h AS h_k,
       |  (${SketchK - 1} * $P) // k.h AS est_kmv
       |FROM x LEFT JOIN (SELECT event_type, h FROM r WHERE rn = $SketchK) k
       |  USING (event_type)
       |ORDER BY x.event_type""".stripMargin

  /** x66: per-event-type distinct-user estimate from a k=32 KMV sketch,
    * alongside the exact count that certifies it. h_k/est are NULL when
    * a group holds fewer than k distinct hashes (the sketch IS the exact
    * set there — small groups read the exact column). */
  val kmvDistinct = Q.withOracle(
    "x66_kmv_distinct",
    s"x66: KMV (k=$SketchK) distinct-user sketch per event_type, oracle-exact",
    kmvOracle) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val mins = ev
      .select(col("event_type"), hashCol(col("user_id")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new BoundedDistinctMinK(SketchK).toColumn.name("mins"))
      .toDF("event_type", "mins")
      .select(col("event_type"),
        when(size(col("mins")) === SketchK,
          element_at(col("mins"), SketchK)).as("h_k"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).cast("long").as("n_exact"))
    exact.join(mins, Seq("event_type"), "left")
      .select(col("event_type"), col("n_exact"), col("h_k"),
        // integer div, matching DuckDB's `//` (both truncate toward zero)
        expr(s"${(SketchK - 1) * P} div h_k").as("est_kmv"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(kmvDistinct)
}
