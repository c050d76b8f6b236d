package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Embedding-space corpus QA: distance-to-centroid outlier detection —
  * the "does this embedding batch contain junk?" check run before
  * feeding vectors to clustering / dedup / retrieval (encoder crashes,
  * zero vectors, wrong-modality rows all land far from the mass).
  *
  * Everything happens in x12's fixed-point integer domain
  * ([[Ivf.quantized]]: floor(x·2^20) — exact in IEEE), so the DuckDB
  * oracle replays the whole computation bit-exactly: the global
  * centroid is the element-wise floor-mean (the [[Ivf.VectorMeanFloor]]
  * typed Aggregator — partition-order-independent integer sums), each
  * vector's dist² to it is an exact long, and the outlier cut compares
  * against 2× the floor-mean of all dist²s — integer thresholding, no
  * quantile sort anywhere.
  *
  * Scale shape: one pass computes per-dim sums (a single agg whose
  * state is dim longs), the 1-row centroid broadcasts back for a
  * map-side distance, and the 1-row mean-dist² scalar broadcasts for
  * the flag — the corpus shuffles ZERO times; both reductions are
  * all-to-one aggregates with constant-size state. At 100 TB this is
  * two streaming passes (or one, fusing dist² into a re-read of the
  * cached quantized frame). */
object Outlier {

  private def distSql = Ivf.sqDistSql("v.q", "c.cq")

  val embeddingOutliers = Q.withOracle(
    "x47_embedding_outliers",
    "x47: integer dist^2 to the global floor-mean centroid; flag > 2x mean dist^2",
    s"""WITH vq AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * ${Ivf.Scale}) AS BIGINT)) AS q
       |  FROM embeddings),
       |sums AS MATERIALIZED (
       |  SELECT t.i AS i, SUM(v.q[t.i]) AS s, COUNT(*) AS cnt
       |  FROM vq v CROSS JOIN generate_series(1, ${Ivf.Dim}) t(i)
       |  GROUP BY t.i),
       |cent AS MATERIALIZED (
       |  SELECT list(CAST(floor(CAST(s AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cq
       |  FROM sums),
       |d AS MATERIALIZED (
       |  SELECT v.vec_id, $distSql AS dist2
       |  FROM vq v CROSS JOIN cent c),
       |m AS (SELECT CAST(floor(CAST(SUM(dist2) AS DOUBLE) / COUNT(*)) AS BIGINT) AS md
       |      FROM d)
       |SELECT d.vec_id, CAST(d.dist2 AS BIGINT) AS dist2,
       |  d.dist2 > 2 * m.md AS outlier
       |FROM d CROSS JOIN m
       |ORDER BY d.vec_id""".stripMargin) { (s, dir) =>
    pipeline(Tables.embeddings(s, dir))
  }

  /** The full detector over an arbitrary (vec_id, embedding) frame.
    * On the clean synthetic corpus the flag never fires — high-dim
    * concentration of measure puts every random vector at ~the same
    * distance from the centroid (measured max/mean dist² = 1.02 at
    * sf0.1), which is exactly why a 2× cut is a safe junk detector:
    * OutlierSpec plants the junk (runaway norms, one-hot spikes) and
    * pins that it alone trips. (A zero vector lands NEAR the centroid
    * of a direction-balanced corpus — catching those is a norm check,
    * not a centroid-distance check.) */
  private[graft] def pipeline(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val vq = Ivf.quantized(e)
    // Global floor-mean centroid: the per-cell Aggregator with one cell.
    val cent = Ivf.meanByCell(vq.select(col("vec_id"), col("q"), lit(0).as("cell")))
      .select(col("q").as("cq"))
    val d = vq.crossJoin(broadcast(cent))
      .select(col("vec_id"), Ivf.sqDist(col("q"), col("cq")).as("dist2"))
    val m = d.agg(
      floor(sum(col("dist2")).cast("double") / count(lit(1))).cast("long").as("md"))
    d.crossJoin(broadcast(m))
      .select(col("vec_id"), col("dist2"), (col("dist2") > lit(2) * col("md")).as("outlier"))
      .orderBy(col("vec_id"))
  }

  /** x84: robust (median/MAD) outlier scoring per event type — the
    * value-space sibling of x47's embedding-space cut, using the robust
    * statistics an anomaly pipeline actually deploys (mean/stddev are
    * poisoned by the very outliers they're meant to find; a14 carries
    * them for reporting, this carries the robust pair for the CUT).
    *
    * Determinism without decimals: nothing here SUMS floats — medians
    * interpolate identical doubles identically on both engines (the a17
    * dyadic argument), |value − med| is one IEEE subtract on identical
    * inputs, and the 3·MAD threshold is one multiply + strict compare.
    * Scale shape: percentile aggregates per type (the a17 posture) with
    * the per-type medians broadcast back for the deviation pass — two
    * scans of events, one broadcast equi-join, zero windows. */
  val madOutliers = Q.withOracle(
    "x84_mad_outliers",
    "x84: per-type median + MAD + 3-MAD outlier counts (robust statistics)",
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.50) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(dev, 0.50) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(d.med) AS med, MIN(m.mad) AS mad,
      |  CAST(COUNT(*) FILTER (WHERE d.dev > 3 * m.mad) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.50)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("dev"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.50)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        count(when(col("dev") > lit(3.0) * col("mad"), 1)).cast("long").as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(embeddingOutliers, madOutliers)
}
