package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** x65: EWMA baseline + per-event surprise — the streaming-monitoring
  * primitive (anomaly scoring against an exponentially-decaying mean)
  * replayed deterministically in batch. For each user the events fold in
  * exact (epoch-µs, event_id) order through
  *
  *   ewma ← (3·ewma + value) / 4          (α = 1/4)
  *   surprise ← max(surprise, |value − ewma_before|)
  *
  * seeded with the user's FIRST value (so the first event is never a fake
  * anomaly against a zero baseline). α = 1/4 keeps the fold inside IEEE's
  * guaranteed operations: one correctly-rounded multiply, one add, and a
  * power-of-two divide — Spark's `aggregate` and DuckDB's `list_reduce`
  * walk the identical op sequence over the identically-sorted list, so
  * the doubles are bit-equal on both engines (the x57 funnel-fold
  * pattern, extended from integer state to a struct of doubles).
  *
  * Scale shape: one user-keyed shuffle; per-user state is the sorted
  * event list (bounded by events-per-user, the same contract x57
  * documents); everything else is map-side. The streaming form of the
  * same fold is a `mapGroupsWithState` whose state is just the two
  * doubles — this batch query is its replayable oracle.
  */
object Anomaly {

  private def ewmaOracle: String =
    """WITH per AS MATERIALIZED (
      |  SELECT user_id,
      |    list_transform(
      |      list_sort(list({'us': epoch_us(ts), 'eid': event_id,
      |                      'v': CAST(value AS DOUBLE)})),
      |      r -> {'m': CAST(0.0 AS DOUBLE), 'e': r.v}) AS es
      |  FROM events GROUP BY user_id),
      |folded AS (
      |  SELECT user_id, CAST(len(es) AS BIGINT) AS n_events,
      |    list_reduce(es, (a, x) -> {
      |      'm': greatest(a.m, abs(x.e - a.e)),
      |      'e': (3.0 * a.e + x.e) / 4.0}) AS st
      |  FROM per)
      |SELECT user_id, n_events, st.e AS ewma, st.m AS max_surprise
      |FROM folded ORDER BY user_id""".stripMargin

  /** x65: per-user EWMA baseline (α=1/4) and maximum one-step surprise
    * over the time-ordered event stream. */
  val ewmaSurprise = Q.withOracle(
    "x65_ewma_surprise",
    "x65: per-user EWMA baseline + max one-step surprise (bit-exact ordered fold)",
    ewmaOracle) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("user_id"),
      struct(unix_micros(col("ts")).as("us"), col("event_id"),
        col("value").cast("double").as("v")).as("e"))
    val per = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("raw"))
      // (running-max, value) state elements, in exact event order. Field
      // order `m` BEFORE `e` is load-bearing for the ORACLE side:
      // DuckDB's vectorized list_reduce materializes struct fields
      // sequentially into the accumulator, so a field expression
      // reading a.e after the 'e' slot is written sees the UPDATED
      // value (measured: m scaled by exactly 3/4 = |x−e_new|/|x−e_old|
      // on column inputs, while literal-list folds evaluate
      // simultaneously). With m first, sequential and simultaneous
      // evaluation agree — and Spark's functional fold is
      // order-insensitive, so the one safe order is shared.
      .select(col("user_id"),
        transform(col("raw"), e =>
          struct(lit(0.0).as("m"), e.getField("v").as("e"))).as("es"))
    val folded = per.select(col("user_id"),
      size(col("es")).cast("long").as("n_events"),
      aggregate(
        slice(col("es"), lit(2), size(col("es")) - 1),
        element_at(col("es"), 1), // seed: the first value, zero surprise
        (a, x) => struct(
          greatest(a.getField("m"),
            abs(x.getField("e") - a.getField("e"))).as("m"),
          ((lit(3.0) * a.getField("e") + x.getField("e")) / lit(4.0)).as("e"))).as("st"))
    folded.select(col("user_id"), col("n_events"),
        col("st").getField("e").as("ewma"),
        col("st").getField("m").as("max_surprise"))
      .orderBy(col("user_id"))
  }

  val all: Seq[Q] = Seq(ewmaSurprise)
}
