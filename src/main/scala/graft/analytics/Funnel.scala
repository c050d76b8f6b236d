package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics — the event-sequence operator that rounds
  * out the events family (x13 sessionization, x15 as-of, x20 interval):
  * how many users completed signup → view → purchase IN ORDER? This is
  * SQL's MATCH_RECOGNIZE / the product-analytics "funnel" primitive;
  * the naive relational form is one self-join per stage (k-way join
  * fan-out on a 100 TB event log), the scalable form is ONE doc-keyed
  * aggregation: collect each user's (time-ordered) stage events and
  * fold a stage counter over them — state per user is the counter, the
  * shuffle is the one user-keyed exchange, and stages generalize to any
  * k without another join.
  *
  * Determinism: events order by exact (epoch-micros, event_id) — ties
  * at the same microsecond resolve by event id identically in both
  * engines; the fold is a left fold in both (`aggregate` here,
  * `list_reduce` there). Output is the per-stage completion count —
  * 3 rows, contractually bounded.
  */
object Funnel {

  private val Stages = Seq("signup", "view", "purchase")

  private def funnelOracle: String = {
    // events map to their 1-based stage number; the fold advances when
    // the next event IS the next stage (t = acc + 1) — identical to the
    // engine's (acc = i AND type = stages(i)) arm-by-arm match
    val stageNum = Stages.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN ${i + 1}" }.mkString(" ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
       |  FROM events WHERE event_type IN (${Stages.map(s => s"'$s'").mkString(", ")})),
       |peruser AS MATERIALIZED (
       |  SELECT user_id,
       |    list_reduce(list_prepend(0,
       |      list_transform(
       |        list_sort(list({'us': us, 'eid': event_id, 't': event_type})),
       |        r -> CASE r.t $stageNum END)),
       |      (acc, t) -> CASE WHEN t = acc + 1 THEN acc + 1 ELSE acc END) AS reached
       |  FROM ev GROUP BY user_id),
       |stages(stage, stage_name) AS (VALUES
       |  ${Stages.zipWithIndex.map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")})
       |SELECT s.stage, s.stage_name,
       |  CAST(COUNT(p.user_id) FILTER (WHERE p.reached >= s.stage) AS BIGINT) AS n_users
       |FROM stages s CROSS JOIN peruser p
       |GROUP BY s.stage, s.stage_name
       |ORDER BY s.stage""".stripMargin
  }

  /** x57: ordered funnel over the events log — users completing each
    * prefix of signup → view → purchase, one user-keyed aggregation. */
  val funnel = Q.withOracle(
    "x57_funnel_stages",
    s"x57: ordered funnel (${Stages.mkString(" -> ")}) per-stage completion counts",
    funnelOracle) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin(Stages: _*))
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type").as("t")).as("e"))
    val folded = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), aggregate(
        transform(col("es"), e => e.getField("t")),
        lit(0),
        (acc, t) => Stages.zipWithIndex.foldRight(acc) { case ((s0, i), els) =>
          when(acc === i && t === s0, i + 1).otherwise(els)
        }).as("reached"))
    val counts = Stages.indices.map(i =>
      sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"s${i + 1}"))
    val one = folded.agg(counts.head, counts.tail: _*)
    val rows = Stages.zipWithIndex.map { case (s0, i) =>
      struct(lit(i + 1).as("stage"), lit(s0).as("stage_name"),
        col(s"s${i + 1}").as("n_users"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("stage"))
  }

  val all: Seq[Q] = Seq(funnel)
}
