package graft.analytics

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition matrix over per-user event sequences —
  * the "what happens next" primitive behind session modeling and
  * next-event prediction features. The only event-grain work is ONE
  * user-keyed window (lead over (epoch-µs, event_id) order) producing
  * (from, to) adjacencies; everything after runs at |event types|² grain,
  * which is contractually tiny. Transition probabilities are a SINGLE
  * IEEE division of two exact integers (count / row total), computed by
  * the same expression shape in both engines, so even the float column
  * hash-matches.
  */
object Markov {

  private val transitionsOracle: String =
    s"""WITH seq AS MATERIALIZED (
       |  SELECT event_type AS src,
       |    LEAD(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS dst
       |  FROM events),
       |cnt AS MATERIALIZED (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
       |SELECT src, dst, n,
       |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src) AS p
       |FROM cnt ORDER BY src, dst""".stripMargin

  /** x62: event-type transition counts + row-normalized probabilities;
    * one user-keyed window at event grain, then type²-grain aggregation. */
  val transitions = Q.withOracle(
    "x62_markov_transitions",
    "x62: first-order Markov transition matrix over per-user event sequences",
    transitionsOracle) { (s, dir) =>
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("src"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("dst", lead(col("src"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .filter(col("dst").isNotNull)
    val cnt = seq.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("n"))
    cnt
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))))
      .orderBy(col("src"), col("dst"))
  }

  val all: Seq[Q] = Seq(transitions)
}
