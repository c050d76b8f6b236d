package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Bitmap-index distinct counting — the groupBitmap / Roaring-bitmap idea
  * (Druid, ClickHouse, Doris all ship it) restricted to fixed 64-bit
  * words so the whole pipeline stays in codegen'd built-ins: each id is a
  * bit (`word = id >> 6`, `bit = 1L << (id & 63)`), `bit_or` collapses a
  * word's population map-side, `bit_count` + SUM reads the cardinality
  * back out. EXACT distinct counts, no sketch error.
  *
  * Why this beats `COUNT(DISTINCT id)` at 100 TB: Spark plans exact
  * distinct as an expand + two-phase aggregate keyed on (group, id) — the
  * shuffle carries every distinct id once per group. The bitmap form's
  * map-side `bit_or` partial merges up to 64 neighbouring ids into ONE
  * long before anything moves, so for dense id domains the shuffle is up
  * to 64× smaller, and re-observed ids collapse at full scan speed. The
  * price is a second (tiny) shuffle of per-word longs — #groups ×
  * ceil(idspace/64) rows of 16 bytes, independent of the event count.
  *
  * Oracle-exactness: bit_or / bit_count are integer-exact and
  * order-independent (associative, commutative — identical under any
  * partitioning or AQE re-plan). The DuckDB oracle deliberately uses the
  * OTHER formulation (`COUNT(DISTINCT ...)`) so the hash gate compares
  * two independent derivations of the same cardinalities, not one
  * transcription. Precondition: ids are non-negative (the testdata
  * contract) — `>> 6` is arithmetic shift, so a negative id would land in
  * a sign-extended word and silently alias; a production build would
  * reject negatives at the loader boundary (Tables type contract).
  */
object Bitmap {

  /** x93: exact distinct users per event type via 64-bit bitmap words —
    * plus the word count itself (`n_words`), i.e. the bitmap's physical
    * size: the operational number a capacity planner reads (bitmap bytes
    * = 8·n_words) and a second independent hash-gated value per group. */
  val bitmapDistinct = Q.withOracle(
    "x93_bitmap_distinct",
    "x93: exact distinct users per event type via bit_or word bitmaps + bit_count",
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT user_id // 64) AS n_words,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val words = Tables.events(s, dir)
      .select(col("event_type"),
        expr("shiftright(user_id, 6)").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))").as("bit"))
      .groupBy(col("event_type"), col("word_idx"))
      .agg(bit_or(col("bit")).as("word"), count(lit(1)).as("cnt"))
    words
      .groupBy(col("event_type"))
      .agg(sum(bit_count(col("word"))).cast("long").as("n_users"),
        count(lit(1)).as("n_words"),
        sum(col("cnt")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(bitmapDistinct)
}
