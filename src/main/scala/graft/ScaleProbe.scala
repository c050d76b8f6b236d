package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe (`runMain graft.ScaleProbe [maxFactor]`):
  * synthesizes corpora at 1×/4×/10× the sf0.1 tables and times the
  * headline operators at each size, printing one JSON line per
  * (factor, query). SCALING.md records the measured curves.
  *
  * Document corpus: copy k is a BIJECTIVE token rename of the base
  * corpus (every token suffixed `_k`), so each copy is an isomorphic
  * replica in a disjoint shingle space: within-copy similarity structure
  * (planted near-dups, exact dups) is exactly the base corpus's, while
  * NO shingle, signature, or simhash collides across copies. Output
  * sizes therefore scale exactly linearly with the factor, making the
  * timing curves interpretable as THROUGHPUT scaling rather than output
  * explosion. (An earlier interleaved-marker variant instead created
  * per-copy hot shingles shared by every doc of the copy — a planted
  * quadratic join blowup; renaming avoids the trap.)
  *
  * Relational tables (events / orders / lineitem — round 5): copy k is
  * a bijective KEY SHIFT (ids offset by k·stride, join keys on both
  * sides of a join shifted by the same stride), so join multiplicities,
  * per-user as-of chains, and per-customer window extents are exactly
  * the base table's, replicated k times in disjoint key spaces. x15 /
  * w5 / j2 outputs are exactly linear in the factor; t6's is CONSTANT
  * by design (top-k per a fixed key domain — the bounded-heap scale
  * story is precisely that output does not grow). */
object ScaleProbe {

  /** Key-space stride between copies — far above any sf0.1 key. */
  private val Stride = 100000000L

  def corpus(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, baseDir)
    val n = base.count()
    (0 until factor).map { k =>
      base.select(
          (col("doc_id") + lit(k * n)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_$k"))), " ").as("text"),
          col("lang"), col("source"))
        // length of the RENAMED text: within one select the alias would
        // still resolve to the input column (each copy's tokens are 2-3
        // chars longer than the base corpus's)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
  }

  private def shifted(df: DataFrame, keyCols: Seq[String], factor: Int): DataFrame =
    (0 until factor).map { k =>
      keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * Stride)))
    }.reduce(_ unionByName _)

  def scaledEvents(spark: SparkSession, baseDir: String, factor: Int): DataFrame =
    shifted(Tables.events(spark, baseDir), Seq("event_id", "user_id"), factor)

  def scaledOrders(spark: SparkSession, baseDir: String, factor: Int): DataFrame =
    shifted(Tables.orders(spark, baseDir), Seq("o_orderkey", "o_custkey"), factor)

  /** l_orderkey shifts by the SAME stride as o_orderkey so each copy's
    * orders⋈lineitem multiplicity is exactly the base join's. */
  def scaledLineitem(spark: SparkSession, baseDir: String, factor: Int): DataFrame =
    shifted(Tables.lineitem(spark, baseDir), Seq("l_orderkey"), factor)

  def main(args: Array[String]): Unit = {
    val maxFactor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // x33/x34 are deliberately absent: their probe terms are un-renamed
    // base-corpus tokens, so the bijective rename would make every copy
    // (including copy 0) miss — the probe would time an empty candidate
    // set, not retrieval.
    val queries = Seq("x1_dedup_exact", "x9_token_counts", "x2_minhash_lsh_pairs",
      "x3_simhash", "x23_pack_sequences", "x16_dedup_clusters", "x4_jaccard_pairs",
      "x15_asof_join", "w5_trailing_30d_spend", "t6_topk_per_key",
      "j2_orders_lineitem_join", "x35_chunk_sliding", "x37_bigram_counts")
    val base = "/root/testdata/sf0.1"
    Seq(1, 4, maxFactor).distinct.foreach { f =>
      val dir = s"/tmp/graft-scale-$f"
      corpus(spark, base, f).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      scaledEvents(spark, base, f).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      scaledOrders(spark, base, f).write.mode("overwrite")
        .parquet(s"$dir/orders.parquet")
      scaledLineitem(spark, base, f).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      queries.foreach { q =>
        val fn = SparkEntry.queries(q)
        def run(): Long = {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          fn(spark, dir).count()
        }
        run() // warm
        val t0 = System.nanoTime()
        val rows = run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"scale","factor":$f,"query":"$q","sec":$sec%.3f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
