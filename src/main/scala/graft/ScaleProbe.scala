package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe (`runMain graft.ScaleProbe [maxFactor]`):
  * synthesizes corpora at 1×/4×/10× the sf0.1 documents table and times
  * the headline document operators at each size, printing one JSON line
  * per (factor, query). SCALING.md records the measured curves.
  *
  * Corpus construction: copy k is a BIJECTIVE token rename of the base
  * corpus (every token suffixed `_k`), so each copy is an isomorphic
  * replica in a disjoint shingle space: within-copy similarity structure
  * (planted near-dups, exact dups) is exactly the base corpus's, while
  * NO shingle, signature, or simhash collides across copies. Output
  * sizes therefore scale exactly linearly with the factor, making the
  * timing curves interpretable as THROUGHPUT scaling rather than output
  * explosion. (An earlier interleaved-marker variant instead created
  * per-copy hot shingles shared by every doc of the copy — a planted
  * quadratic join blowup; renaming avoids the trap.) */
object ScaleProbe {

  def corpus(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, baseDir)
    val n = base.count()
    (0 until factor).map { k =>
      base.select(
        (col("doc_id") + lit(k * n)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_$k"))), " ").as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
  }

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
    val queries = Seq("x1_dedup_exact", "x9_token_counts", "x2_minhash_lsh_pairs",
      "x3_simhash", "x23_pack_sequences", "x16_dedup_clusters", "x4_jaccard_pairs")
    Seq(1, 4, maxFactor).distinct.foreach { f =>
      val dir = s"/tmp/graft-scale-$f"
      corpus(spark, "/root/testdata/sf0.1", f).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
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
