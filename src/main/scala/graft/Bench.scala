package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** The graph / seed-panel family. These are the suite's most expensive
    * queries AND the ones whose per-query numbers the round-over-round
    * delta watches most closely — and round 12 proved one shared JVM
    * contaminates exactly them: x110's final r12 median moved 8.07s →
    * 10.96s with its minimum above the r11 maximum on UNTOUCHED code
    * (accumulated heap/JIT/code-cache state from 231 other queries —
    * the same disease behind the retracted r11 x104 20× probe). In the
    * default lane mode this family runs in its OWN forked JVM: fresh
    * heap, fresh JIT, fresh code cache, its own warmup — so its medians
    * are comparable across rounds regardless of what the rest of the
    * suite did.
    *
    * DERIVED from the registry (every `ext.Graph` query), not
    * hand-listed: a new graph query joins the lane the moment it
    * registers, so the r12 contamination class cannot return through a
    * forgotten membership edit (r13 verdict finding #2). BenchLaneSpec
    * pins the derivation and the lane partition. */
  private[graft] def graphLane: Set[String] = ext.Graph.all.map(_.name).toSet

  /** Per-lane timed reps. Round 14 TRIED graph=5 (the r13 verdict's
    * noise-halving suggestion) and MEASURED it backfiring: reps are
    * rep-major passes over the whole lane, per-query times TREND UP with
    * pass index (accumulated heap/JIT/shuffle state inside the lane
    * JVM), so a 5-rep median lands on degraded passes — the lane's
    * median/min ratio rose 1.03 → 1.13 and x60 spread widened to
    * 6.96–15.06s on untouched code. The spread is a trend, not jitter;
    * more reps make it worse. Back at 3 for every lane (and comparable
    * with every prior round). An explicit SPARK_GRAFT_REPS overrides
    * BOTH lanes (profiling runs). */
  private val LaneReps: Map[String, Int] = Map("graph" -> 3, "main" -> 3)

  def main(args: Array[String]): Unit = {
    // Lane mode (default): fork one child JVM per lane and merge their
    // per-query lines. SPARK_GRAFT_LANES=none restores the single-JVM
    // suite (one-off profiling); a SPARK_GRAFT_ONLY filter or running AS
    // a lane child also short-circuits to the plain suite.
    val laneMode = sys.env.getOrElse("SPARK_GRAFT_LANES", "fork")
    val isChild = sys.env.contains("SPARK_GRAFT_LANE")
    if (laneMode == "fork" && !isChild && sys.env.get("SPARK_GRAFT_ONLY").isEmpty)
      runForkedLanes()
    else
      runSuite()
  }

  /** One timed line per query — independently parseable, emitted
    * ascending by time with failures LAST so the most diagnostic lines
    * sit inside the driver's bounded log tail. */
  private def r(v: Double): String = String.format(java.util.Locale.ROOT,
    "%.3f", java.lang.Double.valueOf(v)) // locale-pinned: a comma decimal would break the JSON

  private def summaryLine(results: Map[String, (Double, Double, Double)],
      reps: Int, resetMode: String, sfDir: String,
      lanesTag: Option[String]): String = {
    val failed = results.filter(_._2._1 < 0).keys.toSeq.sorted
    val ok = results.collect { case (k, (med, _, _)) if med >= 0 => k -> med }
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val slowest = ok.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r(v) }.mkString("{", ",", "}")
    // failure NAMES (bounded) ride the summary line — the count alone
    // says something broke without saying what
    val failedJson = failed.take(10).map("\"" + _ + "\"").mkString("[", ",", "]")
    val lanes = lanesTag.fold("")(t => s""","lanes":$t""")
    // headline value = sum of per-query MEDIANS
    s"""{"metric":"total","value":${r(total)},"unit":"sec","n":${results.size},"failures":${failed.size},"failed":$failedJson,"queries":$slowest,"sf":"$sfDir","warmup":true,"reps":$reps,"stat":"median","order":"shuffled-per-rep","reset":"${if (resetMode == "none") "none" else "clearCache+gc"}"$lanes}"""
  }

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  /** Fork one JVM per lane (graph family, rest), collect their jsonl,
    * and emit the merged per-query lines + one merged summary — the
    * exact artifact shape a single-JVM run produced, so
    * tools/bench_delta.py and the driver's tail parse are unchanged.
    * The child inherits this JVM's arguments (add-opens, -Xmx, -D) and
    * classpath (`run / fork := true` puts the real application
    * classpath in java.class.path). A lane whose child dies is re-run
    * in-process (numbers beat no numbers; the summary says it
    * happened). */
  private val qLinePattern = """"name":"([^"]+)".*?"value":(-?[0-9.]+)""".r

  /** (name, median, raw line) for each per-query line in a lane file. */
  private def parseQueryLines(path: String): Seq[(String, Double, String)] = {
    if (!new java.io.File(path).isFile) return Seq.empty
    scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filter(_.contains("\"metric\":\"query\"")).toList
      .flatMap { line =>
        qLinePattern.findFirstMatchIn(line)
          .map(m => (m.group(1), m.group(2).toDouble, line))
      }
  }

  private def runForkedLanes(): Unit = {
    import scala.jdk.CollectionConverters._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repsEnv = sys.env.get("SPARK_GRAFT_REPS")
    val resetMode = sys.env.getOrElse("SPARK_GRAFT_RESET", "gc")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val graphSet = graphLane
    val lanes = Seq(
      ("graph", names.filter(graphSet), repsEnv.fold(LaneReps("graph"))(_.toInt)),
      ("main", names.filterNot(graphSet), repsEnv.fold(LaneReps("main"))(_.toInt)))
      .filter(_._2.nonEmpty)
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val tmpDir = java.nio.file.Files.createTempDirectory("benchlanes")
    val laneRuns = lanes.map { case (lane, qs, laneReps) =>
      val out = tmpDir.resolve(s"$lane.jsonl").toString
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_LANE", lane)
      pb.environment().put("SPARK_GRAFT_ONLY", qs.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out)
      pb.environment().put("SPARK_GRAFT_REPS", laneReps.toString)
      pb.redirectErrorStream(true)
      System.err.println(
        s"[bench] lane $lane: ${qs.size} queries, $laneReps reps, forking JVM")
      val code = try {
        val p = pb.start()
        // drain to stderr so the parent's stdout carries ONLY the merged
        // lines (the driver tails stdout)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .foreach(l => System.err.println(s"[lane:$lane] $l"))
        p.waitFor()
      } catch { case e: Exception =>
        System.err.println(s"[bench] lane $lane fork failed: $e"); -1
      }
      val produced = code == 0 && new java.io.File(out).isFile
      if (!produced) {
        System.err.println(
          s"[bench] lane $lane child exited $code — re-running in-process")
        runSuite(onlyOverride = Some(qs.toSet), benchOutOverride = Some(out),
          quiet = true, repsOverride = Some(laneReps))
      }
      (lane, out, produced)
    }
    // merge the lanes' per-query lines (each lane file ends with its own
    // summary line, dropped here; the merged summary is recomputed) and
    // carry each lane's calibration line through verbatim
    val calLines = laneRuns.flatMap { case (_, out, _) =>
      if (!new java.io.File(out).isFile) Seq.empty
      else scala.io.Source.fromFile(out, "UTF-8").getLines()
        .filter(_.contains("\"metric\":\"calibration\"")).toList
    }
    val parsed0 = laneRuns.flatMap { case (_, out, _) => parseQueryLines(out) }
    // Coverage check: a child that exits 0 after flushing a PARTIAL jsonl
    // (killed mid-suite) would otherwise silently drop its missing
    // queries from the merged summary — the universe must be the
    // REQUESTED lane lists, not whatever the files happen to contain.
    // Missing names are re-run in-process (numbers beat no numbers); any
    // query that still fails records its -1 line there.
    val requested = lanes.flatMap(_._2).toSet
    val missing = requested -- parsed0.map(_._1).toSet
    val recovered = if (missing.isEmpty) Seq.empty else {
      System.err.println(s"[bench] ${missing.size} queries missing from lane " +
        s"files (${missing.toSeq.sorted.take(5).mkString(",")}…) — re-running in-process")
      val out = tmpDir.resolve("recovered.jsonl").toString
      runSuite(onlyOverride = Some(missing), benchOutOverride = Some(out),
        quiet = true, repsOverride = repsEnv.map(_.toInt).orElse(Some(LaneReps("main"))))
      parseQueryLines(out)
    }
    val parsed = parsed0 ++ recovered
    val ordered = parsed.sortBy { case (_, v, _) => (v < 0, v) }
    calLines.foreach(println)
    ordered.foreach { case (_, _, line) => println(line) }
    val results = parsed.map { case (n, v, _) => n -> (v, v, v) }.toMap
    val lanesTag = lanes.map { case (l, qs, laneReps) =>
      s"""\"$l\":{"n":${qs.size},"reps":$laneReps}""" }.mkString("{", ",", "}")
    val fellBack = laneRuns.exists(!_._3)
    val summary = summaryLine(results,
      repsEnv.fold(LaneReps("main"))(_.toInt), resetMode, sfDir,
      Some(lanesTag +
        (if (fellBack) ""","lane_fallback":true""" else "") +
        (if (missing.nonEmpty) s""","lane_recovered":${missing.size}""" else "")))
    println(summary)
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/full_latest.jsonl")
    if (benchOut != "none")
      writeLines(benchOut, calLines ++ ordered.map(_._3) :+ summary)
    // the lane files are merged into benchOut — drop the temp directory
    // instead of accreting one per bench run in the system tmp
    try {
      java.nio.file.Files.list(tmpDir).iterator().asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
      java.nio.file.Files.deleteIfExists(tmpDir)
    } catch { case _: Exception => () }
  }

  /** Host-calibration stanza (r14 board #1): every bench run measures the
    * MACHINE alongside the queries, so a round-over-round regression on
    * untouched code can be adjudicated from one committed number instead
    * of a session of judge re-measurement (r13→r14's graph-lane episode:
    * 1.24× common-set, judge-confirmed host drift on bit-identical code).
    * Three fixed burns, each warmed once and then timed:
    *  - `md5_1core_sec`: 8M MessageDigest MD5s in one driver thread —
    *    pure single-core integer/JIT throughput, no Spark involved;
    *  - `md5_par_sec`: 96M codegen'd md5(string) rows across all local
    *    cores via a noop write — parallel CPU throughput under the same
    *    executor threads the queries use;
    *  - `shuffle_20m_sec`: 20M longs repartition(64)'d by key then folded
    *    to one row — fixed shuffle write+read volume, the machinery the
    *    graph/seed-panel lane lives on.
    * The line is emitted into the same jsonl as the query lines (one per
    * lane — each lane JVM calibrates itself) and `tools/bench_delta.py`
    * prints old vs new next to the totals. Skippable for one-off
    * profiling with SPARK_GRAFT_CALIBRATE=off. */
  private def calibrationLine(spark: SparkSession, lane: String): String = {
    import org.apache.spark.sql.functions.{col, expr, md5}
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def md5Burn(n: Int): Unit = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      var acc = 0 // data-dependent fold so the loop can't be dead-code'd
      while (i < n) {
        acc ^= md.digest(s"cal$i$acc".getBytes("US-ASCII"))(0)
        i += 1
      }
      if (acc == 94) System.err.print("") // consume acc
    }
    def parBurn(n: Long): Unit =
      spark.range(0L, n, 1L, 32)
        .select(md5(col("id").cast("string")).as("h"))
        .write.format("noop").mode("overwrite").save()
    def shuffleBurn(n: Long): Unit =
      spark.range(0L, n, 1L, 32)
        .repartition(64, col("id"))
        .agg(expr("bit_xor(xxhash64(id))"))
        .write.format("noop").mode("overwrite").save()
    md5Burn(200000); parBurn(1000000L); shuffleBurn(1000000L) // warm JIT/codegen
    val t1 = time(md5Burn(8000000))
    val tp = time(parBurn(96000000L))
    val ts = time(shuffleBurn(20000000L))
    s"""{"metric":"calibration","lane":"$lane","md5_1core_sec":${r(t1)},"md5_par_sec":${r(tp)},"shuffle_20m_sec":${r(ts)},"unit":"sec"}"""
  }

  private def runSuite(onlyOverride: Option[Set[String]] = None,
      benchOutOverride: Option[String] = None, quiet: Boolean = false,
      repsOverride: Option[Int] = None): Unit = {
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
    // Calibrate FIRST, on a fresh JVM/session — before any query state
    // accretes (each lane child calibrates itself; see calibrationLine).
    val calLine =
      if (sys.env.getOrElse("SPARK_GRAFT_CALIBRATE", "on") == "off") None
      else Some(calibrationLine(spark, sys.env.getOrElse("SPARK_GRAFT_LANE", "main")))
    // Optional comma-separated query-name filter for profiling one query
    // at a time while iterating (driver runs never set it → lane mode).
    val only = onlyOverride.orElse(sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet))
    val queries = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(q => f(q._1)))
    // The timed consumer is the noop SINK, not count(): count() lets the
    // optimizer prune aggregate values, projection expressions, and the
    // final sort (a pure-map query like the x24 scrub "benches" as a row
    // count of its input). The noop write materializes every output
    // column of every row and keeps the ORDER BY in the plan — the
    // honest cost of actually producing the result.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Round-6 judge finding: back-to-back suite runs carry a POSITION
    // tax — d5 read 3.15s in-suite vs 0.51s isolated on identical
    // code/config, because accumulated JVM/executor state (dereferenced
    // localCheckpoint blocks, shuffle files awaiting ContextCleaner,
    // code-cache pressure) taxes whatever query happens to run late.
    // Round 12 added the lane fork on top: the reset+shuffle discipline
    // bounds WITHIN-lane contamination, the lane fork removes the
    // CROSS-FAMILY kind the reset cannot reach (heap/JIT/code cache).
    // Countermeasures within a lane:
    //  1. between timed queries, drop cached relations and force a GC so
    //     the ContextCleaner reclaims dead shuffle/block state NOW, on
    //     untimed ground, instead of amortizing into a later query;
    //  2. each rep runs the whole suite in a different seeded-shuffled
    //     order, so any residual position effect lands on different
    //     queries per rep and the per-query MEDIAN sheds it.
    // Each query line reports its suite positions per rep, so a reader
    // can still correlate a spiked max with where in the suite it ran.
    val resetMode = sys.env.getOrElse("SPARK_GRAFT_RESET", "gc")
    def resetBetweenQueries(): Unit = if (resetMode != "none") {
      spark.catalog.clearCache()
      System.gc() // triggers ContextCleaner on dereferenced shuffles/blocks
      Thread.sleep(150) // let the async cleaner drain OFF the timed clock
    }
    // Warmup pass: JIT/codegen compilation and parquet footer reads dominate
    // a cold first query (~6s vs ~0.3s steady state); measure steady state.
    val names = queries.keys.toSeq.sorted
    names.foreach { n =>
      try run(queries(n)) catch { case _: Throwable => () }
    }
    // `reps` timed passes over the suite (median reported per query; each
    // line carries min/max so a reader can distinguish a plan regression
    // — median moved, spread tight — from JVM/GC luck: median stable, max
    // spiked). A failed iteration records NaN, and any failure poisons
    // the query's reported time to -1 — a plan that regresses into an
    // exception must read as FAILED, not as its wall-clock-to-throw.
    val reps = repsOverride.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val timesByQuery = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val posByQuery = scala.collection.mutable.Map.empty[String, Vector[Int]]
    for (rep <- 1 to reps) {
      val order = new scala.util.Random(rep * 0x9E3779B9L).shuffle(names)
      order.zipWithIndex.foreach { case (name, i) =>
        resetBetweenQueries()
        val t0 = System.nanoTime()
        val t = try { run(queries(name)); (System.nanoTime() - t0) / 1e9 }
                catch { case _: Throwable => Double.NaN }
        timesByQuery(name) = timesByQuery.getOrElse(name, Vector()) :+ t
        posByQuery(name) = posByQuery.getOrElse(name, Vector()) :+ i
      }
    }
    val results = names.map { name =>
      val times = timesByQuery(name)
      val stats = if (times.exists(_.isNaN)) (-1.0, -1.0, -1.0) else {
        val s = times.sorted
        (s(s.size / 2), s.head, s.last)
      }
      name -> stats
    }.toMap
    // The driver captures a bounded TAIL of the build log (~2 KB observed):
    // a single line carrying all per-query timings outgrew it twice
    // (rounds 2-3 recorded parsed:null). So the detail goes on one small
    // line per query — each independently parseable — and the very last
    // line is a compact summary whose size is bounded by construction
    // (total + counts + the 10 slowest), so the headline number always
    // survives the tail window intact. The FULL detail is additionally
    // persisted to a repo-committed artifact (see benchOut below) so
    // round-over-round deltas are computable for every query, not just
    // the 10 that fit the tail.
    def queryLine(k: String): String = {
      val (med, mn, mx) = results(k)
      val pos = posByQuery(k).mkString("[", ",", "]")
      s"""{"metric":"query","name":"$k","value":${r(med)},"min":${r(mn)},"max":${r(mx)},"reps":$reps,"pos":$pos,"unit":"sec"}"""
    }
    val orderedNames = results.toSeq
      .sortBy { case (_, (med, _, _)) => (med < 0, med) }.map(_._1)
    val summary = summaryLine(results, reps, resetMode, sfDir, None)
    if (!quiet) {
      calLine.foreach(println)
      orderedNames.foreach(k => println(queryLine(k)))
      println(summary)
    }
    // Full artifact: every per-query line + the summary, written where the
    // repo can commit it (driver tail truncation loses all but ~10 lines).
    // Disable with SPARK_GRAFT_BENCH_OUT=none (e.g. one-off profiling).
    val benchOut = benchOutOverride.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/full_latest.jsonl"))
    if (benchOut != "none")
      writeLines(benchOut, calLine.toSeq ++ orderedNames.map(queryLine) :+ summary)
    spark.stop()
  }
}
