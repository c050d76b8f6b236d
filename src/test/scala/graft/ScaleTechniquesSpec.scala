package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 100 TB techniques SURVEY.md §4 prescribes, demonstrated and
  * plan-audited on materialized copies of the testdata: disk partitioning
  * with partition pruning, bucketed co-located joins (shuffle
  * elimination), and salted aggregation for skewed keys. */
class ScaleTechniquesSpec extends SparkSuite {
  import spark.implicits._

  test("facts partitioned by week on disk → date predicates prune partitions") {
    val dir = Files.createTempDirectory("parted").toString
    Tables.lineitem(spark, sf)
      .withColumn("ship_week", Parity.week($"l_shipdate"))
      .write.partitionBy("ship_week").mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
      .filter($"ship_week" === lit(java.sql.Date.valueOf("1997-03-03")))
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
    df.collect()
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan in plan")
    // the filter must land in PartitionFilters (pruned at planning), not
    // as a post-scan data filter over all partitions
    assert(scans.head.toString.contains("PartitionFilters"), scans.head.toString)
    // pruned scan reads ≤ a couple of files, not all ~360 week partitions
    val files = scans.head.metrics("numFiles").value
    assert(files >= 1 && files <= 4, s"expected pruned scan, read $files files")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the runtime sibling of static pruning: the predicate lives on the
    // DIM side, so planning-time pruning can't fire — DPP injects the
    // dim's post-filter key set as a subquery into the fact scan's
    // partition filters. At 100 TB this is what turns "join the fact to
    // three urgent weeks" into a 3-partition read instead of a full scan.
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.lineitem(spark, sf)
      .withColumn("ship_week", Parity.week($"l_shipdate"))
      .write.partitionBy("ship_week").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val allWeeks = fact.select($"ship_week").distinct()
    // an independent PARQUET-BACKED dim with a genuine Filter on it —
    // DPP requires a selective predicate on the dim side (a bare LIMIT
    // does not qualify) and a scan-backed relation (an in-memory
    // LocalRelation never triggers the rule). This is also the realistic
    // shape: "the three weeks marked urgent in the calendar dim".
    val weeks = allWeeks.orderBy($"ship_week").as[java.sql.Date].collect()
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    weeks.zipWithIndex
      .map { case (w, i) => (w, if (i < 3) "urgent" else "normal") }.toSeq
      .toDF("ship_week", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"tag" === "urgent")
    val conf = spark.conf
    val oldBt = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // broadcastable dim → DPP reuses the broadcast for the filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val joined = fact.join(dim, Seq("ship_week"))
        .groupBy($"tag").agg(sum($"l_quantity").as("q"))
      joined.collect()
      val scans = flattenPlan(joined.queryExecution.executedPlan)
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .filter(_.toString.contains("dynamicpruning"))
      assert(scans.nonEmpty, "no dynamically-pruned scan in plan")
      val total = allWeeks.count()
      val read = scans.head.metrics("numPartitions").value
      assert(read <= 3, s"DPP read $read of $total partitions, expected <= 3")
    } finally oldBt.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("bucketed tables join without a shuffle on the join key") {
    // warehouse dir is a static conf, set at session build in SparkSuite
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString()
    // co-located buckets: the join itself needs no Exchange on the keys
    val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).size
    assert(exchanges === 0, s"bucketed join still shuffled:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin)") {
    // one join key holds ~90% of the left side; with aggressive skew
    // thresholds AQE must replan the SMJ with skew-split partitions.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(200000)
        .select(when($"id" % 10 < 9, lit(7L)).otherwise($"id" % 50).as("k"), $"id".as("payload"))
      val right = spark.range(50).select($"id".as("k"), ($"id" * 2).as("rv"))
      val joined = left.join(right, "k")
      // collect() executes THIS queryExecution (count() would build a new
      // one and leave this plan unexecuted / un-adapted)
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation equals direct aggregation on a skewed key") {
    // skew: one key holds ~half the rows
    val skewed = spark.range(100000)
      .select(when($"id" % 2 === 0, lit("HOT")).otherwise(concat(lit("k"), $"id" % 97))
        .as("k"), ($"id" % 13).cast("double").as("v"))
    val direct = skewed.groupBy("k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    // two-phase: salt the key, partial-agg, strip salt, final-agg
    val salted = skewed
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      .groupBy($"k", $"salt").agg(sum($"v").as("ps"), count(lit(1)).as("pn"))
      .groupBy($"k").agg(sum($"ps").as("s"), sum($"pn").as("n"))
    val d = direct.collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val sres = salted.collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(d.keySet === sres.keySet)
    d.foreach { case (k, (sv, n)) =>
      assert(math.abs(sres(k)._1 - sv) < 1e-6 && sres(k)._2 === n, s"mismatch at $k")
    }
  }

  test("runtime Bloom filter from a selective dim filter prunes the fact side") {
    // At 100 TB the win is rejecting fact rows BEFORE the join shuffle:
    // Spark's runtime-filter optimizer builds a Bloom filter from the
    // filtered (creation) side and injects might_contain on the fact
    // scan. Thresholds are sized for cluster-scale tables, so for the
    // demonstration we drop them to cover the testdata; the assertion is
    // on the injected plan shape, which is scale-independent.
    val conf = spark.conf
    val old = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" -> conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // force a shuffle join: runtime bloom filters target exactly the
      // case where the dim cannot broadcast
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and it must not change the answer
      val n = joined.count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(fact.join(dim, $"l_orderkey" === $"o_orderkey").count() === n)
    } finally old.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
