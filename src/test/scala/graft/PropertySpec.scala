package graft

import graft.etl.Etl
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.3): the ON-CONFLICT idempotence invariant,
  * zero-guarded ratios, and CSV round-trip type preservation, over
  * ScalaCheck-generated inputs (driven directly with fixed seeds — the
  * scalatest bridge artifact isn't in the offline dependency set). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val params = Gen.Parameters.default

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private val batchGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 10), Gen.alphaStr.map(_.take(5))))

  test("property: upsert(upsert(e, i), i) == upsert(e, i) for arbitrary batches") {
    samples(Gen.zip(batchGen, batchGen), 8).foreach { case (e, i) =>
      val existing = e.toDF("k", "v").dropDuplicates("k")
      val incoming = i.toDF("k", "v").dropDuplicates("k")
      val once = Etl.upsert(existing, incoming, Seq("k"))
      val twice = Etl.upsert(once, incoming, Seq("k"))
      // collect-compare: exceptAll on shared-lineage frames trips a Spark
      // internal attribute-binding error in its count-sum rewrite
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Int, String)].collect().sortBy(identity).toSeq
      assert(rows(once) === rows(twice))
      assert(rows(once).map(_._1).distinct.size === rows(once).size)
    }
  }

  test("property: merge(current, updates) equals the Map-model merge for arbitrary batches") {
    samples(Gen.zip(batchGen, batchGen), 8).foreach { case (c, u) =>
      val current = c.toDF("k", "v").dropDuplicates("k")
      val updates = u.toDF("k", "v").dropDuplicates("k")
      val got = Etl.merge(current, updates, Seq("k"))
        .as[(Int, String)].collect().sortBy(identity).toSeq
      // the model: current overlaid by updates, key-wise
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.as[(Int, String)].collect().toMap
      val model = (toMap(current) ++ toMap(updates)).toSeq.sortBy(identity)
      assert(got === model)
    }
  }

  test("property: scd2Apply never loses history, keeps exactly one open row per live key") {
    val day0 = java.sql.Date.valueOf("2000-01-01")
    val day1 = java.sql.Date.valueOf("2001-01-01")
    samples(Gen.zip(batchGen, batchGen), 8).foreach { case (h, u) =>
      val hist = h.toDF("k", "v").dropDuplicates("k")
        .withColumn("valid_from", lit(day0))
        .withColumn("valid_to", lit(null).cast("date"))
      val updates = u.toDF("k", "v").dropDuplicates("k").withColumn("ts", lit(day1))
      val out = Etl.scd2Apply(hist, updates, Seq("k"), "ts")
      val rows = out.as[(Int, String, java.sql.Date, Option[java.sql.Date])]
        .collect().toSeq
      val histKeys = hist.as[(Int, String, java.sql.Date, Option[java.sql.Date])]
        .collect().map(_._1).toSet
      val updKeys = updates.as[(Int, String, java.sql.Date)].collect().map(_._1).toSet
      // every key that ever existed still has rows; exactly one open row
      // per key; closed rows close at the update ts
      val byKey = rows.groupBy(_._1)
      assert(byKey.keySet === (histKeys ++ updKeys))
      byKey.foreach { case (k, vs) =>
        assert(vs.count(_._4.isEmpty) === 1, s"key $k open-row count != 1")
        vs.filter(_._4.isDefined).foreach(v => assert(v._4.get === day1))
      }
    }
  }

  test("property: zero-guarded ratio-of-sums is NULL on zero denominator, never an error") {
    samples(Gen.listOfN(20, Gen.choose(-5.0, 5.0)), 8).foreach { xs =>
      val df = xs.toDF("x")
      val den = sum(when($"x" > 100, $"x")) // usually empty → NULL sum
      val guarded = sum($"x" * 2) / when(den === 0 || den.isNull, lit(null)).otherwise(den)
      val r = df.agg(guarded.as("ratio")).head()
      assert(r.isNullAt(0) || !r.getDouble(0).isNaN)
    }
  }

  test("CSV write→schema-read round-trip preserves values and types (S1/S2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val src = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag",
        to_date($"l_shipdate").as("ship_day"))
    src.write.mode("overwrite").option("header", true).csv(dir)
    val back = spark.read
      .option("header", true)
      .schema("l_orderkey BIGINT, l_quantity DOUBLE, l_returnflag STRING, ship_day DATE")
      .csv(dir)
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ORC and JSON-lines write→read round-trips preserve values (source formats)") {
    // the other two sources/sinks a platform user reaches for, both
    // built into Spark: ORC (columnar, schema in footer) and JSON lines
    // (schema declared on read, like the CSV path — inference is a scan
    // of the whole dataset and never acceptable at scale)
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast("double").as("price"),
        to_date($"o_orderdate").as("day"))
    val orcDir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(orcDir)
    val backOrc = spark.read.orc(orcDir)
    assert(backOrc.schema === src.schema)
    assert(backOrc.exceptAll(src).isEmpty && src.exceptAll(backOrc).isEmpty)

    val jsonDir = java.nio.file.Files.createTempDirectory("graft-json").toString
    src.write.mode("overwrite").json(jsonDir)
    val backJson = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, price DOUBLE, day DATE")
      .json(jsonDir)
    assert(backJson.schema === src.schema)
    assert(backJson.exceptAll(src).isEmpty && src.exceptAll(backJson).isEmpty)
  }
}
