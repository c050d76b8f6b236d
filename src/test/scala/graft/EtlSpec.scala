package graft

import graft.etl.Etl
import org.apache.spark.sql.functions._

/** ETL-core semantics: upsert idempotence (the reference's ON CONFLICT
  * invariant), deterministic dedup, surrogate-key stability, and the V1/V2
  * parser edge cases from FIXTURES.md §2. */
class EtlSpec extends SparkSuite {
  import spark.implicits._

  test("upsert is idempotent: applying the same batch twice equals once") {
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val incoming = Seq((2, "B"), (3, "c")).toDF("k", "v")
    val once = Etl.upsert(existing, incoming, Seq("k"))
    val twice = Etl.upsert(once, incoming, Seq("k"))
    assert(once.count() === 3)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
    // conflicting key keeps the existing row (DO NOTHING semantics)
    assert(once.filter($"k" === 2).select("v").as[String].head() === "b")
  }

  test("dedupFirst survivor is stable under repartitioning") {
    val df = Tables.lineitem(spark, sf)
    val order = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val a = Etl.dedupFirst(df, Seq("l_orderkey"), order)
      .select("l_orderkey", "l_partkey").orderBy("l_orderkey")
    val b = Etl.dedupFirst(df.repartition(17), Seq("l_orderkey"), order)
      .select("l_orderkey", "l_partkey").orderBy("l_orderkey")
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("surrogateKey (xxhash64) is deterministic and collision-free on customer keys") {
    val c = Tables.customer(spark, sf)
    val keyed = c.select(Etl.surrogateKey(col("c_custkey"), col("c_name")).as("id"))
    assert(keyed.distinct().count() === c.count())
    val again = c.repartition(7)
      .select(Etl.surrogateKey(col("c_custkey"), col("c_name")).as("id"))
    assert(keyed.exceptAll(again).isEmpty)
  }

  test("V1 rating parse edges: Not Available, empty, out-of-range, whitespace") {
    // mirror of load-quality.py:158-174 semantics on FIXTURES.md §2 edges
    val raw = Seq("Not Available", "", "0", "6", "3 ", "5", "2", "abc")
      .toDF("rating_raw")
    val parsed = Parity.tryInt(trim($"rating_raw"))
    val rating = when(parsed.between(1, 5), parsed)
    val got = raw.select(rating.as("r")).as[Option[Int]].collect().toSeq
    assert(got === Seq(None, None, None, None, Some(3), Some(5), Some(2), None))
  }

  test("V2 boolean parse: case-insensitive yes, NULL and anything else false") {
    // mirror of load-quality.py:177-189
    val raw = Seq(Some("Yes"), Some("YES"), Some("no"), Some(""), None, Some(" yes "))
      .toDF("es")
    val b = coalesce(lower(trim($"es")) === "yes", lit(false))
    assert(raw.select(b).as[Boolean].collect().toSeq ===
      Seq(true, true, false, false, false, true))
  }

  test("grain check finds planted duplicate") {
    val df = Seq((1, "2024-01-01"), (1, "2024-01-01"), (2, "2024-01-01")).toDF("id", "wk")
    val viol = df.groupBy("id", "wk").count().filter($"count" > 1)
    assert(viol.count() === 1)
  }
}
