package graft

/** x119 grid-cell closest pairs: the oracle pins bit-exact parity (the
  * DuckDB side replays the hash placement AND the neighbor-cell
  * restriction); these pin the thing the oracle can't — that the grid
  * restriction loses nothing, by comparing against an all-pairs brute
  * force, and that the exactness precondition (k-th distance < cell
  * size) actually holds on the shipped data. */
class SpatialSpec extends SparkSuite {
  import spark.implicits._

  private val cell = 4000L

  /** All-pairs brute-force top-k on the driver — n is small at spec SFs. */
  private def brute(dir: String, k: Int): Seq[(Long, Long, Long)] = {
    val pts = ext.Spatial.points(spark, dir)
      .select("ck", "x", "y").as[(Long, Long, Long)].collect()
    (for {
      a <- pts; b <- pts if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
    } yield (a._1, b._1, dx * dx + dy * dy))
      .sortBy { case (ca, cb, d2) => (d2, ca, cb) }
      .take(k).toSeq
  }

  test("x119 equals the all-pairs brute force at sf0.01 (grid loses nothing)") {
    val sf001 = "/root/testdata/sf0.01"
    val got = ext.Spatial.gridNn.fn(spark, sf001)
      .select("ck_a", "ck_b", "d2").as[(Long, Long, Long)].collect().toSeq
    val want = brute(sf001, got.size)
    // precondition for provable completeness: every reported pair is
    // closer than one cell edge
    assert(got.forall(_._3 < cell * cell),
      "k-th closest pair crossed the cell-size bound — grid result not provably global")
    assert(got === want)
  }

  test("x119 completeness invariant: all brute-force pairs under the cell size are found") {
    // stronger than top-k equality: enumerate EVERY sub-cell-size pair
    // at sf0.001 (sparse — grid candidates are a handful) and assert the
    // full candidate relation captures each one
    val dir = "/root/testdata/sf0.001"
    val pts = ext.Spatial.points(spark, dir)
      .select("ck", "x", "y").as[(Long, Long, Long)].collect()
    val close = for {
      a <- pts; b <- pts if a._1 < b._1
      dx = a._2 - b._2; dy = a._3 - b._3
      if dx * dx + dy * dy < cell * cell
    } yield (a._1, b._1)
    val got = ext.Spatial.gridNn.fn(spark, dir)
      .select("ck_a", "ck_b").as[(Long, Long)].collect().toSet
    // the query is top-20; at sf0.001 the close set is tiny, so the
    // top-20 must contain every sub-cell-size pair
    assert(close.size <= 20, s"fixture drift: ${close.size} close pairs")
    close.foreach(p => assert(got.contains(p), s"missed close pair $p"))
  }
}
