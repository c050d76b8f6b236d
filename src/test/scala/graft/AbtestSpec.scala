package graft

import java.sql.Timestamp

/** x138 CUPED: the oracle pins bit-exact parity; these pin the estimator
  * semantics — the adjustment zeroes a pre-existing imbalance when post
  * is perfectly predicted by pre (the whole point of CUPED), and the
  * reported moments equal a scalar replay with arms labeled by the same
  * md5 bucket rule the query uses. */
class AbtestSpec extends SparkSuite {
  import spark.implicits._

  private def md5First(u: Long): Char = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    f"${(d(0) >> 4) & 0xf}%x".head
  }
  private def isTreat(u: Long): Boolean = "01234567".contains(md5First(u))

  /** Events for user u: one pre-period event (Jan 5) worth `pre` and one
    * post-period event (Jan 25) worth `post` (corpus spans Jan 1..30 via
    * two anchor users so the midpoint lands at Jan 15). */
  private def write(dir: String, users: Seq[(Long, Double, Double)]): Unit = {
    val anchors = Seq(
      (900001L, Timestamp.valueOf("2024-01-01 00:00:00"), 9001L, "view", 0.0, ""),
      (900002L, Timestamp.valueOf("2024-01-31 00:00:00"), 9002L, "view", 0.0, ""))
    val rows = users.zipWithIndex.flatMap { case ((u, pre, post), i) => Seq(
      (i * 2L + 1, Timestamp.valueOf("2024-01-05 12:00:00"), u, "purchase", pre, ""),
      (i * 2L + 2, Timestamp.valueOf("2024-01-25 12:00:00"), u, "purchase", post, "")) }
    (rows ++ anchors)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def run(dir: String) =
    analytics.Abtest.cupedAb.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long,
        Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().head

  test("post == pre exactly → theta = 1 and the CUPED effect is exactly 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cuped").toString
    // pick users so both arms are non-empty under the md5 rule, with
    // DIFFERENT spend levels per user → a real pre-period imbalance
    val users = (1L to 40L).map(u => (u, u * 3.0 + 1.0, u * 3.0 + 1.0))
    assert(users.exists(u => isTreat(u._1)) && users.exists(u => !isTreat(u._1)))
    write(dir, users)
    val r = run(dir)
    // anchors contribute (0-value events) but post==pre still holds
    // per user, so Cov = Var exactly → theta 1, residual diff 0
    assert(r._7 === Some(1.0))
    assert(r._9 === Some(0.0))
    assert(r._10.get > 0.999999) // rho² = 1 up to float formation
  }

  test("moments and effects equal a scalar replay with md5-labeled arms") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cuped2").toString
    // post correlated with pre but not equal (slope 2, deterministic jitter)
    val users = (1L to 60L).map(u => (u, u * 2.0, u * 4.0 + (u % 7) * 1.5))
    write(dir, users)
    val r = run(dir)
    // replay: per-user pennies incl. the two 0-value anchor users
    val all = users.map { case (u, pre, post) =>
      (u, math.round(pre * 100), math.round(post * 100)) } ++
      Seq((9001L, 0L, 0L), (9002L, 0L, 0L))
    val (t, c) = all.partition(x => isTreat(x._1))
    val n = all.size.toDouble
    val sx = all.map(_._2).sum.toDouble; val sy = all.map(_._3).sum.toDouble
    val sxx = all.map(x => BigInt(x._2) * BigInt(x._2)).sum.toDouble
    val sxy = all.map(x => BigInt(x._2) * BigInt(x._3)).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val raw = t.map(_._3).sum.toDouble / t.size - c.map(_._3).sum.toDouble / c.size
    val preDiff = t.map(_._2).sum.toDouble / t.size - c.map(_._2).sum.toDouble / c.size
    assert((r._1, r._2) === ((t.size.toLong, c.size.toLong)))
    assert((r._3, r._5) === ((t.map(_._2).sum, t.map(_._3).sum)))
    assert((r._4, r._6) === ((c.map(_._2).sum, c.map(_._3).sum)))
    assert(r._7.get === theta)
    assert(r._8.get === raw)
    assert(r._9.get === raw - theta * preDiff)
  }
}
