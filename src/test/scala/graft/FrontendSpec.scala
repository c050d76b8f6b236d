package graft

import org.apache.spark.sql.functions._

/** x187/x187b semantic pins beyond the oracle hash: each stage agrees
  * with the REGISTERED operator it composes (x176 gate, md5 dedup, x182
  * dirty verdict), the funnel is monotone, and the schedule is a
  * permutation of the accepted set. */
class FrontendSpec extends SparkSuite {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)
  private lazy val docs = Tables.documents(spark, sf).cache()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def isHoldout(id: Long) = "01".contains(md5hex(id.toString).charAt(0))

  test("x187b funnel is monotone per source and starts at the train split") {
    val rows = q("x187b_frontend_funnel").collect()
    val trainBySrc = docs.collect()
      .filterNot(r => isHoldout(r.getLong(0)))
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getString(0)).toSet == trainBySrc.keySet)
    rows.foreach { r =>
      val chain = Seq("n_train", "n_gated", "n_dedup", "n_clean",
        "n_selected", "n_accepted").map(r.getAs[Long])
      assert(chain.head == trainBySrc(r.getString(0)), s"${r.getString(0)} train count")
      chain.sliding(2).foreach { case Seq(a, b) =>
        assert(a >= b, s"${r.getString(0)} funnel not monotone: $chain") }
    }
  }

  test("x187 gates agree with the registered x176 keep verdict") {
    // every doc that reaches the dedup stage must pass x176's keep —
    // check via the funnel identity: per source, gated count equals the
    // count of train docs with x176 keep=1 AND the Gopher gate
    val keep = q("x176_c4_quality").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("keep")).toMap
    val gateRows = docs
      .select($"doc_id", $"source",
        ext.Dedup.dupLineGate(col("text")).as("gpass"))
      .collect()
    val expect = gateRows
      .filter(r => !isHoldout(r.getLong(0)))
      .filter(r => keep(r.getLong(0)) == 1L && r.getAs[Boolean]("gpass"))
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    q("x187b_frontend_funnel").collect().foreach { r =>
      assert(r.getAs[Long]("n_gated") == expect.getOrElse(r.getString(0), 0L),
        s"source ${r.getString(0)} gated count")
    }
  }

  test("x187 schedule is a permutation of the accepted set, interleave-ordered") {
    val rows = q("x187_pretrain_frontend").collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("position")).sorted.toSeq
      == (1L to n.toLong), "positions are a permutation of 1..n")
    // position order == (priority, doc_id) order where priority =
    // src_rank/n_src with src_rank the per-source (score desc, id) rank
    val bySrc = rows.groupBy(_.getString(1))
    val prio = rows.map { r =>
      val peers = bySrc(r.getString(1))
        .sortBy(p => (-p.getAs[Double]("score"), p.getLong(0)))
      val rank = peers.indexWhere(_.getLong(0) == r.getLong(0)) + 1
      r.getLong(0) -> (rank.toDouble / peers.length, r.getLong(0))
    }.toMap
    val byPos = rows.sortBy(_.getAs[Long]("position")).map(_.getLong(0))
    assert(byPos.sortBy(prio) sameElements byPos, "interleave order violated")
  }

  test("x187 accepted docs all pass the x182-style dirty check (composition sanity)") {
    // dirty docs can never reach the schedule: recompute x182's verdict
    // on the full train split — accepted ⊆ non-dirty
    val dirty = q("x182_decontam_spans").collect()
      .filter(_.getAs[Long]("dirty") == 1L).map(_.getLong(0)).toSet
    q("x187_pretrain_frontend").collect().foreach { r =>
      assert(!dirty(r.getLong(0)), s"dirty doc ${r.getLong(0)} in the schedule")
    }
  }
}
