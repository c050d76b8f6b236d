package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic runner (Test/runMain graft.X104Diag): prints
  * [[ext.Winnowing.candidateStats]] for the scaled corpora a prior
  * ScaleProbe run left under /tmp/graft-scale-<f> — the numbers behind
  * SCALING.md's x104 linear-candidates verdict. */
object X104Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq.map(_.toInt).foreach { f =>
      val r = ext.Winnowing.candidateStats(spark, s"/tmp/graft-scale-$f")
        .collect().head
      println(s"X104DIAG factor=$f stats=$r")
    }
    spark.stop()
  }
}
