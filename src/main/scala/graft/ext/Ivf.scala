package graft.ext

import graft.{Q, Tables}
import graft.functions.CosineSimilarity
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a coarse quantizer of vector
  * centroids (computed with a typed `Aggregator` — SURVEY.md §2.8's custom
  * aggregation extension point), vectors assigned to their nearest
  * centroid cell, queries probing the top `NProbe` cells.
  *
  * The quantizer here seeds cells from the `label` partitions (k-means
  * iterations would refine the same plumbing; with this corpus's isotropic
  * vectors they would not converge to anything better, so we keep the
  * deterministic seed). Scale shape: centroids are tiny (k × dim) →
  * broadcast; the cell assignment is a map-only pass over the vectors; the
  * probe join shuffles only (query, cell) pairs — never the full vector
  * set against itself.
  */
object Ivf {

  private val NumQueries = 20
  private val TopK = 5
  val NProbe = 3

  /** Element-wise mean of double vectors — typed Aggregator (IN =
    * Array[Double], BUF = (sums, count), OUT = Array[Double]). */
  class VectorMean(dim: Int) extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)
    override def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) = {
      var i = 0; while (i < dim) { b._1(i) += a(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0; while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(b: (Array[Double], Long)): Array[Double] =
      if (b._2 == 0) b._1 else b._1.map(_ / b._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExprEnc.arrayDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] = ExprEnc.arrayDouble
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Centroid per label cell via the Aggregator (typed path). */
  def centroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, dir)
      .select(col("label"), transform(col("embedding"), x => x.cast("double")).as("vd"))
      .as[(Int, Array[Double])]
    val dim = 64
    vecs.groupByKey(_._1)
      .mapValues(_._2)(ExprEnc.arrayDouble)
      .agg(new VectorMean(dim).toColumn.name("centroid"))
      .toDF("cell", "centroid")
  }

  /** Nearest-cell assignment: rank cells by cosine(vector, centroid) and
    * keep the top `n` — broadcast centroids, map-only otherwise. */
  private def assign(v: DataFrame, cents: DataFrame, n: Int, s: SparkSession): DataFrame = {
    CosineSimilarity.register(s)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))
    v.crossJoin(broadcast(cents))
      .withColumn("sim", CosineSimilarity.cosineSim(col("vd"), col("centroid")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= n)
      .select(col("vec_id"), col("cell"))
  }

  /** x12: IVF ANN — vectors in 1 cell, queries probe NProbe cells,
    * exact cosine (native expression) within probed cells. Rows-only
    * driver check; ExtSpec asserts cosine exactness on hits and recall
    * versus brute force. */
  val ivfAnn = Q(
    "x12_ivf_ann_topk",
    "IVF(label-seeded cells, nprobe=3) approximate top-5")(
    (s, dir) => {
      CosineSimilarity.register(s)
      val v = Tables.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vd"))
      val cents = centroids(s, dir)
      val cells = assign(v, cents, 1, s)
      val probes = assign(v.filter(col("vec_id") < NumQueries), cents, NProbe, s)
        .withColumnRenamed("vec_id", "query_id")
      val qv = v.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("vd").as("qv"))
      val nv = v.select(col("vec_id").as("neighbor_id"), col("vd").as("nv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      probes.join(cells.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id")).distinct()
        .join(nv, "neighbor_id").join(broadcast(qv), "query_id")
        .withColumn("cos", CosineSimilarity.cosineSim(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    })

  val all: Seq[Q] = Seq(ivfAnn)
}
