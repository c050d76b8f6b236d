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
  * The quantizer seeds cells from the `label` partitions, then runs one
  * Lloyd re-centering iteration (`lloydStep`) — on this corpus's isotropic
  * vectors the refinement barely moves the cells, but on real clustered
  * embeddings it is the step that pulls centroids onto the modes (IvfSpec
  * proves the strict cost decrease on a synthetic clustered set). Scale
  * shape: centroids are tiny (k × dim) → broadcast; cell assignment is a
  * map-only pass over the vectors (one extra pass per Lloyd iteration);
  * the probe join shuffles only (query, cell) pairs — never the full
  * vector set against itself.
  */
object Ivf {

  private val NumQueries = 20
  private val TopK = 5
  /** Probed cells per query and Lloyd refinement passes — tuned on the
    * measured recall-vs-x5 grid (IvfSpec pins the ordering): at nprobe 4
    * of 10 cells, recall is 0.64 with the raw label seed, 0.70 after two
    * Lloyd passes. nprobe is THE latency/recall knob of any IVF index; at
    * real scale k grows ~ sqrt(N) and nprobe stays a small fraction. */
  val NProbe = 4
  val LloydIters = 2

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

  /** Element-wise mean vector per cell via the Aggregator (typed path):
    * input is any (cell: int, vd: array<double>) frame. Used both to seed
    * the quantizer from labels and to re-center cells in a Lloyd step. */
  def meanByCell(assigned: DataFrame, dim: Int = 64): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned.select(col("cell"), col("vd")).as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)(ExprEnc.arrayDouble)
      .agg(new VectorMean(dim).toColumn.name("centroid"))
      .toDF("cell", "centroid")
  }

  /** Seed centroid per label cell. */
  def centroids(s: SparkSession, dir: String): DataFrame =
    meanByCell(Tables.embeddings(s, dir)
      .select(col("label").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("vd")))

  /** One Lloyd iteration: assign every vector to its nearest current
    * centroid, then re-center each cell on the mean of its members — the
    * standard k-means refinement, run through the same broadcast-assign +
    * Aggregator plumbing as the seeding pass (two map-only passes over the
    * vectors and one keyed aggregation; nothing new at 100 TB).
    * IvfSpec pins that on genuinely clustered vectors with off-center
    * seeds one iteration strictly reduces quantization cost. */
  def lloydStep(v: DataFrame, cents: DataFrame, s: SparkSession): DataFrame =
    meanByCell(v.join(assign(v, cents, 1, s), "vec_id"))

  /** Nearest-cell assignment: rank cells by cosine(vector, centroid) and
    * keep the top `n` — broadcast centroids, map-only otherwise. */
  private[graft] def assign(v: DataFrame, cents: DataFrame, n: Int, s: SparkSession): DataFrame = {
    CosineSimilarity.register(s)
    val scored = v.crossJoin(broadcast(cents))
      .withColumn("sim", CosineSimilarity.cosineSim(col("vd"), col("centroid")))
    if (n == 1)
      // nearest-cell argmax as a max_by aggregate: map-side combined, no
      // window shuffle+sort — this is the hot path (every vector, every
      // Lloyd pass). Tie-break matches the window form: higher sim, then
      // lower cell id (cell negated inside the max'd struct).
      scored.groupBy(col("vec_id"))
        .agg(max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"))
    else {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell"))
      scored
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= n)
        .select(col("vec_id"), col("cell"))
    }
  }

  /** x12: IVF ANN — vectors in 1 cell, queries probe NProbe cells,
    * exact cosine (native expression) within probed cells. Rows-only
    * driver check; ExtSpec asserts cosine exactness on hits and recall
    * versus brute force. */
  /** The full IVF top-k for a given number of Lloyd refinement passes —
    * parameterized so IvfSpec can compare the refined quantizer against
    * the raw label seed on identical plumbing. */
  private[graft] def ivfTopK(s: SparkSession, dir: String, lloydIters: Int,
      nProbe: Int = NProbe): DataFrame = {
    CosineSimilarity.register(s)
    val v = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vd"))
    // label seed, then Lloyd re-centering passes. The centroid table is
    // read three times below (cells + two probe assignments), so
    // materialize it once — it is k x dim, trivially small.
    val cents = (1 to lloydIters)
      .foldLeft(centroids(s, dir))((c, _) => lloydStep(v, c, s))
      .localCheckpoint()
    val cells = assign(v, cents, 1, s)
    val probes = assign(v.filter(col("vec_id") < NumQueries), cents, nProbe, s)
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
  }

  val ivfAnn = Q(
    "x12_ivf_ann_topk",
    "IVF(label seed + 2 Lloyd iters, nprobe=4) approximate top-5")(
    (s, dir) => ivfTopK(s, dir, lloydIters = LloydIters))

  val all: Seq[Q] = Seq(ivfAnn)
}
