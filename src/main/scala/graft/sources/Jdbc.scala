package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference reads its report tables from a
  * remote Postgres (`weekly-report.py:31-51`) and its loaders write
  * there (`load-hhs.py`, `load-quality.py`); this is that surface as
  * engine code rather than configuration-by-convention.
  *
  * Scale posture:
  * - Reads PARTITIONED on a numeric column: `numPartitions` concurrent
  *   range-sliced queries (`WHERE col >= l AND col < u`), so a 10^9-row
  *   table arrives as parallel streams instead of one connection's
  *   cursor. Catalyst pushes filters into the remote query
  *   (`PushedFilters` on the JDBC scan node — JdbcSpec asserts it).
  * - Writes batched (`batchsize`), with `numPartitions` capping the
  *   connection fan-in so a 1000-executor write cannot open 1000
  *   simultaneous connections against one database.
  * - No credentials anywhere in code: the url/properties come from the
  *   caller (the reference's credentials.py pattern, inverted — config
  *   flows IN). */
object Jdbc {

  /** Single-stream read — small dimension tables only. */
  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read — the fact-table form. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lowerBound, upperBound,
      numPartitions, props)

  /** Batched write with bounded connection fan-in. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      batchSize: Int = 1000, maxConnections: Int = 8,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    bounded.write.mode(mode)
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, props)
  }
}
