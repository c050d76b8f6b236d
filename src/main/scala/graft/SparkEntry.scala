package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is registered here as a named query; those whose
  * semantics are ANSI-SQL-expressible also carry a DuckDB oracle query so
  * the driver can hash-compare results (SURVEY.md §5.1). Non-SQL ops
  * (hash-based LSH, streaming) get rows-only checks plus ScalaTest specs.
  */
object SparkEntry {

  /** All registered capabilities, grouped by module. */
  def registry: Seq[Q] =
    analytics.Reports.all ++
      analytics.Joins.all ++
      analytics.Temporal.all ++
      analytics.Funnel.all ++
      analytics.Cohort.all ++
      analytics.Markov.all ++
      analytics.Anomaly.all ++
      analytics.Spine.all ++
      analytics.Trend.all ++
      analytics.Rfm.all ++
      analytics.Olap.all ++
      analytics.Retail.all ++
      analytics.Concentration.all ++
      analytics.Survival.all ++
      analytics.Abtest.all ++
      analytics.Inventory.all ++
      analytics.HealthSynth.all ++
      etl.Etl.all ++
      etl.Diff.all ++
      etl.Audit.all ++
      functions.Scalars.all ++
      ext.Dedup.all ++
      ext.Winnowing.all ++
      ext.Pca.all ++
      ext.Fuzzy.all ++
      ext.Rewrite.all ++
      ext.Similarity.all ++
      ext.Ivf.all ++
      ext.Pq.all ++
      ext.IvfPq.all ++
      ext.SemDedup.all ++
      ext.Recall.all ++
      ext.TextStats.all ++
      ext.Multimodal.all ++
      ext.Sampling.all ++
      ext.Curation.all ++
      ext.Search.all ++
      ext.Corpus.all ++
      ext.Dsir.all ++
      ext.SignalCorr.all ++
      ext.SoftDedup.all ++
      ext.Classifier.all ++
      ext.Frontend.all ++
      ext.Bpe.all ++
      ext.Pii.all ++
      ext.Outlier.all ++
      ext.Skew.all ++
      ext.Skyline.all ++
      ext.Spatial.all ++
      ext.Snm.all ++
      ext.Bitmap.all ++
      ext.Drift.all ++
      ext.Bloom.all ++
      ext.Cms.all ++
      ext.Heavy.all ++
      ext.Profile.all ++
      ext.Graph.all ++
      ext.Itemsets.all ++
      ext.Kmeans.all ++
      ext.Kmv.all ++
      ext.Layout.all ++
      ext.Novelty.all ++
      streaming.Sessionize.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Reports.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
