package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module registries; each module owns
  * both the Spark plan and (where ANSI-SQL-expressible) the DuckDB oracle
  * so the two stay mirrored.
  */
object SparkEntry {

  def registry: Seq[Q] =
    ops.Core.queries ++
      ops.Indicators.queries ++
      ops.Strategies.queries ++
      ops.Patterns.queries ++
      ops.Charts.queries ++
      ops.Dashboard.queries ++
      ops.RowOps.queries ++
      ops.Cube.queries ++
      ops.Joins.queries ++
      ops.AsOf.queries ++
      ops.Money.queries ++
      ops.Resample.queries ++
      ops.Funnel.queries ++
      ops.Scd.queries ++
      ops.Basket.queries ++
      ops.Cdc.queries ++
      ops.Stats.queries ++
      ops.Sketch.queries ++
      ext.Lm.queries ++
      ext.Pii.queries ++
      ext.SemDedup.queries ++
      ext.Fundamentals.queries ++
      ext.TextStats.queries ++
      ext.Classifier.queries ++
      ext.Repetition.queries ++
      ext.Embeddings.queries ++
      ext.Dedup.queries ++
      ext.Dedup.pipelineQueries ++
      ext.Dedup.ccQueries ++
      ext.Boilerplate.queries ++
      ext.Corpus.queries ++
      ext.Bloom.queries ++
      ext.Similarity.queries ++
      ext.Multimodal.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's essence: re-bar the event stream, score each
    * bar BUY/SELL/HOLD (`flink_processor.py:105-109`), snapshot the latest
    * signal per symbol (`provider.py:26-40`).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    ops.Core.scored(spark, "/root/testdata/sf0.001")
      .groupBy("symbol")
      .agg(
        max_by(col("close"), col("datetime")).as("price"),
        max_by(col("indicator"), col("datetime")).as("signal"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
