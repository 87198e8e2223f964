package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate tier of the aggregation surface.
  * At 100 TB an exact `count(DISTINCT user_id)` plans an Expand +
  * second shuffle keyed by the distinct value itself (every unique value
  * crosses the network); the HLL++ sketch is a fixed-size (~1.5 KB at
  * 5% rsd) commutative accumulator that partial-aggregates map-side and
  * merges associatively — the ONLY distinct-count that stays one-shuffle
  * and bounded-memory regardless of cardinality. Not exposed through the
  * oracle gate (DuckDB's HLL is a different implementation; the numbers
  * legitimately differ inside the error bound), so the contract here is
  * the error bound itself, pinned by `SketchSpec`.
  */
object Sketch {

  /** Per-group approximate distinct count alongside the row count.
    * `rsd` is the target relative standard deviation (Spark default
    * 0.05); memory per group is O(1/rsd^2), independent of cardinality.
    */
  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      target: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(target), rsd).as(s"approx_distinct_$target"),
        count(lit(1)).as("n_rows"))

  /** Exact twin, for spec-side error measurement (the plan everyone
    * should avoid at scale: distinct values shuffle twice).
    */
  def exactDistinct(df: DataFrame, groupCols: Seq[String], target: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(target)).as(s"exact_distinct_$target"))

  /** Per-group approximate percentiles (Greenwald-Khanna/KLL-style
    * mergeable quantile summary). Exact `percentile` buffers EVERY value
    * of the group in the aggregation state — at 100 TB a hot group is an
    * executor OOM, not a slow query. The sketch state is
    * O(accuracy * log n), merges associatively (map-side partials, any
    * partitioning), and guarantees rank error <= n/accuracy: for
    * accuracy 10000 the returned p99 sits between the true p98.99 and
    * p99.01 — the property pinned by `SketchSpec` on skewed data. Not
    * oracle-gated (DuckDB's approx sketch is a different implementation;
    * values legitimately differ inside the bound) — the error bound IS
    * the contract, same as [[approxDistinct]].
    */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      target: String,
      percentages: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = percentages.map { p =>
      percentile_approx(col(target), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
