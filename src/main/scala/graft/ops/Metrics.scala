package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, Row}
import org.apache.spark.sql.functions._

/** Single-pass pipeline observability. A 100 TB job cannot afford a
  * second scan just to know how many rows it wrote or how many nulls it
  * dropped — `Dataset.observe` attaches accumulator-backed aggregates to
  * the EXISTING plan, so the metrics ride along with whatever action the
  * pipeline already runs (write, foreachBatch, collect). Zero extra
  * jobs, zero extra shuffles; the aggregates must be commutative
  * (count/sum/min/max — exactly what accumulators can merge).
  */
object Metrics {

  /** Attach standard data-quality counters for `cols` to `df`. Returns
    * the instrumented frame plus the Observation handle; read
    * `obs.get` AFTER the first action on the returned frame.
    * Per column: `<c>_nulls`; plus total `n_rows`.
    */
  def observed(df: DataFrame, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
