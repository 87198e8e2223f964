package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — pandas' `resample('1T').ffill()`
  * (the implicit step under every indicator chart in the reference's
  * dashboard: `stock_dashboard.py` plots assume a continuous minute axis,
  * while `flink_processor.py`'s event-time bars have holes wherever no
  * trade printed).
  *
  * Shape: per-symbol min/max span -> `sequence(...)` minute grid ->
  * left join the real bars -> last-observation-carried-forward via
  * `last(close, ignoreNulls)` over an unbounded-preceding row frame.
  *
  * Scale: the grid is |span| rows per symbol (dense time, not dense
  * data) and joins on (symbol, minute) — one shuffle, same key as every
  * downstream window, so Catalyst reuses the exchange for the LOCF
  * window. At 100 TB the LOCF window is the per-key ordered scan every
  * w* indicator already pays; for a single enormous key, segment the
  * time axis and carry boundary values with a two-phase pass (the
  * x_pack distributed-prefix pattern).
  */
object Resample {

  def queries: Seq[Q] = Seq(
    Q("a14_gapfill",
      s"""WITH ${Bars.cte},
         |span AS (SELECT symbol, min(datetime) AS t0, max(datetime) AS t1
         |         FROM bars GROUP BY symbol),
         |grid AS (SELECT symbol,
         |                unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute_ts
         |         FROM span),
         |g AS (SELECT grid.symbol, grid.minute_ts, bars.close, bars.volume
         |      FROM grid LEFT JOIN bars
         |        ON bars.symbol = grid.symbol AND bars.datetime = grid.minute_ts)
         |SELECT symbol, minute_ts,
         |       round(last_value(close IGNORE NULLS) OVER (
         |         PARTITION BY symbol ORDER BY minute_ts
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS close_ff,
         |       CAST(coalesce(volume, 0) AS BIGINT) AS volume,
         |       CAST(CASE WHEN close IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
         |FROM g ORDER BY symbol, minute_ts""".stripMargin) {
      (s, dir) => {
        val bars = Bars(s, dir).select(
          col("symbol"), col("datetime").as("minute_ts"), col("close"), col("volume"))
        val grid = bars.groupBy("symbol")
          .agg(min("minute_ts").as("t0"), max("minute_ts").as("t1"))
          .select(col("symbol"),
            explode(sequence(col("t0"), col("t1"), expr("interval 1 minute")))
              .as("minute_ts"))
        val g = grid.join(bars, Seq("symbol", "minute_ts"), "left")
        val w = Window.partitionBy("symbol").orderBy("minute_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Q.norm(
          g.select(col("symbol"), col("minute_ts"),
            last(col("close"), ignoreNulls = true).over(w).as("close_ff"),
            coalesce(col("volume"), lit(0L)).cast("long").as("volume"),
            when(col("close").isNull, 1L).otherwise(0L).as("is_gap")),
          "symbol", "minute_ts")
      }
    })
}
