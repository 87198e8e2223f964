package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.functions._

/** The exact-money tier (SURVEY.md §1.2 flags decimal as the engine
  * extension over the reference's DOUBLE schema): one end-to-end
  * bars -> indicator -> aggregate pipeline where every money value is
  * DECIMAL, so results are bit-identical regardless of shuffle order,
  * partition count, or accumulation order — the property a financial
  * ledger needs and IEEE doubles cannot give (double addition is not
  * associative; a 1000-executor re-run can legally flip low bits).
  *
  * Shape notes, engine-parity being the hard part:
  *   - Prices enter decimal through integer quarter-basis-points
  *     (`round(close * 1e4)` on the shared product double — the same
  *     cross-engine tie-break rationale as [[graft.Q.r6]]), then scale
  *     by the exact decimal literal 0.0001. No decimal division
  *     anywhere: Spark and DuckDB disagree on quotient scale rules,
  *     but agree perfectly on +, *, comparisons, and SUM.
  *   - The decimal sums leave the query as exact scaled-BIGINT unit
  *     counts (`* 10000` then CAST to BIGINT — the [[graft.ext]] e7
  *     digest convention): a DECIMAL(38,4) output column hashes
  *     differently across engines (Spark emits decimal128 arrow,
  *     DuckDB picks its own width/scale repr), while the integer
  *     number of 1e-4 units is representation-free. The sum itself
  *     is still computed in decimal — exactness end-to-end — only
  *     the *egress* is integer. Headroom: 2^63 units = 9.2e14 money
  *     units, beyond any single symbol's turnover here; the interior
  *     decimal(38,4) carries the 100 TB path.
  *   - The indicator step compares decimals (exact), and the aggregate
  *     is a plain hash agg with map-side partials — decimal sums keep
  *     the same one-shuffle plan the double pipeline has.
  */
object Money {

  def queries: Seq[Q] = Seq(
    Q("dec_pipeline",
      s"""WITH ${Bars.cte},
         |d AS (SELECT symbol, datetime, volume,
         |        CAST(CAST(round(close * 1e4, 0) AS BIGINT) * 0.0001 AS DECIMAL(18,4)) AS dec_close
         |      FROM bars),
         |i AS (SELECT *, CASE WHEN dec_close > lag(dec_close)
         |        OVER (PARTITION BY symbol ORDER BY datetime)
         |        THEN 1 ELSE 0 END AS up
         |      FROM d)
         |SELECT symbol,
         |       count(*) AS n_bars,
         |       CAST(sum(up) AS BIGINT) AS n_up,
         |       CAST(sum(dec_close) * 10000 AS BIGINT) AS close_sum_e4,
         |       CAST(sum(dec_close * volume) * 10000 AS BIGINT) AS turnover_e4
         |FROM i GROUP BY symbol ORDER BY symbol""".stripMargin) {
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("symbol").orderBy("datetime")
        val d = Bars(s, dir).select(col("symbol"), col("datetime"), col("volume"),
          (round(col("close") * 1e4, 0).cast("long").cast("decimal(18,0)")
            * lit(new java.math.BigDecimal("0.0001")))
            .cast("decimal(18,4)").as("dec_close"))
        val i = d.withColumn("up",
          when(col("dec_close") > lag(col("dec_close"), 1).over(w), 1).otherwise(0))
        Q.norm(
          i.groupBy("symbol").agg(
            count(lit(1)).as("n_bars"),
            sum(col("up")).as("n_up"),
            (sum(col("dec_close")).cast("decimal(38,4)")
              * lit(new java.math.BigDecimal(10000))).cast("long").as("close_sum_e4"),
            (sum(col("dec_close") * col("volume")).cast("decimal(38,4)")
              * lit(new java.math.BigDecimal(10000))).cast("long").as("turnover_e4")),
          "symbol")
      }
    })
}
