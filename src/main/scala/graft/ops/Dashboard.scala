package graft.ops

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dashboard's full analytical cascade as ONE query (SURVEY.md §3.2):
  * scan -> bars -> indicator -> EMA5/15, SMA, RSI, TSI, MACD, ADX -> four
  * strategy signals -> three pattern flags -> colour flag -> trend label —
  * the entire per-tick recomputation of reference
  * `streamlit_app/streamlit_app.py:340-487` as a single Spark plan.
  *
  * Scale design — this is the query that proves the cascade architecture:
  * every window shares `partitionBy(symbol)`, so Catalyst plans the whole
  * thing as ONE Exchange(hashpartitioning(symbol)) + ONE Sort, followed by
  * consecutive Window operators and a final Project. Adding an indicator
  * column costs zero additional shuffles; at 100 TB the cascade reads the
  * source once and shuffles once.
  */
object Dashboard {
  import Rolling._

  def cascade(spark: SparkSession, dir: String): DataFrame = {
    val scored = Core.scored(spark, dir)
    val b = Indicators.withIndicatorCols(scored)
    val s1 = Strategies.scalping(b).withColumnRenamed("signal", "scalping_signal")
    val s2 = Strategies.rangeTrading(s1).withColumnRenamed("signal", "range_signal")
    val s3 = Strategies.momentum(s2).withColumnRenamed("signal", "momentum_signal")
      .drop("momentum")
    val s4 = Strategies.breakout(s3).withColumnRenamed("signal", "breakout_signal")
    val p = Patterns.roundingBottom(Patterns.descendingTriangle(Patterns.ascendingTriangle(s4)))
    val c = Charts.colorFlag(p)
    val whole = Window.partitionBy("symbol").orderBy("datetime")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.withColumn("trend",
      when(last("close").over(whole) > first("close").over(whole), "Uptrend")
        .otherwise("Downtrend"))
  }

  // one CTE stage per dependency depth; each stage SELECT *-extends the
  // previous so the chain mirrors the Spark column cascade exactly
  private val oracle: String = {
    val ctes =
      s"""c1 AS (SELECT *,
         |  ${Sql.ewmaSpan("close", 5)} AS ema5, ${Sql.ewmaSpan("close", 15)} AS ema15,
         |  ${Sql.rollMean("close", 20)} AS sma, ${Sql.rollMean("close", 20)} AS rm20,
         |  ${Sql.diff("close")} AS delta, ${Sql.lag("close")} AS pc,
         |  ${Sql.diff("high")} AS hd, ${Sql.diff("low")} AS ld,
         |  ${Sql.diffK("close", 5)} AS mom,
         |  ${Sql.rollMax("high", 5)} AS h5, ${Sql.rollMin("low", 5)} AS l5,
         |  ${Sql.rollMax("close", 5)} AS c5max, ${Sql.rollMin("close", 5)} AS c5min,
         |  ${Sql.rollMax("close", 20)} AS c20max, ${Sql.rollMin("close", 20)} AS c20min,
         |  ${Sql.ewmaSpan("close", 12)} AS e12, ${Sql.ewmaSpan("close", 26)} AS e26,
         |  min(low) OVER (PARTITION BY symbol) AS support,
         |  max(high) OVER (PARTITION BY symbol) AS resistance,
         |  first(close) OVER (PARTITION BY symbol ORDER BY datetime
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS firstc,
         |  last(close) OVER (PARTITION BY symbol ORDER BY datetime
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lastc
         |  FROM scored),
         |c2 AS (SELECT *,
         |  CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
         |  CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss,
         |  ${Sql.ewmaSpan("delta", 25)} AS te1, ${Sql.ewmaSpan("abs(delta)", 25)} AS ta1,
         |  (e12 - e26) AS macd,
         |  CASE WHEN hd > ld AND hd > 0 THEN hd ELSE 0.0 END AS pdm,
         |  CASE WHEN ld > hd AND ld > 0 THEN ld ELSE 0.0 END AS mdm,
         |  CASE WHEN pc IS NULL THEN high - low
         |       ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr,
         |  ${Sql.lag("h5")} AS prev_h5, ${Sql.lag("l5")} AS prev_l5,
         |  ${Sql.lag("c20max")} AS prev_c20max, ${Sql.lag("c20min")} AS prev_c20min,
         |  (rm20 - ${Sql.lag("rm20")}) AS rm_slope
         |  FROM c1),
         |c3 AS (SELECT *,
         |  ${Sql.rollMean("gain", 14)} AS ag, ${Sql.rollMean("loss", 14)} AS al,
         |  ${Sql.ewmaSpan("te1", 13)} AS te2, ${Sql.ewmaSpan("ta1", 13)} AS ta2,
         |  ${Sql.ewmaSpan("macd", 9)} AS macd_signal,
         |  ${Sql.ewma("pdm", "1.0/14.0")} AS epdm, ${Sql.ewma("mdm", "1.0/14.0")} AS emdm,
         |  ${Sql.rollMean("tr", 14)} AS atr,
         |  ${Sql.rollMean("rm_slope", 5)} AS bottom
         |  FROM c2),
         |c4 AS (SELECT *,
         |  CASE WHEN al = 0 AND ag = 0 THEN NULL WHEN al = 0 THEN 100.0
         |       ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi,
         |  CASE WHEN ta2 = 0 THEN NULL ELSE 100.0 * (te2 / ta2) END AS tsi,
         |  CASE WHEN atr = 0 THEN NULL ELSE 100.0 * (epdm / atr) END AS pdi,
         |  CASE WHEN atr = 0 THEN NULL ELSE 100.0 * (emdm / atr) END AS mdi
         |  FROM c3),
         |c5 AS (SELECT *, CASE WHEN pdi + mdi = 0 THEN NULL
         |       ELSE 100.0 * abs(pdi - mdi) / (pdi + mdi) END AS dxin FROM c4),
         |c6 AS (SELECT *, ${Sql.rollMean("dxin", 14)} AS dx FROM c5),
         |c7 AS (SELECT *, ${Sql.ewma("dx", "1.0/14.0")} AS adx FROM c6)""".stripMargin
    val select =
      """SELECT symbol, datetime,
        |  round(open, 6) AS open, round(high, 6) AS high, round(low, 6) AS low,
        |  round(close, 6) AS close, volume, indicator,
        |  round(ema5, 6) AS ema5, round(ema15, 6) AS ema15, round(sma, 6) AS sma,
        |  round(rsi, 6) AS rsi, round(tsi, 6) AS tsi,
        |  round(macd, 6) AS macd, round(macd_signal, 6) AS macd_signal,
        |  round(adx, 6) AS adx,
        |  CASE WHEN close < c5min THEN 1 WHEN close > c5max THEN -1 ELSE 0 END AS scalping_signal,
        |  CASE WHEN close >= resistance * 0.95 THEN -1
        |       WHEN close <= support * 1.05 THEN 1 ELSE 0 END AS range_signal,
        |  CASE WHEN mom > 0 THEN 1 WHEN mom < 0 THEN -1 ELSE 0 END AS momentum_signal,
        |  CASE WHEN close > prev_c20max THEN 1 WHEN close < prev_c20min THEN -1 ELSE 0 END AS breakout_signal,
        |  coalesce(prev_h5 < h5 AND prev_l5 > l5, false) AS ascending_triangle,
        |  coalesce(prev_h5 > h5 AND prev_l5 < l5, false) AS descending_triangle,
        |  coalesce(bottom > 0, false) AS rounding_bottom,
        |  CASE WHEN delta > 0 THEN 'green' ELSE 'red' END AS color,
        |  CASE WHEN lastc > firstc THEN 'Uptrend' ELSE 'Downtrend' END AS trend
        |FROM c7 ORDER BY symbol, datetime""".stripMargin
    s"WITH ${graft.sources.Bars.cte}, ${Core.scoredCte}, $ctes\n$select"
  }

  def queries: Seq[Q] = Seq(
    Q("dashboard_cascade", oracle) { (s, dir) =>
      Q.norm(cascade(s, dir).select(
        col("symbol"), col("datetime"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("indicator"),
        col("ema5"), col("ema15"), col("sma"), col("rsi"), col("tsi"),
        col("macd"), col("macd_signal"), col("adx"),
        col("scalping_signal"), col("range_signal"), col("momentum_signal"),
        col("breakout_signal"), col("ascending_triangle"),
        col("descending_triangle"), col("rounding_bottom"), col("color"),
        col("trend")), "symbol", "datetime")
    })
}
