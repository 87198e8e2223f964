package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The pipeline core: bar derivation (S1/S7), the flagship BUY/SELL/HOLD
  * indicator (P5, reference `flink_processor/flink_processor.py:105-109`),
  * snapshot aggregations (A1-A4, reference `streamlit_app/provider.py:26-40`,
  * `streamlit_app/streamlit_app.py:206-210,332-333,482-487`), the dashboard
  * scan (S11, `streamlit_app.py:76`) and the bounded per-symbol history
  * (S13, `provider.py:107-113`) as batch queries.
  */
object Core {

  /** P5: the Flink job's CASE indicator (`flink_processor.py:105-109`). */
  def indicator(close: Column = col("close"), open: Column = col("open")): Column =
    when(close > open, "BUY").when(close < open, "SELL").otherwise("HOLD")

  /** bars + indicator = the engine's `stock_data_output` table
    * (`postgres/init.sql:1-13`). */
  def scored(spark: SparkSession, dir: String): DataFrame =
    Bars(spark, dir).withColumn("indicator", indicator())

  val scoredCte: String =
    """scored AS (
      |  SELECT *, CASE WHEN close > open THEN 'BUY' WHEN close < open THEN 'SELL'
      |                 ELSE 'HOLD' END AS indicator
      |  FROM bars
      |)""".stripMargin

  private def q(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  private val allScoredCols =
    """round(open, 6) AS open, round(high, 6) AS high, round(low, 6) AS low,
      |round(close, 6) AS close, volume, indicator""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("bars_rebar",
      s"WITH ${Bars.cte}\n" +
        """SELECT symbol, datetime, round(open, 6) AS open, round(high, 6) AS high,
          |round(low, 6) AS low, round(close, 6) AS close, volume
          |FROM bars ORDER BY symbol, datetime""".stripMargin) {
      (s, dir) => Q.norm(Bars(s, dir), "symbol", "datetime")
    },

    // a12 (beyond-reference): OHLC re-bar 1-min -> 5-min. The classic
    // granularity rollup: open/close pick the earliest/latest member
    // bar's own open/close (deterministic — minute datetimes are unique
    // per symbol), extrema and volume merge associatively. One hash
    // aggregate; Spark's `window().start` and DuckDB's `time_bucket`
    // both align buckets to the (5-min-divisible) epoch, so the bucket
    // keys agree exactly.
    Q("a12_rebar5",
      s"WITH ${Bars.cte}\n" +
        """SELECT symbol, time_bucket(INTERVAL '5 minutes', datetime) AS bucket,
          |       round(first(open ORDER BY datetime), 6) AS open,
          |       round(max(high), 6) AS high,
          |       round(min(low), 6) AS low,
          |       round(last(close ORDER BY datetime), 6) AS close,
          |       CAST(sum(volume) AS BIGINT) AS volume
          |FROM bars GROUP BY 1, 2 ORDER BY symbol, bucket""".stripMargin) {
      (s, dir) =>
        Q.norm(
          Bars(s, dir)
            .groupBy(col("symbol"),
              window(col("datetime"), "5 minutes").getField("start").as("bucket"))
            .agg(
              min_by(col("open"), col("datetime")).as("open"),
              max(col("high")).as("high"),
              min(col("low")).as("low"),
              max_by(col("close"), col("datetime")).as("close"),
              sum(col("volume")).as("volume")),
          "symbol", "bucket")
    },

    Q("p5_indicator",
      q(scoredCte,
        s"SELECT symbol, datetime, $allScoredCols FROM scored ORDER BY symbol, datetime")) {
      (s, dir) => Q.norm(scored(s, dir), "symbol", "datetime")
    },

    Q("a1_support_resistance",
      q("x AS (SELECT symbol, min(low) AS support, max(high) AS resistance FROM bars GROUP BY symbol)",
        "SELECT symbol, round(support, 6) AS support, round(resistance, 6) AS resistance FROM x ORDER BY symbol")) {
      (s, dir) =>
        Q.norm(
          Bars(s, dir).groupBy("symbol")
            .agg(min("low").as("support"), max("high").as("resistance")),
          "symbol")
    },

    Q("a2_symbols",
      s"WITH ${Bars.cte}\nSELECT DISTINCT symbol FROM bars ORDER BY symbol") {
      (s, dir) => Bars(s, dir).select("symbol").distinct().orderBy("symbol")
    },

    Q("a3_latest_snapshot",
      q(scoredCte,
        """SELECT symbol, round(arg_max(close, datetime), 6) AS price,
          |arg_max(indicator, datetime) AS signal
          |FROM scored GROUP BY symbol ORDER BY symbol""".stripMargin)) {
      (s, dir) =>
        Q.norm(
          scored(s, dir).groupBy("symbol").agg(
            max_by(col("close"), col("datetime")).as("price"),
            max_by(col("indicator"), col("datetime")).as("signal")),
          "symbol")
    },

    Q("a4_trend",
      q("""x AS (SELECT symbol,
          |  CASE WHEN arg_max(close, datetime) > arg_min(close, datetime)
          |       THEN 'Uptrend' ELSE 'Downtrend' END AS trend
          |FROM bars GROUP BY symbol)""".stripMargin,
        "SELECT symbol, trend FROM x ORDER BY symbol")) {
      (s, dir) =>
        Q.norm(
          Bars(s, dir).groupBy("symbol").agg(
            when(max_by(col("close"), col("datetime")) > min_by(col("close"), col("datetime")),
              "Uptrend").otherwise("Downtrend").as("trend")),
          "symbol")
    },

    // S11: the dashboard poll scan — global top-100 by datetime.
    // TakeOrderedAndProject on the Spark side: no full sort materializes.
    Q("s11_top100",
      q(scoredCte +
          ",\nt AS (SELECT * FROM scored ORDER BY datetime DESC, symbol DESC LIMIT 100)",
        s"SELECT symbol, datetime, $allScoredCols FROM t ORDER BY symbol, datetime")) {
      (s, dir) =>
        Q.norm(
          scored(s, dir).orderBy(col("datetime").desc, col("symbol").desc).limit(100),
          "symbol", "datetime")
    },

    // S13: the provider's 20-row per-symbol buffer, as its batch twin.
    Q("s13_last20",
      q(scoredCte + """,
          |t AS (SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY datetime DESC) AS rn
          |      FROM scored)""".stripMargin,
        s"""SELECT symbol, datetime, $allScoredCols
           |FROM t WHERE rn <= 20 ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) =>
        val w = Window.partitionBy("symbol").orderBy(col("datetime").desc)
        Q.norm(
          scored(s, dir).withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 20).drop("rn"),
          "symbol", "datetime")
    },

    // W7-W9 rolling/shifted extrema as first-class queries (SURVEY §2.4).
    Q("w8_rolling_extrema",
      q(s"""x AS (SELECT symbol, datetime, ${Sql.rollMax("high", 5)} AS h5,
           |  ${Sql.rollMin("low", 5)} AS l5, ${Sql.rollMax("close", 20)} AS c20max,
           |  ${Sql.rollMin("close", 20)} AS c20min FROM bars)""".stripMargin,
        """SELECT symbol, datetime, round(h5, 6) AS h5, round(l5, 6) AS l5,
          |round(c20max, 6) AS c20max, round(c20min, 6) AS c20min
          |FROM x ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) =>
        Indicators.tiered(s, dir,
          "symbol", "datetime", "h5", "l5", "c20max", "c20min") {
          Q.norm(
            Bars(s, dir).select(col("symbol"), col("datetime"),
              Rolling.rmax(col("high"), 5).as("h5"), Rolling.rmin(col("low"), 5).as("l5"),
              Rolling.rmax(col("close"), 20).as("c20max"), Rolling.rmin(col("close"), 20).as("c20min")),
            "symbol", "datetime")
        }
    },

    Q("w9_shifted_extrema",
      q(s"""p AS (SELECT symbol, datetime, ${Sql.rollMax("high", 5)} AS h5, ${Sql.rollMin("low", 5)} AS l5 FROM bars),
           |x AS (SELECT symbol, datetime, ${Sql.lag("h5")} AS prev_h5, ${Sql.lag("l5")} AS prev_l5 FROM p)""".stripMargin,
        """SELECT symbol, datetime, round(prev_h5, 6) AS prev_h5, round(prev_l5, 6) AS prev_l5
          |FROM x ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) =>
        Indicators.tiered(s, dir, "symbol", "datetime", "prev_h5", "prev_l5") {
          val d = Bars(s, dir)
            .withColumn("h5", Rolling.rmax(col("high"), 5))
            .withColumn("l5", Rolling.rmin(col("low"), 5))
          Q.norm(
            d.select(col("symbol"), col("datetime"),
              Rolling.lag1(col("h5")).as("prev_h5"), Rolling.lag1(col("l5")).as("prev_l5")),
            "symbol", "datetime")
        }
    })
}
