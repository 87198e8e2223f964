package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chart-data transforms (SURVEY.md §2.7 C1-C3, C5/P9) — data, not pixels.
  * Replicates reference `streamlit_app/streamlit_app.py:259-292,319-321`
  * as-written: Heikin-Ashi high/low take the max/min over the ORIGINAL
  * open/close/high-low (not the HA values); Renko's open lags the *new*
  * (o+h+l+c)/4 close and drops the first row; the colour flag maps a NULL
  * first diff to 'red' (pandas NaN > 0 is False).
  */
object Charts {
  import Rolling._

  /** C1 Heikin-Ashi (:259-265). */
  def heikinAshi(df: DataFrame): DataFrame =
    df.select(
      col("symbol"), col("datetime"),
      ((lag1(col("open")) + lag1(col("close"))) / 2).as("ha_open"),
      greatest(col("open"), col("close"), col("high")).as("ha_high"),
      least(col("open"), col("close"), col("low")).as("ha_low"),
      ((col("open") + col("high") + col("low") + col("close")) / 4).as("ha_close"),
      col("volume"))

  /** C2 Renko, simplified (:281-286). */
  def renko(df: DataFrame): DataFrame = {
    val d = df.withColumn("r_close", (col("open") + col("high") + col("low") + col("close")) / 4)
      .withColumn("r_open", lag1(col("r_close")))
    d.filter(col("r_open").isNotNull)
      .select(col("symbol"), col("datetime"), col("r_open").as("open"),
        col("high"), col("low"), col("r_close").as("close"), col("volume"))
  }

  /** C3 Raindrop (:288-292): volume split by up/down bar. */
  def raindrop(df: DataFrame): DataFrame =
    df.select(col("symbol"), col("datetime"), col("close"), col("volume"),
      (col("volume") * when(col("close") > col("open"), 1L).otherwise(0L)).as("volume_up"),
      (col("volume") * when(col("close") <= col("open"), 1L).otherwise(0L)).as("volume_down"))

  /** C5/P9 colour flag (:319-321): sign of close.diff; NULL -> 'red'. */
  def colorFlag(df: DataFrame): DataFrame =
    df.withColumn("color",
      when(diff(col("close")) > 0, "green").otherwise("red"))

  private def barsQ(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  def queries: Seq[Q] = Seq(
    Q("c1_heikin_ashi",
      barsQ(
        s"""x AS (SELECT symbol, datetime,
           |  (${Sql.lag("open")} + ${Sql.lag("close")}) / 2 AS ha_open,
           |  greatest(open, close, high) AS ha_high,
           |  least(open, close, low) AS ha_low,
           |  (open + high + low + close) / 4 AS ha_close, volume FROM bars)""".stripMargin,
        """SELECT symbol, datetime, round(ha_open, 6) AS ha_open, round(ha_high, 6) AS ha_high,
          |round(ha_low, 6) AS ha_low, round(ha_close, 6) AS ha_close, volume
          |FROM x ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) => Q.norm(heikinAshi(Bars(s, dir)), "symbol", "datetime")
    },

    Q("c2_renko",
      barsQ(
        s"""r0 AS (SELECT symbol, datetime, high, low, volume,
           |  (open + high + low + close) / 4 AS close FROM bars),
           |x AS (SELECT symbol, datetime, ${Sql.lag("close")} AS open, high, low, close, volume FROM r0)""".stripMargin,
        """SELECT symbol, datetime, round(open, 6) AS open, round(high, 6) AS high,
          |round(low, 6) AS low, round(close, 6) AS close, volume
          |FROM x WHERE open IS NOT NULL ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) => Q.norm(renko(Bars(s, dir)), "symbol", "datetime")
    },

    Q("c3_raindrop",
      barsQ(
        """x AS (SELECT symbol, datetime, close, volume,
          |  volume * (CASE WHEN close > open THEN 1 ELSE 0 END) AS volume_up,
          |  volume * (CASE WHEN close <= open THEN 1 ELSE 0 END) AS volume_down FROM bars)""".stripMargin,
        """SELECT symbol, datetime, round(close, 6) AS close, volume, volume_up, volume_down
          |FROM x ORDER BY symbol, datetime""".stripMargin)) {
      (s, dir) => Q.norm(raindrop(Bars(s, dir)), "symbol", "datetime")
    },

    Q("p9_color_flag",
      barsQ(
        s"""x AS (SELECT symbol, datetime, close,
           |  CASE WHEN ${Sql.diff("close")} > 0 THEN 'green' ELSE 'red' END AS color FROM bars)""".stripMargin,
        "SELECT symbol, datetime, round(close, 6) AS close, color FROM x ORDER BY symbol, datetime")) {
      (s, dir) =>
        Q.norm(colorFlag(Bars(s, dir)).select("symbol", "datetime", "close", "color"),
          "symbol", "datetime")
    })
}
