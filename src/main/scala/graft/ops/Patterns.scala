package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chart-pattern detectors (SURVEY.md §2.6 G1-G3), replicating reference
  * `streamlit_app/streamlit_app.py:242-257` as-written: G1/G2 use the
  * author's inverted triangle conjunctions (ascending = rising highs AND
  * falling lows). pandas NaN comparisons yield False, so warm-up rows are
  * `false`, not NULL — mirrored with coalesce on both engines.
  */
object Patterns {
  import Rolling._

  /** G1 (:242-246): rising rolling(5) highs AND falling rolling(5) lows. */
  def ascendingTriangle(df: DataFrame): DataFrame = {
    val d = df
      .withColumn("pt_h", rmax(col("high"), 5))
      .withColumn("pt_l", rmin(col("low"), 5))
    d.withColumn("ascending_triangle",
        coalesce(lag1(col("pt_h")) < col("pt_h") && lag1(col("pt_l")) > col("pt_l"), lit(false)))
      .drop("pt_h", "pt_l")
  }

  /** G2 (:248-252): mirror image of G1. */
  def descendingTriangle(df: DataFrame): DataFrame = {
    val d = df
      .withColumn("pt_h", rmax(col("high"), 5))
      .withColumn("pt_l", rmin(col("low"), 5))
    d.withColumn("descending_triangle",
        coalesce(lag1(col("pt_h")) > col("pt_h") && lag1(col("pt_l")) < col("pt_l"), lit(false)))
      .drop("pt_h", "pt_l")
  }

  /** G3 (:254-257): rolling(5) mean of the rolling(20)-mean slope > 0. */
  def roundingBottom(df: DataFrame): DataFrame = {
    val d = df.withColumn("pt_rm", mean(col("close"), 20))
    val d2 = d.withColumn("pt_slope", col("pt_rm") - lag1(col("pt_rm")))
    d2.withColumn("pt_bottom", mean(col("pt_slope"), 5))
      .withColumn("rounding_bottom", coalesce(col("pt_bottom") > 0, lit(false)))
      .drop("pt_rm", "pt_slope", "pt_bottom")
  }

  private def barsQ(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  def queries: Seq[Q] = Seq(
    Q("g1_ascending_triangle",
      barsQ(
        s"""p AS (SELECT symbol, datetime, ${Sql.rollMax("high", 5)} AS h5, ${Sql.rollMin("low", 5)} AS l5 FROM bars),
           |x AS (SELECT symbol, datetime,
           |  coalesce(${Sql.lag("h5")} < h5 AND ${Sql.lag("l5")} > l5, false) AS ascending_triangle FROM p)""".stripMargin,
        "SELECT symbol, datetime, ascending_triangle FROM x ORDER BY symbol, datetime")) {
      (s, dir) =>
        Indicators.tiered(s, dir, "symbol", "datetime", "ascending_triangle") {
          Q.norm(ascendingTriangle(Bars(s, dir)).select("symbol", "datetime", "ascending_triangle"),
            "symbol", "datetime")
        }
    },

    Q("g2_descending_triangle",
      barsQ(
        s"""p AS (SELECT symbol, datetime, ${Sql.rollMax("high", 5)} AS h5, ${Sql.rollMin("low", 5)} AS l5 FROM bars),
           |x AS (SELECT symbol, datetime,
           |  coalesce(${Sql.lag("h5")} > h5 AND ${Sql.lag("l5")} < l5, false) AS descending_triangle FROM p)""".stripMargin,
        "SELECT symbol, datetime, descending_triangle FROM x ORDER BY symbol, datetime")) {
      (s, dir) =>
        Indicators.tiered(s, dir, "symbol", "datetime", "descending_triangle") {
          Q.norm(descendingTriangle(Bars(s, dir)).select("symbol", "datetime", "descending_triangle"),
            "symbol", "datetime")
        }
    },

    Q("g3_rounding_bottom",
      barsQ(
        s"""p0 AS (SELECT symbol, datetime, ${Sql.rollMean("close", 20)} AS rm FROM bars),
           |p1 AS (SELECT symbol, datetime, (rm - ${Sql.lag("rm")}) AS slope FROM p0),
           |x AS (SELECT symbol, datetime,
           |  coalesce(${Sql.rollMean("slope", 5)} > 0, false) AS rounding_bottom FROM p1)""".stripMargin,
        "SELECT symbol, datetime, rounding_bottom FROM x ORDER BY symbol, datetime")) {
      (s, dir) =>
        Indicators.tiered(s, dir, "symbol", "datetime", "rounding_bottom") {
          Q.norm(roundingBottom(Bars(s, dir)).select("symbol", "datetime", "rounding_bottom"),
            "symbol", "datetime")
        }
    })
}
