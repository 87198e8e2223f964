package graft.ops

import graft.Q
import graft.ext.Portable
import graft.sources.{Bars, Tables}
import org.apache.spark.sql.functions._

/** Multi-level aggregation + sampling operators — capabilities the
  * reference lacks entirely (SURVEY.md §2.3 "absent" list) covered with
  * their stock Spark answers, oracle-checked.
  */
object Cube {

  private def barsQ(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  def queries: Seq[Q] = Seq(

    // ROLLUP (symbol, trading day): per-day stats, per-symbol subtotals,
    // grand total. Decimal sums keep cross-shuffle accumulation exact.
    Q("a5_rollup",
      barsQ(
        """x AS (SELECT coalesce(symbol, 'ALL') AS symbol,
          |              coalesce(strftime(date_trunc('day', datetime), '%Y-%m-%d'), 'ALL') AS day,
          |              CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS close_sum,
          |              count(*) AS n_bars
          |       FROM bars GROUP BY ROLLUP (symbol, date_trunc('day', datetime)))""".stripMargin,
        """SELECT symbol, day, round(close_sum, 6) AS close_sum, n_bars
          |FROM x ORDER BY symbol, day""".stripMargin)) {
      (s, dir) =>
        Q.norm(
          Bars(s, dir)
            .rollup(col("symbol"), date_trunc("day", col("datetime")).as("d"))
            .agg(sum(col("close").cast("decimal(18,2)")).cast("double").as("close_sum"),
              count(lit(1)).as("n_bars"))
            .select(
              coalesce(col("symbol"), lit("ALL")).as("symbol"),
              coalesce(date_format(col("d"), "yyyy-MM-dd"), lit("ALL")).as("day"),
              col("close_sum"), col("n_bars")),
          "symbol", "day")
    },

    // Deterministic hash sampling: stable ~10% sample keyed on doc_id —
    // the production-correct way to sample reproducibly across engines
    // and runs (engine-native random samples are not comparable).
    Q("x_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${Portable.sqlHash60("CAST(doc_id AS VARCHAR)")} % 10 = 0
         |ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .where(Portable.hash60(col("doc_id").cast("string")) % 10 === 0)
          .select("doc_id", "lang")
          .orderBy("doc_id")
    })
}
