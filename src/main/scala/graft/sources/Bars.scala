package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OHLCV bar derivation: the engine's core keyed time-series table.
  *
  * The reference ingests 1-minute OHLCV bars per symbol from yfinance
  * (reference `kafka_producer/yahoo_finance_producer.py:8-11`) keyed
  * `(symbol, datetime)` (`postgres/init.sql:12`). We derive the same shape
  * deterministically from the driver-provided `events` table (FIXTURES.md §1):
  * `symbol = ['AAPL','GOOGL','MSFT'][user_id % 3]`, re-barred into 1-minute
  * tumbling windows with `open/close = first/last value by (ts, event_id)`.
  *
  * Scale design: one hash-partitioned aggregation on `(symbol, minute)` —
  * partial (map-side) aggregation kicks in automatically for min/max/count;
  * `min_by/max_by` carry only (value, key) pairs, so the shuffle payload is
  * O(groups), not O(rows). At 100 TB the natural upgrade is pre-bucketing the
  * events source by symbol so the later per-symbol window cascade reuses the
  * same partitioning without a second shuffle.
  */
object Bars {
  val symbols: Seq[String] = Seq("AAPL", "GOOGL", "MSFT")

  /** `symbols[key % 3]` as a Column — the single definition of the
    * key->symbol mapping (also used by the fundamentals tables). */
  def symbolFor(key: Column): Column =
    element_at(array(symbols.map(lit): _*), (key % symbols.size).cast("int") + 1)

  /** DuckDB mirror of [[symbolFor]]. */
  def sqlSymbolFor(key: String): String =
    s"[${symbols.map(s => s"'$s'").mkString(",")}][CAST($key % ${symbols.size} AS INT) + 1]"

  /** (symbol, datetime) deterministic tie-break ordering key for open/close. */
  private def ord: Column = struct(col("ts"), col("event_id"))

  def apply(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("symbol", symbolFor(col("user_id")))
      .withColumn("datetime", date_trunc("minute", col("ts")))
    e.groupBy("symbol", "datetime")
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("volume"))
  }

  /** DuckDB CTE bodies mirroring [[apply]] (prepend WITH). Used by every
    * bars-based oracle in `SparkEntry.oracleSql`.
    */
  val cte: String =
    s"""e AS (
      |  SELECT ${sqlSymbolFor("user_id")} AS symbol,
      |         date_trunc('minute', ts) AS datetime, ts, event_id, value
      |  FROM events
      |), bars AS (
      |  SELECT symbol, datetime,
      |         first(value ORDER BY ts, event_id) AS open,
      |         max(value) AS high, min(value) AS low,
      |         last(value ORDER BY ts, event_id) AS close,
      |         count(*) AS volume
      |  FROM e GROUP BY symbol, datetime
      |)""".stripMargin
}
