package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact-decimal money tier (`dec_pipeline`, ops/Money.scala).
  *
  * Pins the full sf0.001 output — 3 rows, computed independently by the
  * DuckDB oracle (tools/check.py) — and the property the tier exists
  * for: the result is bit-identical under any repartitioning, because
  * decimal addition IS associative where IEEE double addition is not.
  */
class MoneySpec extends SparkTestBase {

  private val expected = Seq(
    //       symbol   n_bars n_up close_sum_e4 turnover_e4
    Row3("AAPL", 323L, 159L, 161088700L, 162909600L),
    Row3("GOOGL", 320L, 155L, 161074300L, 161074300L),
    Row3("MSFT", 351L, 177L, 175826200L, 176102800L))

  private case class Row3(symbol: String, nBars: Long, nUp: Long, closeSum: Long, turnover: Long)

  private def got() =
    SparkEntry.queries("dec_pipeline")(spark, sf).collect().toSeq.map { r =>
      Row3(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }

  test("dec_pipeline: pinned sf0.001 rows, scaled-BIGINT egress schema") {
    val df = SparkEntry.queries("dec_pipeline")(spark, sf)
    assert(df.schema("close_sum_e4").dataType == LongType)
    assert(df.schema("turnover_e4").dataType == LongType)
    assert(got() == expected)
  }

  test("dec_pipeline: bit-identical under repartitioning (decimal associativity)") {
    // same pipeline but with the bar stream shuffled into 7 partitions
    // first — a stand-in for 'different cluster, different task order'.
    // Doubles would be allowed to flip low bits here; decimals are not.
    val base = graft.sources.Bars(spark, sf).repartition(7, col("datetime"))
    val dec = (round(col("close") * 1e4, 0).cast("long").cast("decimal(18,0)")
      * lit(new java.math.BigDecimal("0.0001"))).cast("decimal(18,4)")
    val sums = base.select(col("symbol"), dec.as("dec_close"), col("volume"))
      .groupBy("symbol")
      .agg((sum(col("dec_close")).cast("decimal(38,4)")
        * lit(new java.math.BigDecimal(10000))).cast("long").as("close_sum_e4"))
      .orderBy("symbol").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sums == expected.map(e => (e.symbol, e.closeSum)))
  }
}
