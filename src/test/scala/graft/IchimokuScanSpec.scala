package graft

import graft.ops.{Indicators, IchimokuScan}
import org.apache.spark.sql.Row

/** [[graft.ops.IchimokuScan]] must compute EXACTLY the window tier's
  * function on every partitioning — bit-equal, not tolerance-equal:
  * every Ichimoku column is a bounded-frame expression ((max+min)/2,
  * a 26-row lag of that, a 26-row lead of close), and the scan replays
  * the identical IEEE expressions on the identical operands, so any
  * difference at all is a boundary-composition bug (warm-up or
  * look-ahead), not rounding.
  */
class IchimokuScanSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Array[Row] =
    df.orderBy("symbol", "datetime").collect()

  private def assertBitSame(a: Array[Row], b: Array[Row], ctx: String): Unit = {
    assert(a.length == b.length, s"$ctx: ${a.length} vs ${b.length} rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      (0 until x.length).foreach { j =>
        val (u, v) = (x.get(j), y.get(j))
        (u, v) match {
          case (null, null) => ()
          case (du: Double, dv: Double) =>
            assert(java.lang.Double.doubleToLongBits(du) ==
              java.lang.Double.doubleToLongBits(dv),
              s"$ctx row $i col $j: $du vs $dv not bit-equal (row: $x / $y)")
          case _ =>
            assert(u == v, s"$ctx row $i col $j: $u vs $v (row: $x / $y)")
        }
      }
    }
  }

  private lazy val window = rows(Indicators.ichimokuWindowsRaw(spark, sf))

  test("ichimoku scan is bit-equal to the window tier (default partitioning)") {
    assert(window.nonEmpty)
    // the fixture is deep enough that leads/lags are actually exercised
    assert(window.exists(r => !r.isNullAt(5)), "no senkou_a ever non-null")
    assert(window.exists(r => r.isNullAt(7)), "no trailing chikou NULLs")
    assertBitSame(window, rows(IchimokuScan(spark, sf)), "default")
  }

  test("ichimoku scan is partitioning-invariant (multi-partition warm-up AND look-ahead chains)") {
    // 64 partitions over ~hundreds of rows: chunks far below WarmLen and
    // often below LeadLen, so BOTH boundary compositions walk multiple
    // partitions (and some partitions are empty) — the adversarial case
    // for the driver folds.
    assertBitSame(window, rows(IchimokuScan(spark, sf, numPartitions = 64)), "n=64")
    assertBitSame(window, rows(IchimokuScan(spark, sf, numPartitions = 2)), "n=2")
    assertBitSame(window, rows(IchimokuScan(spark, sf, numPartitions = 7)), "n=7")
    // n=1: no boundaries at all — pins the plain state machine
    assertBitSame(window, rows(IchimokuScan(spark, sf, numPartitions = 1)), "n=1")
  }

  test("standalone indicator tier dispatch: both w17 arms registered, one oracle") {
    val reg = SparkEntry.registry
    val w17 = reg.find(_.name == "w17_ichimoku").get
    val w17s = reg.find(_.name == "w17_ichimoku_scan").get
    assert(w17.oracle == w17s.oracle, "the two tiers must answer one oracle")
    // at the tiny test SF the dispatch stays on the window arm
    assert(!graft.ops.Dashboard.deepHistory(spark, sf))
    assertBitSame(rows(Indicators.ichimokuWindows(spark, sf)),
      rows(SparkEntry.queries("w17_ichimoku")(spark, sf)), "dispatched-arm")
  }
}
