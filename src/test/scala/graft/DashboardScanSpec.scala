package graft

import graft.ops.{Dashboard, DashboardScan}
import org.apache.spark.sql.Row

/** The scan cascade must compute the same function as the window cascade
  * on every partitioning — including partition counts far above the row
  * count (empty partitions, multi-partition warm-up chains).
  */
class DashboardScanSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Array[Row] =
    df.orderBy("symbol", "datetime").collect()

  private def assertSame(a: Array[Row], b: Array[Row], ctx: String): Unit = {
    assert(a.length == b.length, s"$ctx: ${a.length} vs ${b.length} rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      (0 until x.length).foreach { j =>
        val (u, v) = (x.get(j), y.get(j))
        (u, v) match {
          case (null, null) => ()
          case (du: Double, dv: Double) =>
            val tol = 1e-9 * math.max(1.0, math.max(math.abs(du), math.abs(dv)))
            assert(math.abs(du - dv) <= tol,
              s"$ctx row $i col $j: $du vs $dv (row: $x / $y)")
          case _ =>
            assert(u == v, s"$ctx row $i col $j: $u vs $v (row: $x / $y)")
        }
      }
    }
  }

  test("scan cascade matches the window cascade (default partitioning)") {
    val w = rows(Dashboard.cascadeWindows(spark, sf))
    val s = rows(DashboardScan.cascade(spark, sf))
    assert(w.nonEmpty)
    assert(w.head.length == s.head.length, "column arity differs")
    assertSame(w, s, "default")
  }

  test("scan cascade is partitioning-invariant (chained multi-partition warm-up)") {
    val w = rows(Dashboard.cascadeWindows(spark, sf))
    // 64 partitions over ~hundreds of rows: every chunk is far below
    // TailLen, so warm-up tails compose across MANY partitions, and some
    // partitions are empty — the adversarial case for the driver fold.
    val s64 = rows(DashboardScan.cascade(spark, sf, numPartitions = 64))
    assertSame(w, s64, "n=64")
    val s2 = rows(DashboardScan.cascade(spark, sf, numPartitions = 2))
    assertSame(w, s2, "n=2")
  }
}
