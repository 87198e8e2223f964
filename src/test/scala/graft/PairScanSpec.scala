package graft

import graft.ops.{Indicators, PairScan}
import org.apache.spark.sql.Row

/** The pair-stats chunked replay must equal the pair-partitioned window
  * EXACTLY (every emitted column is an integer sufficient statistic over
  * a bounded frame — there is no tolerance to hide behind), on every
  * partitioning including counts far above the row count.
  */
class PairScanSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("pair", "datetime").collect().map(_.toSeq).toSeq

  private def check(pairs: Option[Seq[(String, String)]]): Unit = {
    val win = rows(Indicators.pairStats(spark, sf, pairs)) // gate SF → window arm
    assert(win.nonEmpty, "fixture produced no pair rows")
    val xy = Indicators.pairXY(spark, sf, pairs)
    for (n <- Seq(2, 7, 64)) {
      val scan = rows(PairScan.stats(spark, xy, numPartitions = n))
      assert(scan == win, {
        val diff = scan.zip(win).zipWithIndex.collectFirst {
          case ((a, b), i) if a != b => s"first diff at row $i: $a vs $b"
        }
        s"scan != window at n=$n (${diff.getOrElse("row count differs")})"
      })
    }
  }

  test("all-pairs stats: scan ≡ window bit-for-bit on 2/7/64 partitions") {
    check(None)
  }

  test("restricted-pairs stats: scan ≡ window with the leg/pair predicates applied") {
    check(Some(Indicators.SelectedPairs))
  }
}
