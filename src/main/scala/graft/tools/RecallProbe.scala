package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the IVF-ADC recall-vs-nprobe curve against brute-force
  * ground truth on a LARGE corpus (round-13 verdict task 3's "gate
  * corpus + sf10" evidence — RecallSpec covers the gate corpus; this
  * prices the same curve at 100×, where cluster occupancy differs).
  * Also times the serve-side plan per width so the recall/latency
  * trade is one table.
  *
  * Run: `SPARK_GRAFT_SF_DIR=data/sf10 sbt "runMain graft.tools.RecallProbe"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "data/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = pairs(graft.SparkEntry.queries("e2_knn_brute")(spark, dir))
    require(brute.nonEmpty)
    Seq(2, 4, 6).foreach { np =>
      val t0 = System.nanoTime()
      val got = pairs(graft.ext.Embeddings.ivfAdcPlan(spark, dir, np))
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = (got & brute).size.toDouble / brute.size
      println(f"[recall] $dir nprobe=$np recall@k=${recall}%.3f " +
        f"(${(got & brute).size}/${brute.size}) plan_sec=$dt%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
