package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Perf diagnostic: times each dashboard-cascade layer via noop writes
  * (median of 3). Found the round-2 RangePartitioning double-execution.
  */
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def time(name: String, df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-28s median=${ts(1)}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warmup
    ops.Core.scored(spark, sfDir).write.format("noop").mode("overwrite").save()

    time("scored (scan+bars)", ops.Core.scored(spark, sfDir))
    val layers = ops.Dashboard.layers(spark, sfDir)
    layers.zipWithIndex.foreach { case (df, i) => time(s"through L${i + 1}", df) }
    time("full cascade", ops.Dashboard.cascade(spark, sfDir))
    time("dashboard_cascade (bench q)", SparkEntry.queries("dashboard_cascade")(spark, sfDir))
    spark.stop()
  }
}
