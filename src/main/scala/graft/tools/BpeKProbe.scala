package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the BPE encode kernels' K-scaling over a LARGE corpus
  * (round-13 verdict task 6's "sf10 encode flat in K" evidence): trains
  * merge tables of several widths on the gate corpus (training cost is
  * not under test), then times encoding the target corpus through the
  * rank-greedy heap kernel vs the K-pass kernel at each width through
  * the noop sink. Expected shape: greedy flat in K (O(n log n) per
  * doc), K-pass linear in K (K in-memory passes per doc).
  *
  * Run: `SPARK_GRAFT_SF_DIR=data/sf10 sbt "runMain graft.tools.BpeKProbe"`.
  */
object BpeKProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trainDir = sys.env.getOrElse("SPARK_GRAFT_BPE_TRAIN_DIR", "/root/testdata/sf0.01")
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

    val corpus = graft.ext.Portable
      .spread(graft.sources.Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), graft.ext.Portable.tokens(col("text")).as("sym"))

    Seq(64, 256, 1024).foreach { k =>
      val table = graft.ext.Lm.bpeTrainLoop(spark, trainDir, rounds = k)
        .map(m => (m.a, m.b))
      require(graft.functions.ArrayOps.greedySafe(table))
      def time(greedy: Boolean): Double = {
        val c =
          if (greedy) graft.functions.ArrayOps.bpeEncodeGreedy(col("sym"), table)
          else graft.functions.ArrayOps.bpeEncodeAll(col("sym"), table)
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          corpus.select(col("doc_id"), size(c).cast("long").as("n"))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      }
      println(f"[bpek] K=${table.length}%4d greedy=${time(true)}%6.2f s  kpass=${time(false)}%6.2f s  ($dir)")
    }
    spark.stop()
  }
}
