package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Pipeline
import graft.streaming.Pipeline.Bar

/** Attributes the steady-state streaming latency TAIL (round-15 verdict
  * task 5: the 10k-key × 50-batch rung measured p50 479 ms vs p99 3.7 s
  * — a 7.7× tail with no explanation). Runs the same rung as
  * StreamingSpec's steady-state test and prints ONE line per batch with
  * the engine's phase breakdown (triggerExecution / addBatch /
  * walCommit / commitOffsets) plus the RocksDB state-store commit
  * custom metrics (flush / compaction / checkpoint / file-sync / pause)
  * summed over partitions — so a slow batch says WHICH phase ate it.
  *
  * Run: `sbt "runMain graft.tools.SteadyProbe [keys] [batches]"`.
  */
object SteadyProbe {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(10000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

    def bar(sym: String, i: Int): Bar =
      Bar(sym, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
        i, i + 1, i - 1, i, 10L, 0.0, 0.0, "HOLD")

    val gcBeans = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans).asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum

    val input = MemoryStream[Bar](spark)
    val q = Pipeline.indicatorCascade(input.toDS())
      .writeStream.format("memory").queryName("steadyprobe")
      .outputMode("append").start()
    var lastBatchId = -1L
    for (i <- 0 until batches) {
      input.addData((0 until keys).map(k => bar(f"S$k%05d", i)))
      val g0 = gcMs
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wallMs = (System.nanoTime() - t0) / 1000000
      val dGc = gcMs - g0
      // progress events for the batches just processed
      val progs = q.recentProgress.filter(p =>
        p.batchId > lastBatchId && p.numInputRows > 0)
      progs.foreach { p =>
        lastBatchId = math.max(lastBatchId, p.batchId)
        val d = p.durationMs
        def dm(k: String): Long =
          Option(d.get(k)).map(_.longValue).getOrElse(-1L)
        val custom = p.stateOperators.headOption.map { so =>
          val cm = so.customMetrics
          def c(k: String): Long = Option(cm.get(k)).map(_.longValue).getOrElse(-1L)
          f"flush=${c("rocksdbCommitFlushLatency")} compact=${c("rocksdbCommitCompactLatency")} " +
            f"ckpt=${c("rocksdbCommitCheckpointLatency")} sync=${c("rocksdbCommitFileSyncLatencyMs")} " +
            f"pause=${c("rocksdbCommitPauseLatency")} writeBatch=${c("rocksdbCommitWriteBatchLatency")} " +
            f"sstBytes=${c("rocksdbSstFileSize")} memBytes=${c("rocksdbTotalMemoryUsageBytes")}"
        }.getOrElse("no-state-op")
        println(f"[steady] batch=${p.batchId}%3d wall=${wallMs}%5d ms gc=${dGc}%4d ms " +
          f"trigger=${dm("triggerExecution")}%5d addBatch=${dm("addBatch")}%5d " +
          f"walCommit=${dm("walCommit")}%4d commitOffsets=${dm("commitOffsets")}%4d | $custom")
      }
    }
    q.stop()
    spark.stop()
  }
}
