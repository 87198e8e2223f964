package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Runtime row-level filtering: Spark's InjectRuntimeFilter builds a
  * bloom filter from the selective (dimension) side of a shuffle join and
  * pushes `might_contain` onto the fact-side SCAN — the row-level
  * complement of j7's dynamic partition pruning, and at 100 TB the
  * difference between shuffling every fact row and shuffling only the
  * ~matching ones. The injection is a runtime optimizer decision gated on
  * size thresholds, so (like AqeSkewSpec) a static plan pin can't cover
  * it: this spec lowers the application-side threshold to test scale,
  * forces the shuffle-join path, and asserts both the injected filter in
  * the plan and result equality with the unfiltered join.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("bloom runtime filter injects on the fact side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // testdata is far below the 10 GB default application-side floor
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join shape the filter exists for (a broadcast
      // join already has the dim rows on every task)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }

    def joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
          .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))

    val plain = joined.collect().toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = joined
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n$plan")
      // the filter is a performance construct only: results identical
      assert(df.collect().toSeq == plain)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
