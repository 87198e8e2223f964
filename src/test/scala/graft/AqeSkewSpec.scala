package graft

import org.apache.spark.sql.functions._

/** Runtime proof of the j2 scale claim: AQE's skew-join splitter
  * re-splits an oversized partition of a sort-merge join at runtime.
  * Static plan pins can't cover this (the split happens adaptively), so
  * this spec manufactures a hot key, lowers the skew thresholds to test
  * size, executes, and asserts the FINAL adaptive plan marks the join
  * skew-handled.
  */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits the hot-key partition of a big-big sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carrying 40k rows vs 400 cold keys with 10 rows
      // each: the hot key's partition dwarfs the median. Padding is
      // sha2 output — skew detection reads COMPRESSED map-output sizes,
      // so constant padding would deflate away the skew itself.
      val left = spark.range(40000)
        .select(lit(0L).as("k"), sha2(col("id").cast("string"), 256).as("pad"))
        .union(spark.range(4000)
          .select((col("id") % 400 + 1).as("k"),
            sha2(col("id").cast("string"), 256).as("pad")))
      val right = spark.range(401).select(col("id").as("k"),
        (col("id") * 2).as("payload"))

      val j = left.join(right, "k")
      // execute j's OWN queryExecution (count() would plan a separate
      // aggregate query and leave j's adaptive plan unexecuted)
      assert(j.collect().length == 44000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"not an executed adaptive plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"skew split did not engage (thresholds vs data size?):\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
