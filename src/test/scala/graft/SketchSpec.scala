package graft

import graft.ops.Sketch
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The sketch contract: approximate distinct counts land inside the
  * configured error bound, and the sketch merges associatively (the
  * property that makes it one-shuffle at 100 TB — partial sketches from
  * any partitioning merge to the same estimate).
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct: within 5x rsd of exact per event_type") {
    val ev = Tables.events(spark, sf)
    val approx = Sketch.approxDistinct(ev, Seq("event_type"), "user_id", rsd = 0.05)
      .select(col("event_type"), col("approx_distinct_user_id"))
      .as[(String, Long)].collect().toMap
    val exact = Sketch.exactDistinct(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), col("exact_distinct_user_id"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      val relErr = math.abs(ap - ex).toDouble / ex
      // rsd is a standard deviation, not a hard cap — 5 sigma is a
      // deterministic-in-practice bound for a fixed dataset
      assert(relErr < 0.25, s"$k: approx=$ap exact=$ex relErr=$relErr")
    }
  }

  test("sketch estimate is partitioning-independent (merge associativity)") {
    val ev = Tables.events(spark, sf)
    def estimate(parts: Int): Map[String, Long] =
      Sketch.approxDistinct(ev.repartition(parts, col("user_id")),
          Seq("event_type"), "user_id")
        .select(col("event_type"), col("approx_distinct_user_id"))
        .as[(String, Long)].collect().toMap
    // same input split 2 ways vs 16 ways: partial sketches differ, the
    // merged estimate must not
    assert(estimate(2) == estimate(16))
  }
}
