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

  test("approx_percentile: rank error within n/accuracy on skewed data") {
    val n = 100000
    val acc = 1000
    // deterministic heavy-tailed values: cubes of id mod 1000 pile mass
    // near zero with a long right tail — the shape that breaks naive
    // equal-width histogram quantiles
    val df = spark.range(n)
      .select((pow(col("id") % 1000, 3) / 1e6).as("v"))
    val ps = Seq(0.5, 0.95, 0.99)
    val approx = graft.ops.Sketch.approxQuantiles(
        df.withColumn("g", lit("all")), Seq("g"), "v", ps, accuracy = acc)
      .select("p50", "p95", "p99").head()
    val values = df.as[Double].collect().sorted
    ps.zipWithIndex.foreach { case (p, i) =>
      val got = approx.getDouble(i)
      // observed rank of the sketch's answer vs the requested rank
      val rank = values.count(_ <= got)
      val err = math.abs(rank - p * n)
      val bound = n.toDouble / acc
      // the GK guarantee is <= n/accuracy; 2x slack keeps the assertion
      // robust to boundary/duplicate-value rank counting
      assert(err <= 2 * bound, s"p$p: value=$got rank=$rank err=$err bound=$bound")
    }
  }

  test("approx quantile sketch is partitioning-independent (merge associativity)") {
    val df = spark.range(50000)
      .select((col("id") % 997).cast("double").as("v"), lit("all").as("g"))
    def estimate(parts: Int): Seq[Double] = {
      val r = graft.ops.Sketch.approxQuantiles(
          df.repartition(parts, col("v")), Seq("g"), "v", Seq(0.5, 0.99))
        .select("p50", "p99").head()
      Seq(r.getDouble(0), r.getDouble(1))
    }
    assert(estimate(2) == estimate(16))
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

  test("count-min: over-estimates only, recovers the exact total, prune keeps every true heavy hitter") {
    val occ = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
    val cms = Sketch.cmsBuild(occ, "token")

    // n recovered from the grid == true occurrence count
    val gridN = cms.select("n").head().getLong(0)
    assert(gridN == occ.count(), s"grid total $gridN != scan total")

    // the CMS invariant: min-of-counters >= true count for EVERY key
    // (this is what makes sketch pruning exact-output-safe)
    val under = exact.crossJoin(broadcast(cms))
      .where(Sketch.cmsEstimate(col("token")) < col("cnt")).count()
    assert(under == 0, s"$under tokens under-estimated")

    // candidates (sketch filter) must be a superset of the true heavy
    // hitters, and the query output must equal the plain exact plan
    val candidates = exact.crossJoin(broadcast(cms))
      .where(Sketch.cmsEstimate(col("token")) * Sketch.PhiInv >= col("n"))
      .select("token").as[String].collect().toSet
    val trueHh = exact.crossJoin(broadcast(cms.select("n")))
      .where(col("cnt") * Sketch.PhiInv >= col("n"))
      .select("token").as[String].collect().toSet
    assert(trueHh.subsetOf(candidates), s"prune dropped ${trueHh -- candidates}")
    // non-vacuous on this corpus: the filter must actually drop tail keys
    val nKeys = exact.count()
    assert(candidates.size < nKeys,
      s"prune vacuous: ${candidates.size} candidates of $nKeys keys")

    val viaQuery = graft.ops.Sketch.queries.find(_.name == "x_heavy_hitters").get
      .build(spark, sf)
      .as[(String, Long)].collect().toMap
    val viaExact = exact.crossJoin(broadcast(cms.select("n")))
      .where(col("cnt") * Sketch.PhiInv >= col("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(viaQuery == viaExact, "sketch-pruned output != exact output")
  }
}
