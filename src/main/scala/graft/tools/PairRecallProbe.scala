package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Out-of-band recall adjudication for the APPROXIMATE pair tiers
  * (round-16, from the round-15 advice): past
  * [[graft.ext.Dedup.PairGateMinDocs]] the d4/d5/d12/d7-family pair
  * build dispatches onto the winnow-fingerprint gate and d6's df cap
  * drops to [[graft.ext.Dedup.DfCapLarge]] — and because the DuckDB
  * oracles dispatch on the SAME constants, the in-band correctness gate
  * adjudicates each approximation against itself and can no longer see
  * recall drift versus the uncapped-exact reference semantics. This
  * probe measures that drift directly on a corpus where the exact arm
  * is still computable:
  *
  *   - winnow tier:  |winnowPairs ∩ exact| / |exact|   (exact = the
  *     uncapped counting join, the d4 reference shape)
  *   - d6 large cap: |d6@DfCapLarge ∩ d6@DfCap| / |d6@DfCap|  (at the
  *     gate SFs max df < DfCap, so the cap-50 arm IS the uncapped set)
  *
  * Both approximate arms end in the exact full-shingle verify, so their
  * survivor pairs are a SUBSET of the exact sets — precision is 1 by
  * construction and recall is the whole trade. Floors: the winnow gate
  * measured 97.3% at data/sf10 (round 15) and fails below
  * [[WinnowRecallFloor]]; the d6 cap is adjudicated on first
  * measurement and then pinned at [[D6CapRecallFloor]] (measured 0.9766 at data/sf10, round 16).
  *
  * Run: `sbt "runMain graft.tools.PairRecallProbe [dir]"` (default
  * data/sf10 — ~2M docs: the winnow/cap dispatches actually fire there
  * AND the exact counting join still fits local scratch).
  */
object PairRecallProbe {
  val WinnowRecallFloor = 0.95
  val D6CapRecallFloor = 0.95

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pair-recall] $label built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- winnow tier vs uncapped exact (the d4/d5/d12/d7 pair base) --
    val exact = timed("exact countingPairs") {
      pairSet(graft.ext.Dedup.countingPairs(spark, dir, materialize = true))
    }
    spark.catalog.clearCache()
    val winnow = timed("winnowPairs") {
      pairSet(graft.ext.Dedup.winnowPairs(spark, dir))
    }
    spark.catalog.clearCache()
    require(exact.nonEmpty, s"no exact pairs at $dir — probe needs a corpus with near-dups")
    val wRecall = (winnow & exact).size.toDouble / exact.size
    println(f"[pair-recall] $dir winnow_tier recall=${wRecall}%.4f " +
      f"(${(winnow & exact).size}/${exact.size}; winnow-only=${(winnow -- exact).size})")

    // ---- d6 capped gate: DfCapLarge vs the DfCap reference ----------
    val d6Ref = timed(s"d6 cap=${graft.ext.Dedup.DfCap}") {
      pairSet(graft.ext.Dedup.d6PairsAtCap(spark, dir, graft.ext.Dedup.DfCap))
    }
    spark.catalog.clearCache()
    val d6Cap = timed(s"d6 cap=${graft.ext.Dedup.DfCapLarge}") {
      pairSet(graft.ext.Dedup.d6PairsAtCap(spark, dir, graft.ext.Dedup.DfCapLarge))
    }
    spark.catalog.clearCache()
    val cRecall =
      if (d6Ref.isEmpty) 1.0 else (d6Cap & d6Ref).size.toDouble / d6Ref.size
    println(f"[pair-recall] $dir d6_cap${graft.ext.Dedup.DfCapLarge} " +
      f"recall=${cRecall}%.4f (${(d6Cap & d6Ref).size}/${d6Ref.size})")

    println(s"""{"dir":"$dir","winnow_recall":$wRecall,""" +
      s""""d6_cap_recall":$cRecall,"exact_pairs":${exact.size},""" +
      s""""winnow_pairs":${winnow.size},"d6_ref_pairs":${d6Ref.size},""" +
      s""""d6_cap_pairs":${d6Cap.size}}""")
    spark.stop()
    if (wRecall < WinnowRecallFloor)
      sys.error(f"winnow pair recall $wRecall%.4f < floor $WinnowRecallFloor at $dir")
    if (cRecall < D6CapRecallFloor)
      sys.error(f"d6 capped-gate recall $cRecall%.4f < floor $D6CapRecallFloor at $dir")
  }
}
