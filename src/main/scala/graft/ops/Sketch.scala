package graft.ops

import graft.Q
import graft.ext.Portable
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate tier of the aggregation surface.
  * At 100 TB an exact `count(DISTINCT user_id)` plans an Expand +
  * second shuffle keyed by the distinct value itself (every unique value
  * crosses the network); the HLL++ sketch is a fixed-size (~1.5 KB at
  * 5% rsd) commutative accumulator that partial-aggregates map-side and
  * merges associatively — the ONLY distinct-count that stays one-shuffle
  * and bounded-memory regardless of cardinality. Not exposed through the
  * oracle gate (DuckDB's HLL is a different implementation; the numbers
  * legitimately differ inside the error bound), so the contract here is
  * the error bound itself, pinned by `SketchSpec`.
  */
object Sketch {

  /** Per-group approximate distinct count alongside the row count.
    * `rsd` is the target relative standard deviation (Spark default
    * 0.05); memory per group is O(1/rsd^2), independent of cardinality.
    */
  def approxDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      target: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(target), rsd).as(s"approx_distinct_$target"),
        count(lit(1)).as("n_rows"))

  /** Exact twin, for spec-side error measurement (the plan everyone
    * should avoid at scale: distinct values shuffle twice).
    */
  def exactDistinct(df: DataFrame, groupCols: Seq[String], target: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(target)).as(s"exact_distinct_$target"))

  /** Per-group approximate percentiles (Greenwald-Khanna/KLL-style
    * mergeable quantile summary). Exact `percentile` buffers EVERY value
    * of the group in the aggregation state — at 100 TB a hot group is an
    * executor OOM, not a slow query. The sketch state is
    * O(accuracy * log n), merges associatively (map-side partials, any
    * partitioning), and guarantees rank error <= n/accuracy: for
    * accuracy 10000 the returned p99 sits between the true p98.99 and
    * p99.01 — the property pinned by `SketchSpec` on skewed data. Not
    * oracle-gated (DuckDB's approx sketch is a different implementation;
    * values legitimately differ inside the bound) — the error bound IS
    * the contract, same as [[approxDistinct]].
    */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      target: String,
      percentages: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = percentages.map { p =>
      percentile_approx(col(target), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // --- Count-min sketch: the frequency twin of the HLL distinct ---
  //
  // Exact heavy hitters ("every token with >= 1/phi of total mass") via
  // a plain groupBy shuffle EVERY distinct key: at 100 TB of text that
  // is billions of tail tokens crossing the network and blowing the
  // partial-aggregation hash maps, all to compute counts nobody asked
  // for. The CMS pass is one scan into a fixed-size (D*W longs)
  // counter grid that partial-aggregates map-side and merges by addition
  // (associative, any partitioning); because min-of-counters can only
  // OVER-estimate, filtering the second scan on the broadcast sketch
  // drops the tail with NO false negatives — the exact aggregation then
  // shuffles only candidate occurrences, and the final HAVING makes the
  // output identical to the all-keys plan. Unlike approxDistinct/
  // approxQuantiles this IS oracle-gated: the sketch prunes the plan,
  // never the answer.

  /** Counters per row. Estimate error is ~ e/W of total mass per row, so
    * detecting 1/phi heavy hitters needs W >> phi — W scales with the
    * THRESHOLD, not the data. */
  val CmsW = 8192

  /** Independent rows; over-estimate beyond e/W decays ~ e^-D. */
  val CmsD = 4

  /** Heavy hitter = token whose count * PhiInv >= total occurrences. */
  val PhiInv = 30L

  /** 0-based flat slot of `token` in row `i` of the D x W grid. The row
    * hashes come from `xxhash64(token, i)` — seeding by a literal column,
    * the same independent-hash derivation as [[graft.ext.Bloom]]. The
    * hash never reaches the output (prune-only), so the codegen-native
    * hash is safe despite the DuckDB oracle lacking it. */
  def cmsSlot(token: Column, i: Int): Column =
    lit(i * CmsW) + pmod(xxhash64(token, lit(i)), lit(CmsW.toLong)).cast("int")

  /** One-row DataFrame `(cms: array<long>, n: long)`: the dense D x W
    * counter grid over all rows of `occ(tokenCol)` plus the exact total
    * occurrence count — recovered for free as the sum of row 0 of the
    * grid (every occurrence increments exactly one counter per row), so
    * the threshold needs no second corpus scan. Build shape mirrors
    * [[graft.ext.Bloom.build]]: explode D slots per occurrence, count per
    * slot (map-side partials do the heavy lifting), densify via a map
    * lookup over the full slot range.
    */
  def cmsBuild(occ: DataFrame, tokenCol: String): DataFrame =
    occ
      .select(explode(array((0 until CmsD).map(i => cmsSlot(col(tokenCol), i)): _*)).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("c")))).as("m"))
      .select(transform(sequence(lit(0), lit(CmsD * CmsW - 1)),
        j => coalesce(element_at(col("m"), j), lit(0L))).as("cms"))
      .select(col("cms"),
        aggregate(slice(col("cms"), 1, CmsW), lit(0L), (a, v) => a + v).as("n"))

  /** Point estimate (min over the D rows) for `token`; requires the
    * broadcast `cms` column in scope. Over-estimate only — the property
    * that makes CMS pruning exact-output-safe. */
  def cmsEstimate(token: Column): Column =
    least((0 until CmsD).map(i => element_at(col("cms"), cmsSlot(token, i) + 1)): _*)

  def queries: Seq[Q] = Seq(

    // phi-heavy-hitters over the corpus token stream: CMS prune pass +
    // exact verify aggregation. Output is EXACT (sketch over-estimates
    // never drop a true heavy hitter; the final HAVING re-checks with
    // true counts) so the oracle is the plain all-keys SQL.
    Q("x_heavy_hitters",
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |tot AS (SELECT count(*) AS n FROM t)
         |SELECT token, count(*) AS cnt
         |FROM t, tot GROUP BY token, n HAVING count(*) * $PhiInv >= n
         |ORDER BY token""".stripMargin) { (s, dir) =>
      val occ = Portable.spread(Tables.documents(s, dir), "doc_id")
        .select(explode(Portable.tokens(col("text"))).as("token"))
      val cms = cmsBuild(occ, "token")
      occ
        .crossJoin(broadcast(cms)) // one-row (grid, total)
        .where(cmsEstimate(col("token")) * lit(PhiInv) >= col("n"))
        .groupBy("token", "n").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * lit(PhiInv) >= col("n"))
        .select(col("token"), col("cnt"))
        .transform(d => graft.Q.sorted(d, "token"))
    })
}
