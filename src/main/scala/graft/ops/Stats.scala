package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics — the equi-width histogram build every
  * cost-based optimizer (and data-profiling sweep) runs over a column.
  * The reference has no optimizer statistics at all (pandas recomputes
  * everything); an engine serving 100 TB needs them to pick join sides
  * and detect skew, so the build itself must be a scale-shaped query.
  *
  * Two passes, as ANALYZE does it: pass 1 reduces to a single (min, max)
  * row (column-pruned scan, map-side partial min/max); pass 2 buckets
  * every row against the broadcast bounds — `(c - lo) * 16 div (hi-lo+1)`
  * in integer cents, which is exact in both engines (no float boundary
  * ties, the classic cross-engine histogram hazard) and provably < 16
  * buckets. The bucket aggregate is 16-row output with map-side combine;
  * at 100 TB both passes are linear scans and the only exchange moves 16
  * partial rows per task. Per-bucket min/max expose the actual bucket
  * occupancy ranges (what an optimizer stores as boundary values).
  */
object Stats {

  def queries: Seq[Q] = Seq(
    Q("x_histogram",
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |s AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
        |SELECT CAST(((cents - lo) * 16) // (hi - lo + 1) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(min(cents) AS BIGINT) AS min_cents,
        |       CAST(max(cents) AS BIGINT) AS max_cents
        |FROM c, s
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) => {
        val c = Tables.lineitem(s, dir)
          .select(round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        val bounds = c.agg(min("cents").as("lo"), max("cents").as("hi"))
        c.crossJoin(broadcast(bounds))
          .groupBy(expr("((cents - lo) * 16) div (hi - lo + 1)").as("bucket"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
            min("cents").as("min_cents"), max("cents").as("max_cents"))
          .transform(d => graft.Q.sorted(d, "bucket"))
      }
    },

    // Data-quality profile — the per-column null/cardinality/min/max
    // sweep every ingestion pipeline runs before trusting a new drop.
    // ONE aggregation pass computes all columns' stats (count-distincts
    // share a single Expand), then a 3-row unpivot shapes the classic
    // profile output. Values egress as strings so one schema carries
    // mixed column types; numerics go through integer casts first so
    // no float formatting crosses engines.
    Q("x_profile",
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(*) - count(l_quantity) AS BIGINT) AS qty_null,
        |         CAST(count(DISTINCT CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty_card,
        |         CAST(min(CAST(round(l_quantity, 0) AS BIGINT)) AS VARCHAR) AS qty_min,
        |         CAST(max(CAST(round(l_quantity, 0) AS BIGINT)) AS VARCHAR) AS qty_max,
        |         CAST(count(*) - count(l_returnflag) AS BIGINT) AS rf_null,
        |         CAST(count(DISTINCT l_returnflag) AS BIGINT) AS rf_card,
        |         CAST(min(l_returnflag) AS VARCHAR) AS rf_min,
        |         CAST(max(l_returnflag) AS VARCHAR) AS rf_max,
        |         CAST(count(*) - count(l_shipdate) AS BIGINT) AS sd_null,
        |         CAST(count(DISTINCT l_shipdate) AS BIGINT) AS sd_card,
        |         CAST(min(l_shipdate) AS VARCHAR) AS sd_min,
        |         CAST(max(l_shipdate) AS VARCHAR) AS sd_max
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col, n, qty_null AS n_null, qty_card AS n_distinct,
        |       qty_min AS min_v, qty_max AS max_v FROM a
        |UNION ALL SELECT 'l_returnflag', n, rf_null, rf_card, rf_min, rf_max FROM a
        |UNION ALL SELECT 'l_shipdate', n, sd_null, sd_card, sd_min, sd_max FROM a
        |ORDER BY col""".stripMargin) {
      (s, dir) => {
        val qty = round(col("l_quantity"), 0).cast("long")
        // Round-16 (guide §4/codegen): min/max over the STRING column
        // l_returnflag has a StringType aggregation buffer, which
        // HashAggregateExec cannot hold — ONE string min in the shared
        // aggregate demoted the whole count-distinct Expand pipeline to
        // SortAggregate, adding a full Sort of the 4×-expanded row
        // stream (measured: a single 3.5 s stage at sf0.1, no
        // WholeStageCodegen). Splitting the two string folds into their
        // own key-less aggregate (no grouping keys ⇒ no sort; a key-less
        // SortAggregate is a plain fold) keeps every long/timestamp
        // aggregate in the main pass HashAggregate+codegen. The extra
        // pass scans ONE column; the removed Sort covered every
        // expanded row — the trade improves with scale. Results are
        // bit-identical: same rows, same min/max.
        val strMinMax = Tables.lineitem(s, dir).agg(
          min("l_returnflag").cast("string").as("rf_min"),
          max("l_returnflag").cast("string").as("rf_max"))
        val a = Tables.lineitem(s, dir).agg(
          count(lit(1)).as("n"),
          (count(lit(1)) - count(col("l_quantity"))).as("qty_null"),
          countDistinct(qty).as("qty_card"),
          min(qty).cast("string").as("qty_min"),
          max(qty).cast("string").as("qty_max"),
          (count(lit(1)) - count(col("l_returnflag"))).as("rf_null"),
          countDistinct(col("l_returnflag")).as("rf_card"),
          (count(lit(1)) - count(col("l_shipdate"))).as("sd_null"),
          countDistinct(col("l_shipdate")).as("sd_card"),
          min("l_shipdate").cast("string").as("sd_min"),
          max("l_shipdate").cast("string").as("sd_max"))
          .crossJoin(broadcast(strMinMax))
        a.selectExpr(
          """stack(3,
            |  'l_quantity',   n, qty_null, qty_card, qty_min, qty_max,
            |  'l_returnflag', n, rf_null,  rf_card,  rf_min,  rf_max,
            |  'l_shipdate',   n, sd_null,  sd_card,  sd_min,  sd_max)
            |AS (col, n, n_null, n_distinct, min_v, max_v)""".stripMargin)
          .transform(d => graft.Q.sorted(d, "col"))
      }
    })
}
