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
    })
}
