package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) build + point-in-time probe —
  * compact an attribute change log into versioned validity intervals,
  * then answer "what was the value just before t". The warehouse pair
  * that complements the a8 as-of join. (Reference scope: postgres upsert
  * keeps only latest state, reference postgres/init.sql; SCD2 is what
  * that sink loses and a 100 TB warehouse keeps.)
  *
  * Log = orders as successive observations of each customer's
  * o_orderpriority. Two window passes over ONE custkey partitioning
  * (Catalyst reuses the exchange): lag() marks rows where the tracked
  * attribute actually changed (run-length compaction — consecutive equal
  * observations collapse into the open version), lead() closes each
  * version with the next version's start. Deterministic order:
  * (o_orderdate, o_orderkey) — orderkey breaks date ties.
  *
  * Scale: one shuffle on the dimension key, O(1) window state per row
  * (lag/lead of 1), output size = number of actual changes, not
  * observations. At 100 TB the change log streams through; no
  * full-history buffering anywhere. The probe join hashes fact and
  * dimension on the same key — version intervals are disjoint per key,
  * so the interval predicate matches at most one dimension row and the
  * join stays 1:≤1 (no fan-out, no window cleanup pass).
  */
object Scd {

  /** The versioned dimension (shared by x_scd2 and its probe). */
  def dim(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .withColumn("prev_p", lag(col("o_orderpriority"), 1).over(w))
      .where(col("prev_p").isNull || col("prev_p") =!= col("o_orderpriority"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"),
        col("o_orderpriority").as("priority"),
        col("valid_from"),
        // open versions close at the classic SCD2 end-of-time
        // sentinel rather than NULL: probes stay a plain BETWEEN,
        // and no NULL timestamp reaches the cross-engine hash
        coalesce(col("valid_to"), lit("9999-12-31 00:00:00").cast("timestamp"))
          .as("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** DuckDB twin of [[dim]] as a CTE chain ending in a `dim` relation. */
  val dimSql: String =
    """obs AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |         lag(o_orderpriority) OVER w AS prev_p
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |chg AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
      |  FROM obs WHERE prev_p IS NULL OR prev_p <> o_orderpriority),
      |ver AS (
      |  SELECT o_custkey, o_orderpriority,
      |         CAST(row_number() OVER w AS BIGINT) AS version,
      |         o_orderdate AS valid_from,
      |         lead(o_orderdate) OVER w AS valid_to
      |  FROM chg
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |dim AS (
      |  SELECT o_custkey, version, o_orderpriority AS priority,
      |         CAST(valid_from AS TIMESTAMP) AS valid_from,
      |         CAST(coalesce(valid_to, TIMESTAMP '9999-12-31 00:00:00') AS TIMESTAMP) AS valid_to,
      |         CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |  FROM ver)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("x_scd2",
      s"""WITH $dimSql
         |SELECT * FROM dim ORDER BY o_custkey, version""".stripMargin) {
      (s, dir) =>
        dim(s, dir).transform(d => graft.Q.sorted(d, "o_custkey", "version"))
    },

    // Point-in-time probe: for every order, the customer's priority AS
    // OF the day before the order (half-open [valid_from, valid_to)
    // interval containment), plus whether the order itself changed it.
    // 'NONE' marks orders before their customer's first version.
    Q("x_scd2_probe",
      s"""WITH $dimSql
         |SELECT o.o_orderkey, o.o_custkey,
         |       coalesce(d.priority, 'NONE') AS prev_priority,
         |       o.o_orderpriority AS priority,
         |       CAST(CASE WHEN d.priority IS NULL
         |                   OR d.priority <> o.o_orderpriority
         |                 THEN 1 ELSE 0 END AS BIGINT) AS changed
         |FROM orders o
         |LEFT JOIN dim d
         |  ON d.o_custkey = o.o_custkey
         | AND d.valid_from <= o.o_orderdate - INTERVAL 1 DAY
         | AND o.o_orderdate - INTERVAL 1 DAY < d.valid_to
         |ORDER BY o.o_orderkey""".stripMargin) {
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val d = dim(s, dir)
        val probeTs = o("o_orderdate") - expr("interval 1 day")
        o.join(d,
            d("o_custkey") === o("o_custkey") &&
              d("valid_from") <= probeTs && probeTs < d("valid_to"),
            "left")
          .select(o("o_orderkey"), o("o_custkey"),
            coalesce(d("priority"), lit("NONE")).as("prev_priority"),
            o("o_orderpriority").as("priority"),
            when(d("priority").isNull ||
              d("priority") =!= o("o_orderpriority"), 1L).otherwise(0L)
              .as("changed"))
          .transform(df => graft.Q.sorted(df, "o_orderkey"))
      }
    })
}
