package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) build — compact an attribute
  * change log into versioned validity intervals. The warehouse op that
  * pairs with the a8 as-of join: a8 answers "which version was live at
  * time t", this builds the versioned table it probes. (Reference scope:
  * postgres upsert keeps only latest state, reference postgres/init.sql;
  * SCD2 is what that sink loses and a 100 TB warehouse keeps.)
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
  * full-history buffering anywhere.
  */
object Scd {

  def queries: Seq[Q] = Seq(
    Q("x_scd2",
      """WITH obs AS (
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
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, version, o_orderpriority AS priority,
        |       CAST(valid_from AS TIMESTAMP) AS valid_from,
        |       CAST(coalesce(valid_to, TIMESTAMP '9999-12-31 00:00:00') AS TIMESTAMP) AS valid_to,
        |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM ver ORDER BY o_custkey, version""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        val chg = Tables.orders(s, dir)
          .withColumn("prev_p", lag(col("o_orderpriority"), 1).over(w))
          .where(col("prev_p").isNull || col("prev_p") =!= col("o_orderpriority"))
        chg
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
          .transform(d => graft.Q.sorted(d, "o_custkey", "version"))
      }
    })
}
