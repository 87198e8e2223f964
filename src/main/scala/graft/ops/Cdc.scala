package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** CDC MERGE application — apply a change-data-capture batch
  * (insert/update/delete ops keyed by primary key) to a base snapshot and
  * emit the next snapshot. This is the batch MERGE INTO every lakehouse
  * table maintenance job runs; the reference's postgres sink performs the
  * same upsert row-at-a-time (reference postgres init
  * `ON CONFLICT ... DO UPDATE`, provider.py upsert loop) — here it is one
  * distributed set operation.
  *
  * The change batch is derived deterministically from `orders` so the op
  * is oracle-checkable without a second input table: per-customer order
  * spend becomes the updated balance; custkey % 7 == 0 becomes a DELETE;
  * custkey % 5 == 2 is withheld from the batch (exercising the
  * keep-unchanged branch); a mirrored key range becomes INSERTs
  * (-key-1: customer keys are non-negative, so the synthetic insert
  * keys are disjoint from the base at ANY scale — a fixed offset
  * would collide once custkey passes it).
  *
  * Scale shape: one full outer hash join on the primary key resolves all
  * four MERGE branches in a single pass — no per-row driver logic, no
  * second scan of the base. The changes side aggregates first (map-side
  * partial sum), so the join probes |distinct keys| rows, not |orders|.
  * On a real lakehouse the base side is the bucketed/clustered table
  * (zero-exchange join, see sources/Layout) and a CDC batch is small
  * relative to the base — AQE broadcasts it and the merge becomes a
  * scan + broadcast-probe with no shuffle of the base at all. All money
  * flows as integer cents (exact at any scale; ~9.2e16 dollar headroom).
  */
object Cdc {

  def queries: Seq[Q] = Seq(
    Q("x_cdc_merge",
      """WITH chg AS (
        |  SELECT o_custkey AS key,
        |         CASE WHEN o_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS new_bal_cents
        |  FROM orders WHERE o_custkey % 5 <> 2 GROUP BY o_custkey),
        |ins AS (
        |  SELECT -key - 1 AS key, 'I' AS op, new_bal_cents
        |  FROM chg WHERE op = 'U' AND key % 11 = 0),
        |allchg AS (SELECT * FROM chg UNION ALL SELECT * FROM ins),
        |base AS (
        |  SELECT c_custkey AS key, c_name,
        |         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |  FROM customer)
        |SELECT coalesce(b.key, c.key) AS key,
        |       coalesce(b.c_name, 'NEW#' || CAST(c.key AS VARCHAR)) AS name,
        |       CAST(CASE WHEN c.op IN ('U', 'I') THEN c.new_bal_cents
        |                 ELSE b.bal_cents END AS BIGINT) AS bal_cents,
        |       CASE WHEN c.op = 'I' THEN 'inserted'
        |            WHEN c.op = 'U' THEN 'updated'
        |            ELSE 'kept' END AS src
        |FROM base b FULL OUTER JOIN allchg c ON b.key = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY key""".stripMargin) {
      (s, dir) => {
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        // one scan + one agg emits BOTH the U/D row and (for the chosen
        // keys) its derived INSERT via explode — the second orders scan
        // a naive `chg UNION ins-from-chg` plan would pay never exists
        val row = struct(col("key"), col("op"), col("new_bal_cents"))
        val insRow = struct((-col("key") - 1L).as("key"),
          lit("I").as("op"), col("new_bal_cents"))
        val allChg = Tables.orders(s, dir)
          .where(col("o_custkey") % 5 =!= 2)
          .groupBy(col("o_custkey").as("key"))
          .agg(sum(cents).as("new_bal_cents"))
          .select(col("key"),
            when(col("key") % 7 === 0, "D").otherwise("U").as("op"),
            col("new_bal_cents"))
          .select(explode(when(col("op") === "U" && col("key") % 11 === 0,
            array(row, insRow)).otherwise(array(row))).as("c"))
          .select(col("c.key").as("key"), col("c.op").as("op"),
            col("c.new_bal_cents").as("new_bal_cents"))
        val base = Tables.customer(s, dir).select(
          col("c_custkey").as("key"), col("c_name"),
          round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
        base.join(allChg, Seq("key"), "full_outer")
          .where(col("op").isNull || col("op") =!= "D")
          .select(col("key"),
            coalesce(col("c_name"),
              concat(lit("NEW#"), col("key").cast("string"))).as("name"),
            when(col("op").isin("U", "I"), col("new_bal_cents"))
              .otherwise(col("bal_cents")).cast("long").as("bal_cents"),
            when(col("op") === "I", "inserted")
              .when(col("op") === "U", "updated")
              .otherwise("kept").as("src"))
          .transform(d => graft.Q.sorted(d, "key"))
      }
    })
}
