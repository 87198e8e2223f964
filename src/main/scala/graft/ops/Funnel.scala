package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the clickstream table — the funnel and
  * cohort-retention queries every product-analytics warehouse runs daily
  * (reference scope: the `events` side of the stream the reference's
  * Flink job consumes, reference flink_processor.py:1-40; the reference
  * itself stops at per-bar aggregation, these are the beyond-reference
  * event ops a 100 TB clickstream needs).
  *
  * Cross-engine determinism: all time comparisons are integer
  * microsecond arithmetic (`unix_micros` / `epoch_us` — DuckDB's ns
  * timestamps truncate to the same micros Spark reads), and day/week
  * offsets are integer `DIV`s of day differences, never engine week
  * boundaries (ISO-vs-locale week rules differ).
  */
object Funnel {

  /** Funnel window: 7 days in microseconds. */
  val WindowUs: Long = 7L * 24 * 3600 * 1000000

  def queries: Seq[Q] = Seq(

    // a15: ordered 3-step windowed funnel (signup -> click -> purchase
    // within 7 days of the signup), ClickHouse-windowFunnel semantics:
    // each step must be STRICTLY after the previous accepted step and
    // inside the window anchored at step 1; the earliest qualifying
    // event is accepted per step (greedy-min, deterministic).
    //
    // Scale shape: three user-keyed aggregates chained by user-keyed
    // joins — every exchange hashes on user_id, so Catalyst plans ONE
    // shuffle partitioning reused across all stages (no re-shuffle
    // between steps), and each stage's filter prunes before its agg
    // (map-side partial min). At 100 TB this is a linear scan + one
    // user shuffle; no window-function full-history sort is needed
    // because each step keeps only min(ts).
    Q("a15_funnel",
      s"""WITH s1 AS (
         |  SELECT user_id, min(ts) AS t1 FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |s2 AS (
         |  SELECT e.user_id, min(e.ts) AS t2
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click'
         |    AND epoch_us(e.ts) > epoch_us(s1.t1)
         |    AND epoch_us(e.ts) <= epoch_us(s1.t1) + $WindowUs
         |  GROUP BY e.user_id),
         |s3 AS (
         |  SELECT e.user_id, min(e.ts) AS t3
         |  FROM events e
         |  JOIN s1 ON e.user_id = s1.user_id
         |  JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase'
         |    AND epoch_us(e.ts) > epoch_us(s2.t2)
         |    AND epoch_us(e.ts) <= epoch_us(s1.t1) + $WindowUs
         |  GROUP BY e.user_id)
         |SELECT s1.user_id, CAST(s1.t1 AS TIMESTAMP) AS t1,
         |       CAST(coalesce(epoch_us(s2.t2) - epoch_us(s1.t1), -1) AS BIGINT) AS t2_lag_us,
         |       CAST(coalesce(epoch_us(s3.t3) - epoch_us(s1.t1), -1) AS BIGINT) AS t3_lag_us,
         |       CAST(1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
         |              + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
         |        LEFT JOIN s3 ON s1.user_id = s3.user_id
         |ORDER BY s1.user_id""".stripMargin) {
      (s, dir) => {
        val e = Tables.events(s, dir)
        val us = unix_micros(col("ts"))
        val s1 = e.where(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = e.where(col("event_type") === "click")
          .join(s1, "user_id")
          .where(us > unix_micros(col("t1")) &&
            us <= unix_micros(col("t1")) + WindowUs)
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = e.where(col("event_type") === "purchase")
          .join(s1, "user_id").join(s2, "user_id")
          .where(us > unix_micros(col("t2")) &&
            us <= unix_micros(col("t1")) + WindowUs)
          .groupBy("user_id").agg(min("ts").as("t3"))
        // step times leave as BIGINT lags from the funnel anchor (-1 =
        // step not reached): NULL timestamps are the one output type
        // whose cross-engine null representation (NaT vs NULL) the
        // driver's formatted-value hash cannot be trusted to align
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"),
            coalesce(unix_micros(col("t2")) - unix_micros(col("t1")), lit(-1L))
              .as("t2_lag_us"),
            coalesce(unix_micros(col("t3")) - unix_micros(col("t1")), lit(-1L))
              .as("t3_lag_us"),
            (lit(1) + when(col("t2").isNull, 0).otherwise(1)
              + when(col("t3").isNull, 0).otherwise(1)).cast("long").as("depth"))
          .transform(d => graft.Q.sorted(d, "user_id"))
      }
    },

    // a16: cohort retention — users grouped by first-activity date,
    // counted distinct per whole-week offset of later activity. The
    // canonical "are they coming back" matrix.
    //
    // Scale shape: one user-keyed aggregate (cohort assignment), one
    // user-keyed join to re-tag every event (same partitioning — the
    // exchange is reused), then a (cohort, week) count-distinct whose
    // Expand-based distinct aggregation does map-side partials. The
    // fact table streams; the cohort map is user-cardinality (small
    // relative to events) and at 100 TB would be the bucketed-table
    // side of the join.
    Q("a16_retention",
      """WITH first AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id),
        |tagged AS (
        |  SELECT f.cohort_date,
        |         CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7 AS BIGINT)
        |           AS week_offset,
        |         e.user_id
        |  FROM events e JOIN first f ON e.user_id = f.user_id)
        |SELECT cohort_date, week_offset,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM tagged GROUP BY cohort_date, week_offset
        |ORDER BY cohort_date, week_offset""".stripMargin) {
      (s, dir) => {
        val e = Tables.events(s, dir)
        val first = e.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("cohort_date"))
        e.join(first, "user_id")
          .select(col("cohort_date"),
            floor(datediff(to_date(col("ts")), col("cohort_date")) / 7)
              .cast("long").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_date", "week_offset")
          .agg(countDistinct("user_id").cast("long").as("n_active"),
            count(lit(1)).as("n_events"))
          .transform(d => graft.Q.sorted(d, "cohort_date", "week_offset"))
      }
    })
}
