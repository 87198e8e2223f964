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
    },

    // a17: last-touch revenue attribution — credit each purchase to the
    // most recent click/view by the same user at-or-before the purchase
    // (ties on ts break by event_id, so a same-instant touch counts).
    // The touch's JSON props pick the channel; purchases with no prior
    // touch are 'direct'. This is the as-of-join shape (a8) expressed as
    // one window pass: no join at all — touches and purchases ride the
    // SAME user-keyed sort, and last(ignoreNulls) carries the latest
    // touch forward. JSON extraction exercises the §2.9 get_json_object
    // surface on the touch rows only (pruned before the window).
    //
    // Scale shape: one user-hash exchange + in-partition sort; window
    // state is O(1) (two carried values). At 100 TB this beats the
    // equivalent range join by the whole probe-side shuffle; revenue is
    // integer cents, exact under any aggregation that follows.
    Q("a17_attribution",
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |         CASE WHEN event_type IN ('click', 'view') THEN event_id END AS touch_id,
        |         CASE WHEN event_type IN ('click', 'view')
        |              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS touch_k
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, event_type, value,
        |         last_value(touch_id IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS last_touch,
        |         last_value(touch_k IGNORE NULLS) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS last_k
        |  FROM ev)
        |SELECT event_id, user_id,
        |       CAST(round(value * 100, 0) AS BIGINT) AS revenue_cents,
        |       CAST(coalesce(last_touch, -1) AS BIGINT) AS touch_id,
        |       CASE WHEN last_touch IS NULL THEN 'direct'
        |            WHEN last_k % 3 = 0 THEN 'search'
        |            WHEN last_k % 3 = 1 THEN 'social'
        |            ELSE 'email' END AS channel
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val isTouch = col("event_type").isin("click", "view")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("touch_id", when(isTouch, col("event_id")))
          .withColumn("touch_k",
            when(isTouch, get_json_object(col("props"), "$.k").cast("long")))
          .withColumn("last_touch", last(col("touch_id"), ignoreNulls = true).over(w))
          .withColumn("last_k", last(col("touch_k"), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            round(col("value") * 100, 0).cast("long").as("revenue_cents"),
            coalesce(col("last_touch"), lit(-1L)).as("touch_id"),
            when(col("last_touch").isNull, "direct")
              .when(col("last_k") % 3 === 0, "search")
              .when(col("last_k") % 3 === 1, "social")
              .otherwise("email").as("channel"))
          .transform(d => graft.Q.sorted(d, "event_id"))
      }
    },

    // a18: daily actives + exact cumulative unique users — the DAU curve
    // with a RUNNING EXACT distinct count, which no window count-distinct
    // computes directly. Trick: distinct-ness is decided once per user at
    // the user grain (their first active day), then the day grain only
    // SUMS first-appearances — turning running-count-distinct into a
    // running sum over an already-tiny per-day table.
    //
    // Scale shape: two user-keyed aggregates (daily actives via
    // (day,user) pre-distinct, firsts via min) with map-side partials,
    // then a running sum over O(#days) rows — the only ordered pass is
    // over data that fits in one task at any corpus size. Nothing keeps
    // per-user state across days; the 100 TB version is two linear scans.
    Q("a18_cum_uniques",
      """WITH firsts AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY user_id),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |  FROM events GROUP BY 1),
        |news AS (
        |  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
        |  FROM firsts GROUP BY 1)
        |SELECT d.day, d.n_events, d.n_active,
        |       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
        |       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day) AS BIGINT)
        |         AS cum_users
        |FROM daily d LEFT JOIN news n ON d.day = n.day
        |ORDER BY d.day""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
        val daily = e.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").cast("long").as("n_active"))
        val news = e.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_new"))
        daily.join(news, Seq("day"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("cum_users",
            sum("n_new").over(Window.orderBy("day")).cast("long"))
          .select("day", "n_events", "n_active", "n_new", "cum_users")
          .transform(d => graft.Q.sorted(d, "day"))
      }
    },

    // a21: top user-journey paths — each user's first 5 events as an
    // ordered 'a>b>c' path, counted across users. The product-analytics
    // "common flows" query. Per-user ordering WITHOUT a window sort:
    // collect_list into one per-user array (map-side partial collect),
    // sort_array on (ts, event_id, type) structs — per-row, bounded by
    // the user's event count — then slice to the prefix. At 100 TB the
    // per-user array is the natural unit (users fit; a power user with
    // millions of events would cap the collect — the slice-to-5 makes
    // anything past the first handful irrelevant anyway).
    Q("a21_paths",
      """WITH seq AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id)[1:5] AS p
        |  FROM events GROUP BY user_id)
        |SELECT array_to_string(p, '>') AS path, CAST(count(*) AS BIGINT) AS n_users
        |FROM seq GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""".stripMargin) {
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
          .select(array_join(
            transform(slice(col("evs"), 1, 5), e => e.getField("event_type")),
            ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path")).limit(20)
      }
    },

    // a22: hopping (sliding) time windows — every event lands in the 5
    // one-minute-slid 5-minute windows covering it, via Spark's native
    // TimeWindow (`window(ts, '5 minutes', '1 minute')`), the batch twin
    // of the streaming sliding aggregation. The DuckDB oracle builds the
    // same membership explicitly (trunc-to-minute minus 0..4 minutes),
    // pinning Spark's epoch-aligned window-start semantics.
    //
    // Scale shape: the window expansion is a per-row flatMap (×5, the
    // window/slide ratio — no join), then one window-start hash agg with
    // map-side partials.
    Q("a22_hopping",
      """WITH w AS (
        |  SELECT date_trunc('minute', ts) - INTERVAL (k.k) MINUTE AS win_start,
        |         value
        |  FROM events, (SELECT unnest(range(5)) AS k) k),
        |agg AS (
        |  SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS value_cents
        |  FROM w GROUP BY win_start)
        |SELECT CAST(win_start AS TIMESTAMP) AS win_start, n_events, value_cents
        |FROM agg ORDER BY win_start""".stripMargin) {
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "5 minutes", "1 minute"))
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
          .select(col("window.start").as("win_start"),
            col("n_events"), col("value_cents"))
          .transform(d => graft.Q.sorted(d, "win_start"))
      }
    },

    // a24: RFM customer segmentation — recency/frequency/monetary
    // quartile scores, the canonical CRM warehouse derivation. One
    // per-customer aggregate, then quartile BOUNDARIES (not per-row
    // ntile: a global ntile is a single-partition sort; three broadcast
    // boundary values score any number of customers in a map). Exact
    // cross-engine: the metrics are integers, and 0.25/0.5/0.75
    // interpolation on integers is IEEE-exact (k/4 steps), so the
    // double boundaries are bit-identical in both engines. At 100 TB
    // the exact percentile swaps for the a10_quantiles_approx sketch.
    Q("a24_rfm",
      """WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
        |c AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day', max(o_orderdate), (SELECT m FROM mx)) AS BIGINT)
        |           AS r_days,
        |         CAST(count(*) AS BIGINT) AS f_cnt,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS m_cents
        |  FROM orders GROUP BY o_custkey),
        |q AS (
        |  SELECT quantile_cont(r_days, [0.25, 0.5, 0.75]) AS rq,
        |         quantile_cont(f_cnt, [0.25, 0.5, 0.75]) AS fq,
        |         quantile_cont(m_cents, [0.25, 0.5, 0.75]) AS mq
        |  FROM c)
        |SELECT o_custkey, r_days, f_cnt, m_cents,
        |       CAST(4 - ((r_days > rq[1])::INT + (r_days > rq[2])::INT
        |                 + (r_days > rq[3])::INT) AS BIGINT) AS r_score,
        |       CAST(1 + (f_cnt > fq[1])::INT + (f_cnt > fq[2])::INT
        |              + (f_cnt > fq[3])::INT AS BIGINT) AS f_score,
        |       CAST(1 + (m_cents > mq[1])::INT + (m_cents > mq[2])::INT
        |              + (m_cents > mq[3])::INT AS BIGINT) AS m_score
        |FROM c, q ORDER BY o_custkey""".stripMargin) {
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val mx = o.agg(max("o_orderdate").as("m"))
        val c = o.crossJoin(broadcast(mx))
          .groupBy("o_custkey")
          .agg(datediff(max("m"), max("o_orderdate")).cast("long").as("r_days"),
            count(lit(1)).as("f_cnt"),
            sum(round(col("o_totalprice") * 100, 0).cast("long")).as("m_cents"))
        val q = c.agg(
          expr("percentile(r_days, array(0.25D, 0.5D, 0.75D))").as("rq"),
          expr("percentile(f_cnt, array(0.25D, 0.5D, 0.75D))").as("fq"),
          expr("percentile(m_cents, array(0.25D, 0.5D, 0.75D))").as("mq"))
        def score(v: String, b: String) =
          (col(v) > element_at(col(b), 1)).cast("int") +
            (col(v) > element_at(col(b), 2)).cast("int") +
            (col(v) > element_at(col(b), 3)).cast("int")
        c.crossJoin(broadcast(q))
          .select(col("o_custkey"), col("r_days"), col("f_cnt"), col("m_cents"),
            (lit(4) - score("r_days", "rq")).cast("long").as("r_score"),
            (lit(1) + score("f_cnt", "fq")).cast("long").as("f_score"),
            (lit(1) + score("m_cents", "mq")).cast("long").as("m_score"))
          .transform(d => graft.Q.sorted(d, "o_custkey"))
      }
    },

    // a25: gap-reset running sum — a cumulative total that restarts
    // whenever the user pauses >1 hour (per-visit running spend). The
    // segment-id trick turns "conditional reset" into plain windows:
    // flag = gap>1h, seg_id = running sum of flags, then a cumulative
    // sum within (user, seg). THREE window functions, ONE user-hash
    // exchange: seg_id rides the (user) sort and the inner cumsum's
    // (user, seg) partitioning is a refinement of it, so Catalyst plans
    // a single shuffle (the second Window re-sorts in place, no
    // re-exchange). O(1) window state throughout.
    Q("a25_reset_cumsum",
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
        |              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS reset
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, CAST(sum(reset) OVER w AS BIGINT) AS seg_id
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, seg_id,
        |       CAST(sum(cents) OVER (PARTITION BY user_id, seg_id
        |                             ORDER BY ts, event_id) AS BIGINT) AS run_cents
        |FROM s ORDER BY event_id""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val w2 = Window.partitionBy("user_id", "seg_id").orderBy("ts", "event_id")
        val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .withColumn("reset",
            when(gapUs > 3600000000L || gapUs.isNull, 1).otherwise(0))
          .withColumn("seg_id", sum("reset").over(w).cast("long"))
          .select(col("event_id"), col("user_id"), col("seg_id"),
            sum("cents").over(w2).cast("long").as("run_cents"))
          .transform(d => graft.Q.sorted(d, "event_id"))
      }
    },

    // a26: deterministic per-key mode — the most frequent event type
    // per user with a total-order tiebreak (count desc, type asc),
    // which engine-native mode() functions don't guarantee on ties.
    // Shape: (user, type) pre-aggregate with map-side partials, then a
    // WindowGroupLimit-eligible rank<=1 over the tiny per-user type
    // counts (≤5 rows/user) — never a window over raw events.
    Q("a26_mode",
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id, event_type),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY cnt DESC, event_type) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, cnt
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("cnt").desc, col("event_type"))
        Tables.events(s, dir)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
          .transform(d => graft.Q.sorted(d, "user_id"))
      }
    })
}
