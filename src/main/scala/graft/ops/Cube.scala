package graft.ops

import graft.Q
import graft.ext.Portable
import graft.sources.{Bars, Tables}
import org.apache.spark.sql.functions._

/** Multi-level aggregation + sampling operators — capabilities the
  * reference lacks entirely (SURVEY.md §2.3 "absent" list) covered with
  * their stock Spark answers, oracle-checked.
  */
object Cube {

  private def barsQ(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  def queries: Seq[Q] = Seq(

    // ROLLUP (symbol, trading day): per-day stats, per-symbol subtotals,
    // grand total. Decimal sums keep cross-shuffle accumulation exact.
    Q("a5_rollup",
      barsQ(
        """x AS (SELECT coalesce(symbol, 'ALL') AS symbol,
          |              coalesce(strftime(date_trunc('day', datetime), '%Y-%m-%d'), 'ALL') AS day,
          |              CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS close_sum,
          |              count(*) AS n_bars
          |       FROM bars GROUP BY ROLLUP (symbol, date_trunc('day', datetime)))""".stripMargin,
        """SELECT symbol, day, round(close_sum, 6) AS close_sum, n_bars
          |FROM x ORDER BY symbol, day""".stripMargin)) {
      (s, dir) =>
        Q.norm(
          Bars(s, dir)
            .rollup(col("symbol"), date_trunc("day", col("datetime")).as("d"))
            .agg(sum(col("close").cast("decimal(18,2)")).cast("double").as("close_sum"),
              count(lit(1)).as("n_bars"))
            .select(
              coalesce(col("symbol"), lit("ALL")).as("symbol"),
              coalesce(date_format(col("d"), "yyyy-MM-dd"), lit("ALL")).as("day"),
              col("close_sum"), col("n_bars")),
          "symbol", "day")
    },

    // CUBE (symbol, event_type): all four grouping-set combinations in
    // one pass — Spark plans a single Expand + one hash aggregation, so
    // the input is scanned once however many sets there are. Integer
    // counts + decimal sums stay exact across the expanded shuffle.
    Q("a9_cube",
      s"""WITH e AS (SELECT event_type,
        |                  ${Bars.sqlSymbolFor("user_id")} AS symbol,
        |                  value
        |           FROM events),
        |x AS (SELECT coalesce(symbol, 'ALL') AS symbol,
        |             coalesce(event_type, 'ALL') AS event_type,
        |             count(*) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |      FROM e GROUP BY CUBE (symbol, event_type))
        |SELECT symbol, event_type, n, round(value_sum, 6) AS value_sum
        |FROM x ORDER BY symbol, event_type""".stripMargin) {
      (s, dir) =>
        Q.norm(
          Tables.events(s, dir)
            .select(Bars.symbolFor(col("user_id")).as("symbol"),
              col("event_type"), col("value"))
            .cube(col("symbol"), col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
            .select(coalesce(col("symbol"), lit("ALL")).as("symbol"),
              coalesce(col("event_type"), lit("ALL")).as("event_type"),
              col("n"), col("value_sum")),
          "symbol", "event_type")
    },

    // GROUPING SETS ((symbol), (event_type)): two independent one-dim
    // aggregations in a single scan — the set pair no ROLLUP/CUBE
    // reordering can express, and the reason grouping sets exist. Spark
    // plans one Expand (x2 row replication) + one hash aggregation, so a
    // 100 TB input is read once instead of once per report dimension;
    // partial aggregation still collapses each map task to
    // O(|symbols| + |event_types|) rows before the exchange.
    Q("a13_grouping_sets",
      s"""WITH e AS (SELECT event_type,
        |                  ${Bars.sqlSymbolFor("user_id")} AS symbol,
        |                  value
        |           FROM events),
        |x AS (SELECT coalesce(symbol, 'ALL') AS symbol,
        |             coalesce(event_type, 'ALL') AS event_type,
        |             count(*) AS n,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |      FROM e GROUP BY GROUPING SETS ((symbol), (event_type)))
        |SELECT symbol, event_type, n, round(value_sum, 6) AS value_sum
        |FROM x ORDER BY symbol, event_type""".stripMargin) {
      (s, dir) =>
        Q.norm(
          Tables.events(s, dir)
            .select(Bars.symbolFor(col("user_id")).as("symbol"),
              col("event_type"), col("value"))
            .groupingSets(
              Seq(Seq(col("symbol")), Seq(col("event_type"))),
              col("symbol"), col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
            .select(coalesce(col("symbol"), lit("ALL")).as("symbol"),
              coalesce(col("event_type"), lit("ALL")).as("event_type"),
              col("n"), col("value_sum")),
          "symbol", "event_type")
    },

    // Exact linear-interpolated quantiles per event_type: Spark
    // `percentile` and DuckDB `quantile_cont` implement the same
    // definition (sorted order statistics + linear interpolation), so
    // the values are cell-exact — no approx sketch mismatch. At scale
    // exact percentile is a sort-based aggregate per group; for a
    // 100 TB untyped stream you'd switch to approx_percentile and lose
    // the oracle, which is why the exact op is the checked one.
    Q("a10_quantiles",
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95,
        |       round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        Q.norm(
          Tables.events(s, dir)
            .groupBy("event_type")
            .agg(
              expr("percentile(value, 0.5)").as("p50"),
              expr("percentile(value, 0.95)").as("p95"),
              expr("percentile(value, 0.99)").as("p99")),
          "event_type")
    },

    // The a10 scale rung: same quantiles through the mergeable
    // percentile sketch (`Sketch.approxQuantiles` — O(accuracy·log n)
    // state instead of buffering every group value; the ONLY quantile
    // that survives a hot group at 100 TB). Sketch values legitimately
    // differ from DuckDB's inside the rank-error bound, so the oracle
    // checks the INVARIANT instead of the value: both engines compute
    // the exact order statistics at ranks q·n ± (⌈n/accuracy⌉+2) — raw
    // data elements via row_number, no interpolation, so they are
    // cell-identical across engines — and the Spark side additionally
    // asserts its sketch output lies inside them (`okXX`), which DuckDB
    // emits as the constant the guarantee demands. A drifting sketch
    // flips okXX to 0 and the driver hash goes red. (Rank-bound per
    // Greenwald–Khanna: percentile_approx returns a real element whose
    // rank error is ≤ n/accuracy.)
    Q("a10_quantiles_approx", {
      val d = "CAST(ceil(n / 10000.0) AS BIGINT) + 2"
      def lo(q: String, a: String) =
        s"max(CASE WHEN rk <= greatest(1, CAST(floor(n * $q) AS BIGINT) - ($d)) THEN value END) AS lo$a"
      def hi(q: String, a: String) =
        s"min(CASE WHEN rk >= least(n, CAST(ceil(n * $q) AS BIGINT) + ($d)) THEN value END) AS hi$a"
      s"""WITH r AS (
         |  SELECT event_type, value,
         |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         |         count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |b AS (
         |  SELECT event_type,
         |         ${lo("0.5", "50")}, ${hi("0.5", "50")},
         |         ${lo("0.95", "95")}, ${hi("0.95", "95")},
         |         ${lo("0.99", "99")}, ${hi("0.99", "99")}
         |  FROM r GROUP BY event_type)
         |SELECT event_type,
         |       round(lo50, 6) AS lo50, round(hi50, 6) AS hi50,
         |       round(lo95, 6) AS lo95, round(hi95, 6) AS hi95,
         |       round(lo99, 6) AS lo99, round(hi99, 6) AS hi99,
         |       CAST(1 AS BIGINT) AS ok50, CAST(1 AS BIGINT) AS ok95,
         |       CAST(1 AS BIGINT) AS ok99
         |FROM b ORDER BY event_type""".stripMargin
    }) {
      (s, dir) => {
        val acc = 10000
        val e = Tables.events(s, dir).select(col("event_type"), col("value"))
        val byKey = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        val ranked = e
          .withColumn("rk", row_number().over(byKey.orderBy("value")))
          .withColumn("n", count(lit(1)).over(byKey))
        val d = ceil(col("n") / acc).cast("long") + lit(2L)
        def lo(q: Double) = max(when(
          col("rk") <= greatest(lit(1L), floor(col("n") * q).cast("long") - d),
          col("value")))
        def hi(q: Double) = min(when(
          col("rk") >= least(col("n"), ceil(col("n") * q).cast("long") + d),
          col("value")))
        val bounds = ranked.groupBy("event_type").agg(
          lo(0.5).as("lo50"), hi(0.5).as("hi50"),
          lo(0.95).as("lo95"), hi(0.95).as("hi95"),
          lo(0.99).as("lo99"), hi(0.99).as("hi99"))
        val approx = graft.ops.Sketch.approxQuantiles(
          e, Seq("event_type"), "value", Seq(0.5, 0.95, 0.99), acc)
        def ok(p: String, a: String) =
          (col(p) >= col(s"lo$a") && col(p) <= col(s"hi$a"))
            .cast("long").as(s"ok$a")
        Q.norm(
          approx.join(bounds, "event_type")
            .select(col("event_type"),
              col("lo50"), col("hi50"), col("lo95"), col("hi95"),
              col("lo99"), col("hi99"),
              ok("p50", "50"), ok("p95", "95"), ok("p99", "99")),
          "event_type")
      }
    },

    // Gap-based sessionization of the event stream (30-min inactivity
    // boundary): the canonical large-scale clickstream op. One window
    // pass computes session breaks + running session numbers; the
    // aggregation groups on (user, session). Second-granularity gap on
    // both engines: epoch-floor on the Spark side, second-boundary count
    // in DuckDB (equivalent definitions).
    Q("a6_sessionize",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM g)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |       CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       CAST(max(ts) AS TIMESTAMP) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) {
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Long.MinValue, 0)
        val e = Tables.events(s, dir)
        val prev = lag(col("ts"), 1).over(w)
        val sess = e
          .withColumn("brk",
            when(prev.isNull ||
              col("ts").cast("long") - prev.cast("long") > 1800, 1).otherwise(0))
          .withColumn("session_no", sum(col("brk")).over(run))
        sess.groupBy("user_id", "session_no")
          .agg(min("ts").as("session_start"), max("ts").as("session_end"),
            count(lit(1)).as("n_events"))
          .transform(d => graft.Q.sorted(d, "user_id", "session_no"))
      }
    },

    // Exact distributed Pearson correlation: all five sufficient
    // statistics as DECIMAL sums (order-independent across shuffles),
    // converted to double only in the final scalar formula — engine-native
    // corr() would flap on float accumulation order.
    Q("a7_exact_corr",
      barsQ(
        """x AS (SELECT symbol,
          |              count(*) AS n,
          |              CAST(sum(CAST(close AS DECIMAL(28,4))) AS DOUBLE) AS sx,
          |              CAST(sum(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS sy,
          |              CAST(sum(CAST(close AS DECIMAL(28,4)) * CAST(close AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
          |              CAST(sum(CAST(volume AS DECIMAL(28,4)) * CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS syy,
          |              CAST(sum(CAST(close AS DECIMAL(28,4)) * CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS sxy
          |       FROM bars GROUP BY symbol)""".stripMargin,
        """SELECT symbol,
          |       round(CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) <= 0 THEN NULL
          |             ELSE (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
          |             END, 6) AS close_volume_corr
          |FROM x ORDER BY symbol""".stripMargin)) {
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(28,4)")
        val x = Bars(s, dir).groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(dec(col("close"))).cast("double").as("sx"),
          sum(dec(col("volume"))).cast("double").as("sy"),
          sum(dec(col("close")) * dec(col("close"))).cast("double").as("sxx"),
          sum(dec(col("volume")) * dec(col("volume"))).cast("double").as("syy"),
          sum(dec(col("close")) * dec(col("volume"))).cast("double").as("sxy"))
        val varProd = (col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))
        x.select(col("symbol"),
          graft.Q.r6(when(varProd <= 0, lit(null))
            .otherwise((col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(varProd)))
            .as("close_volume_corr"))
          .transform(d => graft.Q.sorted(d, "symbol"))
      }
    },

    // Deterministic hash sampling: stable ~10% sample keyed on doc_id —
    // the production-correct way to sample reproducibly across engines
    // and runs (engine-native random samples are not comparable).
    Q("x_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${Portable.sqlHash60("CAST(doc_id AS VARCHAR)")} % 10 = 0
         |ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .where(Portable.hash60(col("doc_id").cast("string")) % 10 === 0)
          .select("doc_id", "lang")
          .transform(d => graft.Q.sorted(d, "doc_id"))
    },

    // Stratified fixed-size sampling: exactly K docs per language,
    // chosen by deterministic hash rank — how a training mix equalizes
    // group representation reproducibly (a random per-group sample is
    // neither reproducible nor comparable across engines). Spark plans
    // the rank-filter as WindowGroupLimit: the top-K per group is
    // computed DURING the shuffle read (partial top-K map-side), so at
    // 100 TB each reducer only ever materializes K rows per group, not
    // the group's full membership.
    Q("x_stratified", {
      val h = Portable.sqlHash60("CAST(doc_id AS VARCHAR)")
      s"""WITH h AS (SELECT doc_id, lang, $h AS hk FROM documents),
         |r AS (SELECT doc_id, lang,
         |             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rnk
         |      FROM h)
         |SELECT doc_id, lang, rnk FROM r WHERE rnk <= $StratifiedK
         |ORDER BY lang, rnk""".stripMargin
    }) {
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(col("hk"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            Portable.hash60(col("doc_id").cast("string")).as("hk"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= StratifiedK)
          .select(col("doc_id"), col("lang"), col("rnk").cast("long").as("rnk"))
          .transform(d => graft.Q.sorted(d, "lang", "rnk"))
      }
    },

    // a19: the full SQL rank-function family in one pass — ntile /
    // percent_rank / cume_dist / lag / nth_value over a single
    // (priority, price) sort. Everything rides ONE window partitioning:
    // Catalyst plans one exchange + one sort and evaluates all five
    // functions in the same WindowExec (nth_value's whole-partition
    // frame adds an unbounded-following pass, same sort). Deterministic
    // total order: (o_totalprice, o_orderkey) — orderkey breaks ties, so
    // rank outputs are engine-independent. Money compares as integer
    // cents; the two true ratios (percent_rank/cume_dist) are k/(n±1)
    // rationals both engines compute from the same integers, rounded 6dp.
    Q("a19_rank_family",
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cdist,
        |       CAST(coalesce(lag(CAST(round(o_totalprice * 100, 0) AS BIGINT), 1)
        |         OVER w, -1) AS BIGINT) AS prev_cents,
        |       CAST(nth_value(CAST(round(o_totalprice * 100, 0) AS BIGINT), 3) OVER
        |         (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS BIGINT) AS third_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        Tables.orders(s, dir).select(
            col("o_orderkey"), col("o_orderpriority"),
            cents.as("cents"),
            ntile(4).over(w).cast("long").as("quartile"),
            graft.Q.r6(percent_rank().over(w)).as("pct_rank"),
            graft.Q.r6(cume_dist().over(w)).as("cdist"),
            coalesce(lag(cents, 1).over(w), lit(-1L)).as("prev_cents"),
            nth_value(cents, 3).over(wFull).as("third_cents"))
          .transform(d => graft.Q.sorted(d, "o_orderkey"))
      }
    },

    // a23: top-k per group WITHOUT ranking the whole group — the
    // rank<=k filter that Spark's InferWindowGroupLimit rewrites into a
    // WindowGroupLimit operator: each task keeps a k-row heap per key
    // BEFORE the exchange, so the shuffle moves O(k·groups) rows, not
    // the whole table (PlanShapeSpec-style pin lives in Ext7Spec). The
    // window sort itself then runs on k rows per group. This is the
    // scale-correct "top 3 orders per priority", vs the naive full
    // window sort.
    Q("a23_topk_group",
      """WITH rk AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey, cents
        |FROM rk WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
            col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .transform(d => graft.Q.sorted(d, "o_orderpriority", "rn"))
      }
    })

  /** Docs kept per language stratum in x_stratified. */
  val StratifiedK = 20
}
