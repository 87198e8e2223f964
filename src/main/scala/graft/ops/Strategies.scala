package graft.ops

import graft.Q
import graft.sources.Bars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trading-strategy signal generators (SURVEY.md §2.5 T1-T4), replicating
  * reference `streamlit_app/streamlit_app.py:212-239` as-written — quirks
  * included (T1's window contains the current row, so its predicate is
  * unsatisfiable and the signal is always 0; pandas overwrite order makes
  * SELL win where BUY and SELL overlap in T2).
  *
  * signal ∈ {1 buy, -1 sell, 0 hold} as IntegerType.
  */
object Strategies {
  import Rolling._

  /** T1 scalping (:212-216): close vs rolling(5) min/max of itself. */
  def scalping(df: DataFrame): DataFrame =
    df.withColumn("signal",
      when(col("close") < rmin(col("close"), 5), 1)
        .when(col("close") > rmax(col("close"), 5), -1)
        .otherwise(0))

  /** T2 range trading (:218-224): per-symbol global support/resistance
    * bands. pandas sets BUY then overwrites with SELL — SELL wins overlaps.
    * The per-symbol extrema ride the same symbol-window (no extra shuffle,
    * no driver round-trip) via an unbounded frame.
    */
  def rangeTrading(df: DataFrame): DataFrame = {
    val whole = Window.partitionBy("symbol")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val support = min(col("low")).over(whole)
    val resistance = max(col("high")).over(whole)
    df.withColumn("signal",
      when(col("close") >= resistance * 0.95, -1)
        .when(col("close") <= support * 1.05, 1)
        .otherwise(0))
  }

  /** T3 momentum (:226-231): close - close.shift(5). */
  def momentum(df: DataFrame): DataFrame =
    df.withColumn("momentum", diff(col("close"), 5))
      .withColumn("signal",
        when(col("momentum") > 0, 1).when(col("momentum") < 0, -1).otherwise(0))

  /** T4 breakout (:233-239): close vs yesterday's rolling(20) extrema. */
  def breakout(df: DataFrame): DataFrame = {
    val withExt = df
      .withColumn("bk_max", rmax(col("close"), 20))
      .withColumn("bk_min", rmin(col("close"), 20))
    withExt.withColumn("signal",
        when(col("close") > lag1(col("bk_max")), 1)
          .when(col("close") < lag1(col("bk_min")), -1)
          .otherwise(0))
      .drop("bk_max", "bk_min")
  }

  private def barsQ(extra: String, select: String): String =
    s"WITH ${Bars.cte}, $extra\n$select"

  private val base = "SELECT symbol, datetime, round(close, 6) AS close, signal FROM x ORDER BY symbol, datetime"

  def queries: Seq[Q] = Seq(
    Q("t1_scalping",
      barsQ(
        s"""x AS (SELECT symbol, datetime, close,
           |  CASE WHEN close < ${Sql.rollMin("close", 5)} THEN 1
           |       WHEN close > ${Sql.rollMax("close", 5)} THEN -1 ELSE 0 END AS signal FROM bars)""".stripMargin,
        base)) { (s, dir) =>
      Q.norm(scalping(Bars(s, dir)).select("symbol", "datetime", "close", "signal"),
        "symbol", "datetime")
    },

    Q("t2_range_trading",
      barsQ(
        s"""x AS (SELECT symbol, datetime, close,
           |  CASE WHEN close >= max(high) OVER (PARTITION BY symbol) * 0.95 THEN -1
           |       WHEN close <= min(low) OVER (PARTITION BY symbol) * 1.05 THEN 1
           |       ELSE 0 END AS signal FROM bars)""".stripMargin,
        base)) { (s, dir) =>
      Q.norm(rangeTrading(Bars(s, dir)).select("symbol", "datetime", "close", "signal"),
        "symbol", "datetime")
    },

    Q("t3_momentum",
      barsQ(
        s"""x AS (SELECT symbol, datetime, close, ${Sql.diffK("close", 5)} AS momentum,
           |  CASE WHEN ${Sql.diffK("close", 5)} > 0 THEN 1
           |       WHEN ${Sql.diffK("close", 5)} < 0 THEN -1 ELSE 0 END AS signal FROM bars)""".stripMargin,
        "SELECT symbol, datetime, round(close, 6) AS close, round(momentum, 6) AS momentum, signal FROM x ORDER BY symbol, datetime")) {
      (s, dir) =>
        Q.norm(momentum(Bars(s, dir)).select("symbol", "datetime", "close", "momentum", "signal"),
          "symbol", "datetime")
    },

    Q("t4_breakout",
      barsQ(
        s"""b1 AS (SELECT symbol, datetime, close, ${Sql.rollMax("close", 20)} AS bk_max,
           |        ${Sql.rollMin("close", 20)} AS bk_min FROM bars),
           |x AS (SELECT symbol, datetime, close,
           |  CASE WHEN close > ${Sql.lag("bk_max")} THEN 1
           |       WHEN close < ${Sql.lag("bk_min")} THEN -1 ELSE 0 END AS signal FROM b1)""".stripMargin,
        base)) { (s, dir) =>
      Indicators.tieredCols(s, dir, Seq(col("symbol"), col("datetime"),
        col("close"), col("breakout_signal").as("signal"))) {
        Q.norm(breakout(Bars(s, dir)).select("symbol", "datetime", "close", "signal"),
          "symbol", "datetime")
      }
    },

    // T5 (beyond-reference): the query a strategy user runs NEXT — a
    // vectorized long/flat backtest of the momentum signal. Position =
    // last nonzero signal (BUY holds until SELL); per-bar PnL =
    // yesterday's position x close change, accumulated. Everything is
    // window algebra over the one shared (symbol, datetime) sort — no
    // driver loop over bars, which is how backtests usually go wrong at
    // scale — and PnL accumulates in micro-quantized integers, so the
    // running sum is exact and engine-independent.
    Q("t5_backtest",
      barsQ(
        """m AS (SELECT symbol, datetime, close,
          |  CAST(round(close * 1e6, 0) AS BIGINT) AS qc,
          |  close - lag(close, 5) OVER (PARTITION BY symbol ORDER BY datetime) AS mom
          |  FROM bars),
          |sg AS (SELECT *, CASE WHEN mom > 0 THEN 1 WHEN mom < 0 THEN -1 ELSE 0 END AS signal FROM m),
          |p AS (SELECT *, CASE WHEN last_value(CASE WHEN signal <> 0 THEN signal END IGNORE NULLS)
          |        OVER (PARTITION BY symbol ORDER BY datetime ROWS UNBOUNDED PRECEDING) = 1
          |      THEN 1 ELSE 0 END AS position FROM sg),
          |pq AS (SELECT *, CASE WHEN lag(qc) OVER (PARTITION BY symbol ORDER BY datetime) IS NULL THEN 0
          |         ELSE lag(position) OVER (PARTITION BY symbol ORDER BY datetime)
          |              * (qc - lag(qc) OVER (PARTITION BY symbol ORDER BY datetime)) END AS qpnl
          |       FROM p),
          |x AS (SELECT symbol, datetime, close, position,
          |  sum(CAST(qpnl AS DECIMAL(28,0))) OVER (PARTITION BY symbol ORDER BY datetime ROWS UNBOUNDED PRECEDING) AS cq
          |  FROM pq)""".stripMargin,
        """SELECT symbol, datetime, round(close, 6) AS close, position,
          |round(CAST(cq AS DOUBLE) / 1e6, 6) AS cum_pnl
          |FROM x ORDER BY symbol, datetime""".stripMargin)) { (s, dir) => {
      val w = Rolling.W
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sig = momentum(Bars(s, dir))
        .withColumn("qc", round(col("close") * 1e6, 0).cast("long"))
        .withColumn("lastsig",
          last(when(col("signal") =!= 0, col("signal")), ignoreNulls = true).over(cum))
        .withColumn("position", when(col("lastsig") === 1, 1).otherwise(0))
      val pnl = sig.withColumn("qpnl",
        when(lag(col("qc"), 1).over(w).isNull, lit(0L))
          .otherwise(lag(col("position"), 1).over(w).cast("long")
            * (col("qc") - lag(col("qc"), 1).over(w))))
      // per-bar qpnl fits Int64 easily (one micro-priced delta x {0,1});
      // the UNBOUNDED cumulative sum is where a long history could wrap,
      // so that accumulation runs in decimal (~1e38 headroom), mirrored
      // in the oracle's CAST(qpnl AS DECIMAL(28,0))
      Q.norm(
        pnl.withColumn("cum_pnl",
            sum(col("qpnl").cast("decimal(28,0)")).over(cum).cast("double") / 1e6)
          .select("symbol", "datetime", "close", "position", "cum_pnl"),
        "symbol", "datetime")
    }},

    // T6 (beyond-reference): pairs-trading mean-reversion — the strategy
    // the w16 correlation feeds. Spread = leg-price difference in cents;
    // entry when the 20-bar z-score exceeds ±2, via EXACT integer
    // algebra (the w11 scheme): |z| > 2 ⇔ (n·s − S)² > 4·(n·SS − S²)
    // over BIGINT window sums, so the signal is bit-stable across
    // engines and shuffle orders; milli_z2 = z²·1000 by exact integer
    // division rides along as the sizing diagnostic. Every C(symbols,2)
    // pair streams through the same pair-partitioned window as w16.
    Q("t6_pairs_zscore", pairsZscoreSql(None)) {
      (s, dir) => pairsZscore(s, dir, None)
    },

    // t6's CANDIDATE-RESTRICTED variant (round-12 task 7 — the w16r
    // pair-universe parameter threaded through to the strategy twin):
    // the trading signal inherits the restricted plan — leg predicate
    // below the bar aggregation on the event rows, pair predicate below
    // the window. At a real universe the watchlist is the input; the
    // all-pairs C(n,2) scan must be a choice, not the only plan.
    Q("t6r_pairs_zscore_sel",
      pairsZscoreSql(Some(graft.ops.Indicators.SelectedPairs))) {
      (s, dir) => pairsZscore(s, dir, Some(graft.ops.Indicators.SelectedPairs))
    })

  /** The t6 plan with the pair universe as a parameter (None = all
    * a < b pairs in one pass) — [[graft.ops.Indicators.pairCorr]]'s
    * predicate placement, z-score gate instead of Pearson. */
  def pairsZscore(s: org.apache.spark.sql.SparkSession, dir: String,
      pairs: Option[Seq[(String, String)]]): DataFrame = {
    // shares w16's tier-dispatched rolling integer statistics
    // (Indicators.pairStats — window at shallow history, PairScan's
    // chunked replay at deep); the spread sums are integer identities
    // of the (x, y) sums: Σs = Σx−Σy, Σs² = Σx²−2Σxy+Σy² — EXACT, so
    // the signal is unchanged by the re-derivation
    val w = Indicators.pairStats(s, dir, pairs)
      .select(col("pair"), col("datetime"), col("n"),
        (col("x") - col("y")).as("s"),
        (col("sx") - col("sy")).as("sm"),
        (col("sxx") - lit(2L) * col("sxy") + col("syy")).as("ss"))
    val dev = col("n") * col("s") - col("sm")
    val varn = col("n") * col("ss") - col("sm") * col("sm")
    Q.sorted(
      w.select(col("pair"), col("datetime"), col("s"),
        when(col("n") === 20 && dev * dev > lit(4L) * varn,
          when(dev > 0, -1L).otherwise(1L)).otherwise(0L).as("signal"),
        when(col("n") === 20 && col("n") * col("ss") > col("sm") * col("sm"),
          expr("((n*s - sm)*(n*s - sm) * 1000) div (n*ss - sm*sm)"))
          .otherwise(-1L).as("milli_z2")),
      "pair", "datetime")
  }

  /** Oracle twin of [[pairsZscore]]: the same leg and pair predicates
    * in the same positions (the pairCorrSql scheme). */
  private def pairsZscoreSql(pairs: Option[Seq[(String, String)]]): String = {
    val legPred = pairs.map { ps =>
      val legs = ps.flatMap(p => Seq(p._1, p._2)).distinct
      s" WHERE symbol IN (${legs.map(l => s"'$l'").mkString(", ")})"
    }.getOrElse("")
    val pairPred = pairs.map { ps =>
      s" AND a.symbol || '|' || b.symbol IN (${ps.map(p => s"'${p._1}|${p._2}'").mkString(", ")})"
    }.getOrElse("")
    s"""WITH ${Bars.cte},
       |c AS (SELECT symbol, datetime, CAST(round(close * 100, 0) AS BIGINT) AS cents
       |      FROM bars$legPred),
       |xy AS (SELECT a.symbol || '|' || b.symbol AS pair, a.datetime AS datetime,
       |              a.cents - b.cents AS s
       |       FROM c a JOIN c b ON a.datetime = b.datetime AND a.symbol < b.symbol$pairPred),
       |w AS (SELECT pair, datetime, s,
       |        CAST(count(*) OVER win AS BIGINT) AS n,
       |        CAST(sum(s) OVER win AS BIGINT) AS sm,
       |        CAST(sum(s*s) OVER win AS BIGINT) AS ss
       |      FROM xy
       |      WINDOW win AS (PARTITION BY pair ORDER BY datetime
       |                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
       |SELECT pair, datetime, s,
       |       CAST(CASE WHEN n = 20 AND (n*s - sm)*(n*s - sm) > 4*(n*ss - sm*sm)
       |                 THEN CASE WHEN n*s - sm > 0 THEN -1 ELSE 1 END
       |                 ELSE 0 END AS BIGINT) AS signal,
       |       CAST(CASE WHEN n = 20 AND n*ss > sm*sm
       |                 THEN ((n*s - sm)*(n*s - sm) * 1000) // (n*ss - sm*sm)
       |                 ELSE -1 END AS BIGINT) AS milli_z2
       |FROM w ORDER BY pair, datetime""".stripMargin
  }
}
