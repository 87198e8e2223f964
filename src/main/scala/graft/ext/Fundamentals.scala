package graft.ext

import graft.Q
import graft.sources.{Bars, Flatten, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The fundamentals surface (SURVEY.md §2.1 S4, §2.2 P1-P3): per-symbol
  * semi-structured financial datasets, built from the star schema the way
  * the reference builds them from yfinance — nested dataset -> flattened
  * wide row (`yahoo_finance_producer.py:26-50,72-80`) -> long format.
  *
  * The reference fetches TWENTY yfinance datasets per ticker
  * (`yahoo_finance_producer.py:28-48`: actions, dividends, splits, shares,
  * income_stmt, quarterly_income_stmt, balance_sheet,
  * quarterly_balance_sheet, cashflow, quarterly_cashflow, major_holders,
  * institutional_holders, mutualfund_holders, insider_transactions,
  * insider_purchases, insider_roster_holders, recommendations,
  * recommendations_summary, upgrades_downgrades, earnings_dates). This
  * models the same twenty dataset names over the star schema, INCLUDING
  * the reference's annual-vs-quarterly variant axis: yfinance encodes the
  * variant in the dataset name (`quarterly_income_stmt` next to
  * `income_stmt`), and here each quarterly_* twin is the same aggregation
  * restricted to the trailing window (`o_orderdate >= 2001-01-01`, the
  * data's final quarters) — computed as CONDITIONAL aggregates inside the
  * annual dataset's own pass, so the variant axis costs columns, not
  * scans.
  *
  * Scale/determinism notes:
  *   - Seven aggregation passes produce all twenty datasets (orders x
  *     customer join, customer, orders, lineitem, supplier, part,
  *     events); per-symbol results are 3 rows each, so the final
  *     assembly joins are broadcast-trivial at any scale. Adding a
  *     dataset to an existing source rides its pass for free.
  *   - Money sums go through DECIMAL(18,2): exact, order-independent —
  *     a double SUM across a shuffle has nondeterministic accumulation
  *     order and would flap against the oracle.
  *   - Timestamps normalize to UTC strings (P1) exactly like the
  *     reference's `convert_timestamps` (`yahoo_finance_producer.py:53-69`).
  */
object Fundamentals {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** The "quarterly" variant window: the data's trailing quarters.
    * Annual datasets aggregate all history; quarterly_* twins restrict
    * to this window, mirroring yfinance's annual/quarterly statement
    * pairs.
    */
  val QuarterStart = "2001-01-01 00:00:00"
  private val qTs = java.sql.Timestamp.valueOf(QuarterStart)
  private val qSql = "TIMESTAMP '2001-01-01 00:00:00'"

  /** Nested per-symbol fundamentals: twenty datasets, one struct each. */
  def nested(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderstatus"))
    val joined = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("symbol", Bars.symbolFor(col("c_custkey")))
    val inQ = col("o_orderdate") >= lit(qTs)

    // income_stmt + insider_transactions + quarterly_balance_sheet: the
    // orders x customer join, ONE pass (the quarterly variant is a
    // conditional agg over the same rows)
    val passJoin = joined.groupBy("symbol").agg(
      struct(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers")).as("income_stmt"),
      struct(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("first_order"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("last_order"),
        sum(dec(col("c_acctbal"))).cast("double").as("acctbal_sum")).as("insider_transactions"),
      struct(
        sum(when(inQ, dec(col("c_acctbal"))).otherwise(dec(lit(0))))
          .cast("double").as("q_acctbal_sum"),
        sum(when(inQ, 1L).otherwise(0L)).as("q_n_orders")).as("quarterly_balance_sheet"))

    // balance_sheet + insider_roster_holders: customer, one pass
    val passCust = Tables.customer(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("c_custkey")))
      .groupBy("symbol").agg(
        struct(
          sum(when(col("c_acctbal") > 0, dec(col("c_acctbal")))
            .otherwise(dec(lit(0)))).cast("double").as("assets"),
          sum(when(col("c_acctbal") < 0, -dec(col("c_acctbal")))
            .otherwise(dec(lit(0)))).cast("double").as("liabilities"),
          count(lit(1)).as("n_accounts")).as("balance_sheet"),
        struct(
          countDistinct(col("c_mktsegment")).as("n_segments"),
          max(col("c_acctbal")).as("max_acctbal")).as("insider_roster_holders"))

    // cashflow + quarterly_income_stmt + quarterly_cashflow +
    // earnings_dates + insider_purchases: FIVE datasets off ONE orders
    // agg pass — widening the dataset surface costs columns, not scans
    val passOrders = Tables.orders(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("o_custkey")))
      .groupBy("symbol").agg(
        struct(
          sum(dec(col("o_totalprice"))).cast("double").as("inflow"),
          max(col("o_totalprice")).as("max_order"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"))
          .as("cashflow"),
        struct(
          sum(when(inQ, dec(col("o_totalprice"))).otherwise(dec(lit(0))))
            .cast("double").as("q_revenue"),
          sum(when(inQ, 1L).otherwise(0L)).as("q_n_orders")).as("quarterly_income_stmt"),
        struct(
          sum(when(inQ && col("o_orderstatus") === "O", dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("q_inflow"),
          sum(when(inQ && col("o_orderstatus") === "O", 1L).otherwise(0L))
            .as("q_n_open")).as("quarterly_cashflow"),
        struct(
          date_format(min(when(col("o_orderstatus") === "O", col("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("first_open"),
          date_format(max(when(col("o_orderstatus") === "O", col("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("last_open"),
          countDistinct(year(col("o_orderdate"))).as("n_years")).as("earnings_dates"),
        struct(
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("finished_rev"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"))
          .as("insider_purchases"))

    // shares + actions + dividends + splits: lineitem volumes and
    // discount/tax flows, one pass (reference shares / actions /
    // dividends / splits analogs — actions is the dividends+splits
    // union, exactly yfinance's shape)
    val li = Tables.lineitem(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("l_suppkey")))
    val passLine = li.groupBy("symbol").agg(
      struct(
        sum(dec(col("l_quantity"))).cast("double").as("volume"),
        count(lit(1)).as("n_lines")).as("shares"),
      struct(
        sum(dec(col("l_discount")) + dec(col("l_tax"))).cast("double").as("action_sum"),
        sum(when(col("l_discount") > 0 || col("l_tax") > 0, 1L).otherwise(0L))
          .as("n_actions")).as("actions"),
      struct(
        sum(dec(col("l_discount"))).cast("double").as("dividend_sum"),
        sum(when(col("l_discount") > 0, 1L).otherwise(0L)).as("n_discounted"))
        .as("dividends"),
      struct(
        sum(dec(col("l_tax"))).cast("double").as("split_sum"),
        max(col("l_tax")).as("max_tax")).as("splits"))

    // major_holders + institutional_holders + mutualfund_holders:
    // supplier side, one pass
    val passSupp = Tables.supplier(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("s_suppkey")))
      .groupBy("symbol").agg(
        struct(
          count(lit(1)).as("n_suppliers"),
          sum(dec(col("s_acctbal"))).cast("double").as("acctbal")).as("major_holders"),
        struct(
          max(col("s_acctbal")).as("max_acctbal"),
          min(col("s_acctbal")).as("min_acctbal")).as("institutional_holders"),
        struct(
          countDistinct(col("s_nationkey")).as("n_nations"),
          sum(when(col("s_acctbal") > 0, dec(col("s_acctbal")))
            .otherwise(dec(lit(0)))).cast("double").as("acctbal_pos"))
          .as("mutualfund_holders"))

    // recommendations + recommendations_summary: part stats, one pass
    val passPart = Tables.part(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("p_partkey")))
      .groupBy("symbol").agg(
        struct(
          count(lit(1)).as("n_parts"),
          (sum(dec(col("p_retailprice"))).cast("double") / count(lit(1)))
            .as("avg_retail")).as("recommendations"),
        struct(
          min(col("p_size")).cast("long").as("min_size"),
          max(col("p_size")).cast("long").as("max_size"),
          countDistinct(col("p_brand")).as("n_brands")).as("recommendations_summary"))

    // upgrades_downgrades: analyst-action analog over the event stream
    // (signup = upgrade, error = downgrade), one pass
    val passEvents = Tables.events(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("user_id")))
      .groupBy("symbol").agg(
        struct(
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_upgrades"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_downgrades"))
          .as("upgrades_downgrades"))

    passJoin
      .join(passCust, Seq("symbol"))
      .join(passOrders, Seq("symbol"))
      .join(passLine, Seq("symbol"))
      .join(passSupp, Seq("symbol"))
      .join(passPart, Seq("symbol"))
      .join(passEvents, Seq("symbol"))
  }

  private val nestedCte =
    s"""j AS (
      |  SELECT ${Bars.sqlSymbolFor("c_custkey")} AS symbol,
      |         o_totalprice, o_orderdate, o_custkey, c_acctbal
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), f0 AS (
      |  SELECT symbol,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS income_stmt_revenue,
      |         count(*) AS income_stmt_n_orders,
      |         count(DISTINCT o_custkey) AS income_stmt_n_customers,
      |         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS insider_transactions_first_order,
      |         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS insider_transactions_last_order,
      |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS insider_transactions_acctbal_sum,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS quarterly_balance_sheet_q_acctbal_sum,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql THEN 1 ELSE 0 END) AS BIGINT) AS quarterly_balance_sheet_q_n_orders
      |  FROM j GROUP BY symbol
      |), fb AS (
      |  SELECT ${Bars.sqlSymbolFor("c_custkey")} AS symbol,
      |         CAST(sum(CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS balance_sheet_assets,
      |         CAST(sum(CASE WHEN c_acctbal < 0 THEN -CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS balance_sheet_liabilities,
      |         count(*) AS balance_sheet_n_accounts,
      |         count(DISTINCT c_mktsegment) AS insider_roster_holders_n_segments,
      |         max(c_acctbal) AS insider_roster_holders_max_acctbal
      |  FROM customer GROUP BY 1
      |), fc AS (
      |  SELECT ${Bars.sqlSymbolFor("o_custkey")} AS symbol,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cashflow_inflow,
      |         max(o_totalprice) AS cashflow_max_order,
      |         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cashflow_n_open,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS quarterly_income_stmt_q_revenue,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql THEN 1 ELSE 0 END) AS BIGINT) AS quarterly_income_stmt_q_n_orders,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql AND o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS quarterly_cashflow_q_inflow,
      |         CAST(sum(CASE WHEN o_orderdate >= $qSql AND o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS quarterly_cashflow_q_n_open,
      |         strftime(min(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S') AS earnings_dates_first_open,
      |         strftime(max(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S') AS earnings_dates_last_open,
      |         count(DISTINCT year(o_orderdate)) AS earnings_dates_n_years,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS insider_purchases_finished_rev,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS insider_purchases_n_finished
      |  FROM orders GROUP BY 1
      |), fl AS (
      |  SELECT ${Bars.sqlSymbolFor("l_suppkey")} AS symbol,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS shares_volume,
      |         count(*) AS shares_n_lines,
      |         CAST(sum(CAST(l_discount AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS actions_action_sum,
      |         CAST(sum(CASE WHEN l_discount > 0 OR l_tax > 0 THEN 1 ELSE 0 END) AS BIGINT) AS actions_n_actions,
      |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS dividends_dividend_sum,
      |         CAST(sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dividends_n_discounted,
      |         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS splits_split_sum,
      |         max(l_tax) AS splits_max_tax
      |  FROM lineitem GROUP BY 1
      |), fh AS (
      |  SELECT ${Bars.sqlSymbolFor("s_suppkey")} AS symbol,
      |         count(*) AS major_holders_n_suppliers,
      |         CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS major_holders_acctbal,
      |         max(s_acctbal) AS institutional_holders_max_acctbal,
      |         min(s_acctbal) AS institutional_holders_min_acctbal,
      |         count(DISTINCT s_nationkey) AS mutualfund_holders_n_nations,
      |         CAST(sum(CASE WHEN s_acctbal > 0 THEN CAST(s_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS mutualfund_holders_acctbal_pos
      |  FROM supplier GROUP BY 1
      |), fp AS (
      |  SELECT ${Bars.sqlSymbolFor("p_partkey")} AS symbol,
      |         count(*) AS recommendations_n_parts,
      |         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS recommendations_avg_retail,
      |         CAST(min(p_size) AS BIGINT) AS recommendations_summary_min_size,
      |         CAST(max(p_size) AS BIGINT) AS recommendations_summary_max_size,
      |         count(DISTINCT p_brand) AS recommendations_summary_n_brands
      |  FROM part GROUP BY 1
      |), fe AS (
      |  SELECT ${Bars.sqlSymbolFor("user_id")} AS symbol,
      |         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS upgrades_downgrades_n_upgrades,
      |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS upgrades_downgrades_n_downgrades
      |  FROM events GROUP BY 1
      |), f AS (
      |  SELECT f0.*,
      |         balance_sheet_assets, balance_sheet_liabilities, balance_sheet_n_accounts,
      |         insider_roster_holders_n_segments, insider_roster_holders_max_acctbal,
      |         cashflow_inflow, cashflow_max_order, cashflow_n_open,
      |         quarterly_income_stmt_q_revenue, quarterly_income_stmt_q_n_orders,
      |         quarterly_cashflow_q_inflow, quarterly_cashflow_q_n_open,
      |         earnings_dates_first_open, earnings_dates_last_open, earnings_dates_n_years,
      |         insider_purchases_finished_rev, insider_purchases_n_finished,
      |         shares_volume, shares_n_lines,
      |         actions_action_sum, actions_n_actions,
      |         dividends_dividend_sum, dividends_n_discounted,
      |         splits_split_sum, splits_max_tax,
      |         major_holders_n_suppliers, major_holders_acctbal,
      |         institutional_holders_max_acctbal, institutional_holders_min_acctbal,
      |         mutualfund_holders_n_nations, mutualfund_holders_acctbal_pos,
      |         recommendations_n_parts, recommendations_avg_retail,
      |         recommendations_summary_min_size, recommendations_summary_max_size,
      |         recommendations_summary_n_brands,
      |         upgrades_downgrades_n_upgrades, upgrades_downgrades_n_downgrades
      |  FROM f0
      |  JOIN fb USING (symbol) JOIN fc USING (symbol) JOIN fl USING (symbol)
      |  JOIN fh USING (symbol) JOIN fp USING (symbol) JOIN fe USING (symbol)
      |)""".stripMargin

  // every numeric field of the long format; doubles and counts unify to
  // DOUBLE exactly like the reference's wide-JSON-to-series unpivot
  private val longFields = Seq(
    "income_stmt_revenue", "income_stmt_n_orders", "income_stmt_n_customers",
    "insider_transactions_acctbal_sum",
    "quarterly_balance_sheet_q_acctbal_sum", "quarterly_balance_sheet_q_n_orders",
    "balance_sheet_assets", "balance_sheet_liabilities", "balance_sheet_n_accounts",
    "insider_roster_holders_n_segments", "insider_roster_holders_max_acctbal",
    "cashflow_inflow", "cashflow_max_order", "cashflow_n_open",
    "quarterly_income_stmt_q_revenue", "quarterly_income_stmt_q_n_orders",
    "quarterly_cashflow_q_inflow", "quarterly_cashflow_q_n_open",
    "earnings_dates_n_years",
    "insider_purchases_finished_rev", "insider_purchases_n_finished",
    "shares_volume", "shares_n_lines",
    "actions_action_sum", "actions_n_actions",
    "dividends_dividend_sum", "dividends_n_discounted",
    "splits_split_sum", "splits_max_tax",
    "major_holders_n_suppliers", "major_holders_acctbal",
    "institutional_holders_max_acctbal", "institutional_holders_min_acctbal",
    "mutualfund_holders_n_nations", "mutualfund_holders_acctbal_pos",
    "recommendations_n_parts", "recommendations_avg_retail",
    "recommendations_summary_min_size", "recommendations_summary_max_size",
    "recommendations_summary_n_brands",
    "upgrades_downgrades_n_upgrades", "upgrades_downgrades_n_downgrades")

  /** Flat f1 column list: every flattened field, doubles rounded to 6dp
    * (Q.norm mirrors on the Spark side). Shared by the f1 oracle below.
    */
  private val flatCols: String = {
    val strings = Set(
      "insider_transactions_first_order", "insider_transactions_last_order",
      "earnings_dates_first_open", "earnings_dates_last_open")
    val ints = Set(
      "income_stmt_n_orders", "income_stmt_n_customers",
      "quarterly_balance_sheet_q_n_orders", "balance_sheet_n_accounts",
      "insider_roster_holders_n_segments",
      "cashflow_n_open", "quarterly_income_stmt_q_n_orders",
      "quarterly_cashflow_q_n_open", "earnings_dates_n_years",
      "insider_purchases_n_finished",
      "shares_n_lines", "actions_n_actions", "dividends_n_discounted",
      "major_holders_n_suppliers",
      "mutualfund_holders_n_nations", "recommendations_n_parts",
      "recommendations_summary_min_size", "recommendations_summary_max_size",
      "recommendations_summary_n_brands",
      "upgrades_downgrades_n_upgrades", "upgrades_downgrades_n_downgrades")
    val ordered = Seq(
      "income_stmt_revenue", "income_stmt_n_orders", "income_stmt_n_customers",
      "insider_transactions_first_order", "insider_transactions_last_order",
      "insider_transactions_acctbal_sum",
      "quarterly_balance_sheet_q_acctbal_sum", "quarterly_balance_sheet_q_n_orders",
      "balance_sheet_assets", "balance_sheet_liabilities", "balance_sheet_n_accounts",
      "insider_roster_holders_n_segments", "insider_roster_holders_max_acctbal",
      "cashflow_inflow", "cashflow_max_order", "cashflow_n_open",
      "quarterly_income_stmt_q_revenue", "quarterly_income_stmt_q_n_orders",
      "quarterly_cashflow_q_inflow", "quarterly_cashflow_q_n_open",
      "earnings_dates_first_open", "earnings_dates_last_open", "earnings_dates_n_years",
      "insider_purchases_finished_rev", "insider_purchases_n_finished",
      "shares_volume", "shares_n_lines",
      "actions_action_sum", "actions_n_actions",
      "dividends_dividend_sum", "dividends_n_discounted",
      "splits_split_sum", "splits_max_tax",
      "major_holders_n_suppliers", "major_holders_acctbal",
      "institutional_holders_max_acctbal", "institutional_holders_min_acctbal",
      "mutualfund_holders_n_nations", "mutualfund_holders_acctbal_pos",
      "recommendations_n_parts", "recommendations_avg_retail",
      "recommendations_summary_min_size", "recommendations_summary_max_size",
      "recommendations_summary_n_brands",
      "upgrades_downgrades_n_upgrades", "upgrades_downgrades_n_downgrades")
    ordered.map { f =>
      if (strings.contains(f) || ints.contains(f)) f
      else s"round($f, 6) AS $f"
    }.mkString(",\n       ")
  }

  def queries: Seq[Q] = Seq(

    // S4+P3: nested fundamentals flattened to parent_key_child columns —
    // all 20 reference datasets incl. the quarterly_* variant axis.
    Q("f1_fundamentals_flat",
      s"""WITH $nestedCte
         |SELECT symbol, $flatCols
         |FROM f ORDER BY symbol""".stripMargin) {
      (s, dir) =>
        Q.norm(Flatten(nested(s, dir)), "symbol")
    },

    // §1.1 long-format fundamentals: (symbol, field, value) via unpivot.
    Q("f2_fundamentals_long",
      s"""WITH $nestedCte,
         |u AS (
         |  ${longFields.map(f =>
              s"SELECT symbol, '$f' AS field, CAST($f AS DOUBLE) AS value FROM f")
              .mkString("\n  UNION ALL ")}
         |)
         |SELECT symbol, field, round(value, 6) AS value
         |FROM u ORDER BY symbol, field""".stripMargin) {
      (s, dir) => {
        val flat = Flatten(nested(s, dir))
        val stacked = flat.select(col("symbol"),
          expr(s"stack(${longFields.size}, " +
            longFields.map(f => s"'$f', CAST($f AS DOUBLE)").mkString(", ") +
            ") AS (field, value)"))
        Q.norm(stacked, "symbol", "field")
      }
    })
}
