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
  * The reference fetches ~20 yfinance datasets per ticker
  * (`yahoo_finance_producer.py:26-50`: income_stmt, balance_sheet,
  * cashflow, holders, actions, shares, recommendations, ...). This models
  * the same shape over the star schema: TWELVE nested datasets per symbol,
  * each aggregated from its own source table, joined on symbol; f1
  * flattens them with [[Flatten]] (P3), f2 unpivots to the long
  * `(symbol, field, value)` shape (§1.1's exploded fundamentals mapping).
  *
  * Scale/determinism notes:
  *   - Each dataset is ONE hash aggregation (map-side partial agg) over
  *     its own table; the per-symbol results are 3 rows each, so the
  *     final assembly joins are broadcast-trivial at any scale. Symbol
  *     derivation happens per-row BEFORE the agg (native key cardinality
  *     only matters inside the partial agg, which combines map-side).
  *   - Money sums go through DECIMAL(18,2): exact, order-independent —
  *     a double SUM across a shuffle has nondeterministic accumulation
  *     order and would flap against the oracle.
  *   - Timestamps normalize to UTC strings (P1) exactly like the
  *     reference's `convert_timestamps` (`yahoo_finance_producer.py:53-69`).
  */
object Fundamentals {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Nested per-symbol fundamentals: twelve datasets, one struct each. */
  def nested(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderstatus"))
    val joined = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("symbol", Bars.symbolFor(col("c_custkey")))

    // income_stmt + activity: the orders x customer join (reference
    // income_stmt / insider_transactions analogs)
    val incomeActivity = joined.groupBy("symbol").agg(
      struct(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers")).as("income"),
      struct(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("first_order"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("last_order"),
        sum(dec(col("c_acctbal"))).cast("double").as("acctbal_sum")).as("activity"))

    // balance_sheet: customer account balances split by sign
    val balance = Tables.customer(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("c_custkey")))
      .groupBy("symbol").agg(
        struct(
          sum(when(col("c_acctbal") > 0, dec(col("c_acctbal")))
            .otherwise(dec(lit(0)))).cast("double").as("assets"),
          sum(when(col("c_acctbal") < 0, -dec(col("c_acctbal")))
            .otherwise(dec(lit(0)))).cast("double").as("liabilities"),
          count(lit(1)).as("n_accounts")).as("balance_sheet"))

    // cashflow + earnings + calendar: three datasets off ONE orders agg
    // pass (reference cashflow / earnings / calendar analogs) — widening
    // the dataset surface costs extra columns, not extra scans or joins
    val cashflow = Tables.orders(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("o_custkey")))
      .groupBy("symbol").agg(
        struct(
          sum(dec(col("o_totalprice"))).cast("double").as("inflow"),
          max(col("o_totalprice")).as("max_order"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"))
          .as("cashflow"),
        struct(
          sum(when(year(col("o_orderdate")) < 2000, dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("rev_pre2000"),
          sum(when(year(col("o_orderdate")) >= 2000, dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("rev_post2000"),
          countDistinct(year(col("o_orderdate"))).as("n_years")).as("earnings"),
        struct(
          date_format(min(when(col("o_orderstatus") === "O", col("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("first_open"),
          date_format(max(when(col("o_orderstatus") === "O", col("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("last_open")).as("calendar"))

    // shares + actions: lineitem volumes and discount/tax flows
    // (reference shares / actions-dividends-splits analogs)
    val li = Tables.lineitem(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("l_suppkey")))
    val sharesActions = li.groupBy("symbol").agg(
      struct(
        sum(dec(col("l_quantity"))).cast("double").as("volume"),
        count(lit(1)).as("n_lines")).as("shares"),
      struct(
        sum(dec(col("l_discount"))).cast("double").as("dividends"),
        sum(dec(col("l_tax"))).cast("double").as("splits")).as("actions"))

    // holders + inst_holders: supplier side, one agg pass (reference
    // major/institutional holders)
    val holders = Tables.supplier(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("s_suppkey")))
      .groupBy("symbol").agg(
        struct(
          count(lit(1)).as("n_suppliers"),
          sum(dec(col("s_acctbal"))).cast("double").as("acctbal")).as("holders"),
        struct(
          max(col("s_acctbal")).as("max_acctbal"),
          min(col("s_acctbal")).as("min_acctbal")).as("inst_holders"))

    // recommendations + catalog: part stats, one agg pass (reference
    // recommendations / sustainability analogs)
    val recs = Tables.part(spark, dir)
      .withColumn("symbol", Bars.symbolFor(col("p_partkey")))
      .groupBy("symbol").agg(
        struct(
          count(lit(1)).as("n_parts"),
          (sum(dec(col("p_retailprice"))).cast("double") / count(lit(1)))
            .as("avg_retail")).as("recommendations"),
        struct(
          min(col("p_size")).cast("long").as("min_size"),
          max(col("p_size")).cast("long").as("max_size"),
          countDistinct(col("p_brand")).as("n_brands")).as("catalog"))

    incomeActivity
      .join(balance, Seq("symbol"))
      .join(cashflow, Seq("symbol"))
      .join(sharesActions, Seq("symbol"))
      .join(holders, Seq("symbol"))
      .join(recs, Seq("symbol"))
  }

  private val nestedCte =
    s"""j AS (
      |  SELECT ${Bars.sqlSymbolFor("c_custkey")} AS symbol,
      |         o_totalprice, o_orderdate, o_custkey, c_acctbal
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), f0 AS (
      |  SELECT symbol,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS income_revenue,
      |         count(*) AS income_n_orders,
      |         count(DISTINCT o_custkey) AS income_n_customers,
      |         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS activity_first_order,
      |         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS activity_last_order,
      |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS activity_acctbal_sum
      |  FROM j GROUP BY symbol
      |), fb AS (
      |  SELECT ${Bars.sqlSymbolFor("c_custkey")} AS symbol,
      |         CAST(sum(CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS balance_sheet_assets,
      |         CAST(sum(CASE WHEN c_acctbal < 0 THEN -CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS balance_sheet_liabilities,
      |         count(*) AS balance_sheet_n_accounts
      |  FROM customer GROUP BY 1
      |), fc AS (
      |  SELECT ${Bars.sqlSymbolFor("o_custkey")} AS symbol,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cashflow_inflow,
      |         max(o_totalprice) AS cashflow_max_order,
      |         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cashflow_n_open,
      |         CAST(sum(CASE WHEN year(o_orderdate) < 2000 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS earnings_rev_pre2000,
      |         CAST(sum(CASE WHEN year(o_orderdate) >= 2000 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS earnings_rev_post2000,
      |         count(DISTINCT year(o_orderdate)) AS earnings_n_years,
      |         strftime(min(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S') AS calendar_first_open,
      |         strftime(max(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END), '%Y-%m-%d %H:%M:%S') AS calendar_last_open
      |  FROM orders GROUP BY 1
      |), fl AS (
      |  SELECT ${Bars.sqlSymbolFor("l_suppkey")} AS symbol,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS shares_volume,
      |         count(*) AS shares_n_lines,
      |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS actions_dividends,
      |         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS actions_splits
      |  FROM lineitem GROUP BY 1
      |), fh AS (
      |  SELECT ${Bars.sqlSymbolFor("s_suppkey")} AS symbol,
      |         count(*) AS holders_n_suppliers,
      |         CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS holders_acctbal,
      |         max(s_acctbal) AS inst_holders_max_acctbal,
      |         min(s_acctbal) AS inst_holders_min_acctbal
      |  FROM supplier GROUP BY 1
      |), fp AS (
      |  SELECT ${Bars.sqlSymbolFor("p_partkey")} AS symbol,
      |         count(*) AS recommendations_n_parts,
      |         CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS recommendations_avg_retail,
      |         CAST(min(p_size) AS BIGINT) AS catalog_min_size,
      |         CAST(max(p_size) AS BIGINT) AS catalog_max_size,
      |         count(DISTINCT p_brand) AS catalog_n_brands
      |  FROM part GROUP BY 1
      |), f AS (
      |  SELECT f0.*,
      |         balance_sheet_assets, balance_sheet_liabilities, balance_sheet_n_accounts,
      |         cashflow_inflow, cashflow_max_order, cashflow_n_open,
      |         earnings_rev_pre2000, earnings_rev_post2000, earnings_n_years,
      |         calendar_first_open, calendar_last_open,
      |         shares_volume, shares_n_lines, actions_dividends, actions_splits,
      |         holders_n_suppliers, holders_acctbal,
      |         inst_holders_max_acctbal, inst_holders_min_acctbal,
      |         recommendations_n_parts, recommendations_avg_retail,
      |         catalog_min_size, catalog_max_size, catalog_n_brands
      |  FROM f0
      |  JOIN fb USING (symbol) JOIN fc USING (symbol) JOIN fl USING (symbol)
      |  JOIN fh USING (symbol) JOIN fp USING (symbol)
      |)""".stripMargin

  // every numeric field of the long format; doubles and counts unify to
  // DOUBLE exactly like the reference's wide-JSON-to-series unpivot
  private val longFields = Seq(
    "income_revenue", "income_n_orders", "income_n_customers",
    "activity_acctbal_sum",
    "balance_sheet_assets", "balance_sheet_liabilities", "balance_sheet_n_accounts",
    "cashflow_inflow", "cashflow_max_order", "cashflow_n_open",
    "earnings_rev_pre2000", "earnings_rev_post2000", "earnings_n_years",
    "shares_volume", "shares_n_lines", "actions_dividends", "actions_splits",
    "holders_n_suppliers", "holders_acctbal",
    "inst_holders_max_acctbal", "inst_holders_min_acctbal",
    "recommendations_n_parts", "recommendations_avg_retail",
    "catalog_min_size", "catalog_max_size", "catalog_n_brands")

  def queries: Seq[Q] = Seq(

    // S4+P3: nested fundamentals flattened to parent_key_child columns.
    Q("f1_fundamentals_flat",
      s"""WITH $nestedCte
         |SELECT symbol, round(income_revenue, 6) AS income_revenue, income_n_orders,
         |       income_n_customers, activity_first_order, activity_last_order,
         |       round(activity_acctbal_sum, 6) AS activity_acctbal_sum,
         |       round(balance_sheet_assets, 6) AS balance_sheet_assets,
         |       round(balance_sheet_liabilities, 6) AS balance_sheet_liabilities,
         |       balance_sheet_n_accounts,
         |       round(cashflow_inflow, 6) AS cashflow_inflow,
         |       round(cashflow_max_order, 6) AS cashflow_max_order,
         |       cashflow_n_open,
         |       round(shares_volume, 6) AS shares_volume, shares_n_lines,
         |       round(actions_dividends, 6) AS actions_dividends,
         |       round(actions_splits, 6) AS actions_splits,
         |       round(earnings_rev_pre2000, 6) AS earnings_rev_pre2000,
         |       round(earnings_rev_post2000, 6) AS earnings_rev_post2000,
         |       earnings_n_years, calendar_first_open, calendar_last_open,
         |       holders_n_suppliers, round(holders_acctbal, 6) AS holders_acctbal,
         |       round(inst_holders_max_acctbal, 6) AS inst_holders_max_acctbal,
         |       round(inst_holders_min_acctbal, 6) AS inst_holders_min_acctbal,
         |       recommendations_n_parts,
         |       round(recommendations_avg_retail, 6) AS recommendations_avg_retail,
         |       catalog_min_size, catalog_max_size, catalog_n_brands
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
