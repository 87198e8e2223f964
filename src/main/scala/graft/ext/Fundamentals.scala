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
  * The reference's 20 yfinance datasets become nested structs aggregated
  * from customer x orders (symbol = c_custkey % 3, FIXTURES.md mapping);
  * f1 flattens them with [[Flatten]] (P3), f2 unpivots to the long
  * `(symbol, field, value)` shape (§1.1's exploded fundamentals mapping).
  *
  * Scale/determinism notes:
  *   - The customer->orders join is a broadcast-free shuffle join on
  *     o_custkey; at 100 TB the dimension side (customer) buckets or
  *     broadcasts per AQE. Symbol derivation happens AFTER the join so the
  *     join key keeps its native cardinality (no 3-key skew join).
  *   - Money sums go through DECIMAL(18,2): exact, order-independent —
  *     a double SUM across a shuffle has nondeterministic accumulation
  *     order and would flap against the oracle.
  *   - Timestamps normalize to UTC strings (P1) exactly like the
  *     reference's `convert_timestamps` (`yahoo_finance_producer.py:53-69`).
  */
object Fundamentals {

  /** Nested per-symbol fundamentals: income + activity datasets. */
  def nested(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val joined = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("symbol", Bars.symbolFor(col("c_custkey")))
    joined.groupBy("symbol").agg(
      struct(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers")).as("income"),
      struct(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("first_order"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("last_order"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("acctbal_sum")).as("activity"))
  }

  private val nestedCte =
    s"""j AS (
      |  SELECT ${Bars.sqlSymbolFor("c_custkey")} AS symbol,
      |         o_totalprice, o_orderdate, o_custkey, c_acctbal
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), f AS (
      |  SELECT symbol,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS income_revenue,
      |         count(*) AS income_n_orders,
      |         count(DISTINCT o_custkey) AS income_n_customers,
      |         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS activity_first_order,
      |         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS activity_last_order,
      |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS activity_acctbal_sum
      |  FROM j GROUP BY symbol
      |)""".stripMargin

  def queries: Seq[Q] = Seq(

    // S4+P3: nested fundamentals flattened to parent_key_child columns.
    Q("f1_fundamentals_flat",
      s"""WITH $nestedCte
         |SELECT symbol, round(income_revenue, 6) AS income_revenue, income_n_orders,
         |       income_n_customers, activity_first_order, activity_last_order,
         |       round(activity_acctbal_sum, 6) AS activity_acctbal_sum
         |FROM f ORDER BY symbol""".stripMargin) {
      (s, dir) =>
        Q.norm(Flatten(nested(s, dir)), "symbol")
    },

    // §1.1 long-format fundamentals: (symbol, field, value) via unpivot.
    Q("f2_fundamentals_long",
      s"""WITH $nestedCte,
         |u AS (
         |  SELECT symbol, 'income_revenue' AS field, income_revenue AS value FROM f
         |  UNION ALL SELECT symbol, 'income_n_orders', CAST(income_n_orders AS DOUBLE) FROM f
         |  UNION ALL SELECT symbol, 'income_n_customers', CAST(income_n_customers AS DOUBLE) FROM f
         |  UNION ALL SELECT symbol, 'activity_acctbal_sum', activity_acctbal_sum FROM f
         |)
         |SELECT symbol, field, round(value, 6) AS value
         |FROM u ORDER BY symbol, field""".stripMargin) {
      (s, dir) => {
        val flat = Flatten(nested(s, dir))
        val numeric = Seq("income_revenue", "income_n_orders",
          "income_n_customers", "activity_acctbal_sum")
        val stacked = flat.select(col("symbol"),
          expr(s"stack(${numeric.size}, " +
            numeric.map(f => s"'$f', CAST($f AS DOUBLE)").mkString(", ") +
            ") AS (field, value)"))
        Q.norm(stacked, "symbol", "field")
      }
    })
}
