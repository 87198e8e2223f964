package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, round}
import org.apache.spark.sql.types.DoubleType

/** One named engine query: the Spark plan builder plus (when ANSI-SQL
  * expressible) its DuckDB oracle. `SparkEntry` assembles these into the
  * driver-contract maps.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)

  /** Output normalization applied by every query on the Spark side (the
    * oracle SQL mirrors it): round all doubles to 6 dp, deterministic row
    * order by `keys`. Keeps the driver's hash compare stable across
    * engines and shuffle orders.
    */
  def norm(df: DataFrame, keys: String*): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), 6).as(f.name) else col(f.name)
    }
    sorted(df.select(cols.toSeq: _*), keys: _*)
  }

  /** Deterministic total order for the output dump WITHOUT `orderBy`:
    * global `orderBy` plans a RangePartitioning exchange whose bounds
    * sampling RE-EXECUTES the entire upstream plan — every query paid
    * ~2x its own cost for a sort that exists only so the DuckDB compare
    * is order-stable. One shuffled partition + an in-partition sort gives
    * the same total order in one pass; verification outputs are dump-
    * sized, so the single reducer is irrelevant. (A production sink
    * would keep the natural partitioning and skip the sort entirely.)
    */
  def sorted(df: DataFrame, keys: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(keys.map(col): _*)
}
