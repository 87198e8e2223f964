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
    df.select(cols.toSeq: _*).orderBy(keys.map(col): _*)
  }
}
