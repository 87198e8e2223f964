package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the driver-generated star schema
  * (TESTDATA.md). All engine queries read through here so the scan
  * options stay in one place.
  *
  * Scale note: `spark.read.parquet` gives splittable columnar scans with
  * predicate pushdown + column pruning; at 100 TB the same call reads a
  * partitioned directory tree and Catalyst prunes partitions — nothing
  * here needs to change.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as raw nanos (`nanosAsLong`) and floor-convert to
    * microseconds with exact integer division (`DIV`, not fp division:
    * 2024 epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range). DuckDB
    * performs the identical ns->us truncation on read, keeping the oracle
    * aligned.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      // driver testdata: TIMESTAMP(NANOS) surfaced as a long under the conf
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      // re-written layouts (ScaleUp sf rungs) carry plain micros timestamps
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
