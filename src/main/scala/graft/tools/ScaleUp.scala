package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes larger scale factors from an existing testdata directory by
  * replicating every table `factor` times with disjoint key spaces — the
  * sf1 scale-proof rung (VERDICT round-2, next-round item 1: "one order of
  * magnitude of measured scaling validates or falsifies every
  * extrapolated scale claim").
  *
  * Replication is designed so the WORKLOAD scales linearly, matching how
  * real corpora grow, instead of degenerating into a duplicate-detection
  * stress test:
  *
  *   - `events`: keys shift per replica; timestamps shift by the table's
  *     whole-minute span, so each replica appends another contiguous block
  *     of history. `user_id` shifts by a multiple of 3, preserving the
  *     `symbols[user_id % 3]` mapping (sources/Bars.scala) — same 3
  *     symbols, 10x the bars per symbol: the "more history" axis.
  *   - TPC-H tables: every FK edge (orders->customer, lineitem->orders/
  *     part/supplier) shifts by the same per-entity constant, so join
  *     selectivity and fan-out are exactly preserved; nation/region stay
  *     fixed (dims every replica shares, as in real star schemas).
  *   - `documents`: every token gets a per-replica suffix for r>0, making
  *     shingle/token sets DISJOINT across replicas. Near-dup structure
  *     within a replica is identical to the original, and no cross-replica
  *     candidate pairs exist — so LSH/index candidate counts grow 10x, not
  *     ~100x (10 mutually-similar copies of each doc would be quadratic in
  *     the band buckets, a different workload than "10x more documents").
  *   - `embeddings`: vectors rotate by r positions. A permutation applied
  *     to BOTH sides of a dot product preserves it bit-for-bit, so every
  *     within-replica similarity/kNN/centroid result replicates exactly,
  *     while cross-replica pairs decorrelate.
  *
  * Output: one plain parquet FILE per table (`dst/<name>.parquet`), the
  * same layout the driver's testdata uses, so `Tables`, `Verify`, `Bench`
  * and the DuckDB oracle harness all work unchanged at the new scale.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/data/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Files.createDirectories(Paths.get(dst))

    def reps(df: DataFrame): DataFrame =
      df.withColumn("r", explode(sequence(lit(0L), lit(factor - 1L))))

    def shift(c: String, by: Long): Column = (col(c) + col("r") * lit(by)).as(c)

    // events: whole-minute time shift keeps re-bar minute boundaries
    // aligned across replicas (each replica is a later block of history)
    val ev = Tables.events(spark, src)
    val Array(spanMin) = ev
      .agg((floor((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))) / 60) + 2).cast("long"))
      .collect().map(_.getLong(0))
    write(dst, "events", reps(ev).select(
      shift("event_id", 1000000000L),
      expr(s"timestampadd(MINUTE, CAST(r * $spanMin AS INT), ts)").as("ts"),
      shift("user_id", 300000L), // multiple of 3: preserves symbolFor(user_id)
      col("event_type"), col("value"), col("props")))

    write(dst, "lineitem", reps(Tables.lineitem(spark, src)).select(
      shift("l_orderkey", 1000000000L), shift("l_partkey", 10000000L),
      shift("l_suppkey", 10000000L), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    write(dst, "orders", reps(Tables.orders(spark, src)).select(
      shift("o_orderkey", 1000000000L), shift("o_custkey", 10000000L),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))

    write(dst, "customer", reps(Tables.customer(spark, src)).select(
      shift("c_custkey", 10000000L), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))

    write(dst, "supplier", reps(Tables.supplier(spark, src)).select(
      shift("s_suppkey", 10000000L), col("s_name"), col("s_nationkey"),
      col("s_acctbal")))

    write(dst, "part", reps(Tables.part(spark, src)).select(
      shift("p_partkey", 10000000L), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))

    // shared dims: copied unscaled
    write(dst, "nation", Tables.nation(spark, src))
    write(dst, "region", Tables.region(spark, src))

    // documents: per-replica token suffix -> cross-replica shingle sets
    // disjoint; n_chars re-derived so quality features stay consistent
    val newText = when(col("r") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "),
        t => concat(t, lit("~"), col("r").cast("string"))), " "))
    write(dst, "documents", reps(Tables.documents(spark, src)).select(
      shift("doc_id", 10000000L), newText.as("text"), col("lang"),
      col("source"), length(newText).cast("long").as("n_chars")))

    // embeddings: rotate by r mod dim (dot-product-preserving
    // permutation; rotating by more than the dimension made slice()
    // throw at factor 100), and negate every element when r div dim is
    // odd — negating BOTH sides of a dot product also preserves it, so
    // within-replica similarity/kNN/centroid structure still replicates
    // exactly while no two replicas share the (rotation, sign) pair for
    // any factor <= 2*dim (128 here): no cross-replica exact duplicates.
    val rotated = expr(
      "concat(slice(embedding, CAST(pmod(r, size(embedding)) AS INT) + 1, " +
        "size(embedding) - CAST(pmod(r, size(embedding)) AS INT)), " +
        "slice(embedding, 1, CAST(pmod(r, size(embedding)) AS INT)))")
    write(dst, "embeddings", reps(Tables.embeddings(spark, src)).select(
      shift("vec_id", 10000000L),
      when(expr("(r div size(embedding)) % 2 = 1"),
        expr("transform(" +
          "concat(slice(embedding, CAST(pmod(r, size(embedding)) AS INT) + 1, " +
            "size(embedding) - CAST(pmod(r, size(embedding)) AS INT)), " +
            "slice(embedding, 1, CAST(pmod(r, size(embedding)) AS INT)))" +
          ", x -> -x)"))
        .otherwise(rotated).as("embedding"),
      col("label")))

    println(s"""{"scaled": "$src -> $dst", "factor": $factor}""")
    spark.stop()
  }

  /** Writes `df` as the single plain file `dst/<name>.parquet` (the
    * driver-testdata layout DuckDB reads directly). Single-file output
    * stays scan-parallel ONLY with many row groups — a first cut wrote
    * one giant row group per file and every events-family query ran its
    * map side on one core (10-30x at sf1 instead of ~linear) — so the
    * writer caps row groups at 1 MB and the Bench/Verify sessions set a
    * split-count floor (`spark.sql.files.minPartitionNum`).
    */
  private def write(dst: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(dst, s".tmp_$name")
    val blockBytes = sys.env.getOrElse("SPARK_GRAFT_ROWGROUP_BYTES",
      (1024 * 1024).toString).toLong
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(tmp.toString)
    val part = Files.list(tmp).filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no parquet part for $name"))
    Files.move(part, Paths.get(dst, s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    deleteRec(tmp)
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(deleteRec(_))
    Files.deleteIfExists(p)
  }
}
