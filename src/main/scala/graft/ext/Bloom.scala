package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filter for benchmark decontamination — the
  * scale rung above `d9_decontaminate`.
  *
  * `d9` broadcasts the exact bench shingle index; that works while the
  * index fits an executor. At 100 TB the bench suite itself can be
  * millions of n-grams, but a Bloom filter of it is a few KB/MB at any
  * size that matters ([[BloomBits]] bits total, ~10 bits/element for
  * ~1% false positives). The corpus stream probes the filter first —
  * per-row bit math, no join — and only the ~matching shingles (true
  * hits + the small FP tail) reach the exact verify join. Blooms have no
  * false negatives, so the final output is IDENTICAL to the exact path;
  * the oracle below is the same SQL as d9's.
  *
  * Engineering constraints honored:
  *   - The filter is BUILT as a Spark aggregation (positions ->
  *     `bit_or` words -> dense array), not driver-side: the bench set
  *     never collects.
  *   - The PROBE is pure Column algebra over a broadcast one-row bits
  *     array — `xxhash64`/shift/AND all codegen; no UDF, no
  *     `might_contain` internal API.
  *   - K hash functions come from `xxhash64(g, i)` — seeding by an extra
  *     literal column, the documented way to derive independent hashes
  *     from one 64-bit primitive.
  */
object Bloom {
  import Portable._

  /** Filter size in bits (power of two; 2048 longs = 16 KiB). Sized for
    * the test corpus; at real scale this is a config: m ≈ 10 bits per
    * bench n-gram keeps FP ~1%. */
  val BloomBits = 131072

  /** Number of hash probes (k ≈ 0.7 * m/n). */
  val BloomHashes = 5

  private def shingledDocs(spark: SparkSession, dir: String): DataFrame =
    Portable.spread(Tables.documents(spark, dir), "doc_id")
      .where(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), shingles3(tokens(col("text"))).as("sh"))

  /** One-row DataFrame with the dense `bits: array<long>` Bloom filter
    * over column `g` of `keys`. Aggregation shape: explode K positions
    * per key, OR the per-word bits, densify via a map lookup over the
    * full word range (missing words -> 0).
    */
  def build(keys: DataFrame, g: String): DataFrame = {
    val words = BloomBits / 64
    keys
      .select(explode(array((0 until BloomHashes).map(i =>
        pmod(xxhash64(col(g), lit(i)), lit(BloomBits.toLong)).cast("int")): _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("j"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("w"))
      .groupBy("j").agg(expr("bit_or(w)").as("w"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("w")))).as("m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        j => coalesce(element_at(col("m"), j), lit(0L))).as("bits"))
  }

  /** Predicate: all K probe bits for column `g` are set in `bits`. */
  def mightContain(g: String): Column =
    (0 until BloomHashes).map { i =>
      // p duplicated inside the word/bit indices; codegen subexpression
      // elimination collapses the repeated xxhash64
      val p = s"pmod(xxhash64($g, $i), ${BloomBits}L)"
      expr(s"(element_at(bits, CAST($p DIV 64 AS INT) + 1) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT))) != 0")
    }.reduce(_ && _)

  def queries: Seq[Q] = Seq(

    // Same contract (and oracle) as d9 — the bloom pass must be invisible
    // in the output, visible only in the plan (corpus side pre-filtered
    // before the join).
    Q("d11_bloom_decontaminate",
      s"""WITH sh0 AS (SELECT doc_id, ${sqlShingles3(sqlTokens("text"))} AS sh FROM documents),
         |shingled AS (SELECT * FROM sh0 WHERE len(sh) > 0),
         |c AS (SELECT doc_id, unnest(sh) AS g FROM shingled WHERE doc_id % 97 <> 0),
         |b AS (SELECT doc_id, unnest(sh) AS g FROM shingled WHERE doc_id % 97 = 0)
         |SELECT c.doc_id AS doc_id,
         |       count(DISTINCT b.doc_id) AS n_bench_docs,
         |       count(DISTINCT c.g) AS n_shared_shingles
         |FROM c JOIN b ON c.g = b.g
         |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) => {
        val sh = shingledDocs(s, dir)
        val corpus = sh.where(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), explode(col("sh")).as("g"))
        val bench = sh.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
        val bloom = build(bench.select("g").distinct(), "g")
        val candidates = corpus
          .crossJoin(broadcast(bloom)) // one-row bits array
          .where(mightContain("g"))
          .drop("bits")
        Q.norm(
          candidates.join(broadcast(bench), Seq("g")) // exact verify: kills FPs
            .groupBy("doc_id")
            .agg(
              countDistinct(col("bench_id")).as("n_bench_docs"),
              countDistinct(col("g")).as("n_shared_shingles")),
          "doc_id")
      }
    })
}
