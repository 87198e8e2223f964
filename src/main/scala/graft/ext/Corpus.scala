package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data curation: per-document
  * TF-IDF keyword extraction and source-mixture temperature weighting.
  *
  * Cross-engine determinism notes (these queries are oracle-checked
  * cell-exact against DuckDB):
  *   - TF-IDF *ranking* uses the rational key `tf * N / df` — products
  *     and quotients of integers are correctly rounded in IEEE 754, so
  *     both engines compute bit-identical keys and break the remaining
  *     ties identically (term asc). The conventional log-scaled score is
  *     still *reported* (rounded 6dp) but never drives row selection,
  *     because `ln` is not correctly rounded and two mathematically-equal
  *     scores (e.g. 2*ln(N/a) = ln(N/b) when b = a²/N) could order
  *     differently across engines.
  *   - Mixture weights sum `sqrt(count)` terms (sqrt IS correctly
  *     rounded) in an explicitly sorted fold, so the denominator is the
  *     same double in both engines regardless of aggregation order.
  *
  * Scale design (100 TB): term frequencies and document frequencies ride
  * one hash exchange on `term`; the per-doc top-k is a bounded window on
  * the doc_id exchange. The mixture query aggregates to O(#sources) rows
  * (bounded, here 20) before any non-linear math — the fold runs over a
  * source-count array, never over rows.
  */
object Corpus {
  import Portable._

  /** Top terms reported per document. */
  val TopK = 3

  /** Temperature exponent for source mixture weights (alpha = 0.5). */
  // sqrt(x) == x^0.5: spelled as sqrt so both engines use the
  // correctly-rounded primitive, not a pow() approximation.

  def queries: Seq[Q] = Seq(

    // Per-document top-3 terms by TF-IDF.
    Q("x_tfidf",
      s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
         |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT doc_id, term, tf, df,
         |                  row_number() OVER (PARTITION BY doc_id
         |                                     ORDER BY tf * n.n * 1.0 / df DESC, term) AS rnk,
         |                  tf * ln(n.n * 1.0 / df) AS score
         |           FROM tfc JOIN dfc USING (term), n)
         |SELECT doc_id, rnk, term, tf, df, round(score, 6) AS score
         |FROM scored WHERE rnk <= $TopK
         |ORDER BY doc_id, rnk""".stripMargin) {
      (s, dir) => {
        val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
        val tfc = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // tfc is already distinct per (doc, term): df = plain count.
        // groupBy(term) + join-back share the `term` hash exchange.
        val dfc = tfc.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy((col("tf") * col("n") * 1.0 / col("df")).desc, col("term"))
        Q.norm(
          tfc.join(dfc, Seq("term"))
            .crossJoin(broadcast(n))
            .withColumn("rnk", row_number().over(w).cast("long"))
            .where(col("rnk") <= TopK)
            .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
              (col("tf") * log(col("n") * 1.0 / col("df"))).as("score")),
          "doc_id", "rnk")
      }
    },

    // Source-mixture temperature weights (alpha = 0.5 reweighting).
    Q("x_mixture",
      s"""WITH s AS (SELECT source, count(*) AS n_docs,
         |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY source),
         |d AS (SELECT list_reduce(
         |               list_transform(list_sort(list(struct_pack(src := source, w := sqrt(n_docs)))),
         |                              x -> x.w),
         |               (a, b) -> a + b) AS denom,
         |             sum(n_docs) AS total_docs
         |      FROM s)
         |SELECT source, n_docs, n_tokens,
         |       round(sqrt(n_docs) / d.denom, 6) AS weight,
         |       round(d.total_docs * sqrt(n_docs) / d.denom, 6) AS expected_docs
         |FROM s, d ORDER BY source""".stripMargin) {
      (s, dir) => {
        val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
        val src = docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
        // denominator: sorted fold -> order-independent identical double
        val d = src.agg(
          aggregate(
            transform(array_sort(collect_list(struct(col("source").as("src"), sqrt(col("n_docs")).as("w")))),
              x => x.getField("w")),
            lit(0.0), (acc, v) => acc + v).as("denom"),
          sum(col("n_docs")).as("total_docs"))
        Q.norm(
          src.crossJoin(broadcast(d))
            .select(col("source"), col("n_docs"), col("n_tokens"),
              (sqrt(col("n_docs")) / col("denom")).as("weight"),
              (col("total_docs") * sqrt(col("n_docs")) / col("denom")).as("expected_docs")),
          "source")
      }
    })
}
