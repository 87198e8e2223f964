package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style repetition filters over `documents` — the standard
  * text-quality gates a training-data sweep runs before dedup (Rae et
  * al. 2021 "Scaling Language Models" §A1.1 quality heuristics; C4's
  * repetition rules are the same family). The synthetic corpus is
  * single-line word text, so the metrics are token-level (the
  * newline-level variants degenerate to 1 line):
  *
  *   - `dup_token_frac`   — 1 − distinct/total tokens (type-token ratio
  *     complement): boilerplate and keyword-stuffed pages score high.
  *   - `top_token_frac`   — share of the single most frequent token.
  *   - `top_bigram_frac`  — share of the most frequent adjacent bigram
  *     (per-token share: maxcount/(n−1)), the classic "same phrase
  *     repeated" detector.
  *
  * Scale design: every metric is per-row Column algebra over the token
  * array — one narrow scan, NO shuffle, no explode→groupBy round trip.
  * The per-row cost is O(distinct·n) lambda evaluations, bounded by
  * document length (web documents are KBs — the constant is small and
  * the work is embarrassingly parallel across rows). A giant-outlier-doc
  * guard at 100 TB is a byte-length cap upstream (`n_chars` predicate,
  * pushed to the parquet scan), not a different algorithm.
  */
object Repetition {
  import Portable._

  /** count of the most frequent element of `xs` (0 for empty) — the
    * [[graft.functions.TopCount]] kernel (one O(n) hashmap pass; the HOF
    * form was O(distinct*n) interpreted lambdas and the slowest
    * projection in the whole bench). */
  private def topCount(xs: Column): Column =
    graft.functions.ArrayOps.topCount(xs)
  private def sqlTopCount(xs: String): String =
    s"coalesce(list_max(list_transform(list_distinct($xs), t -> len(list_filter($xs, x -> x = t)))), 0)"

  /** adjacent (non-distinct) bigrams of a token array. NB `sequence(1,0)`
    * in Spark is DESCENDING `[1,0]`, not empty — short arrays need the
    * explicit guard. */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  private def sqlBigrams(toks: String): String =
    s"list_transform(range(1, greatest(len($toks), 1)), i -> array_to_string(($toks)[i:i+1], ' '))"

  def queries: Seq[Q] = Seq(
    Q("x_repetition",
      s"""WITH t AS (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
         |b AS (SELECT doc_id, toks, ${sqlBigrams("toks")} AS bg FROM t),
         |f AS (SELECT doc_id, len(toks) AS n,
         |             len(list_distinct(toks)) AS nd,
         |             ${sqlTopCount("toks")} AS topt,
         |             ${sqlTopCount("bg")} AS topb
         |      FROM b)
         |SELECT doc_id, n AS n_tokens,
         |       round(1.0 - nd * 1.0 / n, 6) AS dup_token_frac,
         |       round(topt * 1.0 / n, 6) AS top_token_frac,
         |       CASE WHEN n >= 2 THEN round(topb * 1.0 / (n - 1), 6) END AS top_bigram_frac
         |FROM f ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val t = Portable.spread(Tables.documents(s, dir), "doc_id")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        val b = t.select(col("doc_id"), col("toks"), bigrams(col("toks")).as("bg"))
        val f = b.select(col("doc_id"),
          size(col("toks")).as("n"),
          size(array_distinct(col("toks"))).as("nd"),
          topCount(col("toks")).as("topt"),
          topCount(col("bg")).as("topb"))
        f.select(col("doc_id"), col("n").cast("long").as("n_tokens"),
            graft.Q.r6(lit(1.0) - col("nd") * 1.0 / col("n")).as("dup_token_frac"),
            graft.Q.r6(col("topt") * 1.0 / col("n")).as("top_token_frac"),
            when(col("n") >= 2, graft.Q.r6(col("topb") * 1.0 / (col("n") - 1)))
              .as("top_bigram_frac"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    })
}
