package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** BM25 parameters (Robertson/Okapi defaults) and the fixed query-term
    * set (drawn from the synthetic corpus vocabulary).
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 5
  val Bm25Terms: Seq[String] = Seq("hash", "merge", "scan")

  /** Tokens per packed training block (x_pack). */
  val PackBlock = 256

  /** Vocabulary head size reported by x_zipf. */
  val ZipfTopK = 20

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
    },

    // BM25 retrieval scoring over the corpus for a fixed query-term set —
    // the lexical-retrieval half of a data-curation stack (quality
    // filtering against seed queries, CC-style "closest to Wikipedia"
    // selection). Ranking is driven by the log-free key
    //   tf*(k1+1) / (tf + k1*(1-b + b*dl*N/total))
    // (products/quotients of integers and exactly-representable constants
    // — every step a single correctly-rounded IEEE op, so both engines
    // produce the identical double and break residual ties by doc_id).
    // idf = ln((N-df+0.5)/(df+0.5)+1) is constant within a term, so it
    // can scale the REPORTED score (rounded 6dp) without ever affecting
    // selection — the same discipline as x_tfidf.
    //
    // Scale: tf is one hash agg on (doc, term) pre-filtered to the query
    // terms (predicate pushes to the scan side of the explode), df and
    // the corpus length stats aggregate to O(#terms) / O(1) rows and
    // broadcast back; the top-k window partitions by term.
    Q("x_bm25",
      s"""WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS total FROM dl),
         |tf AS (SELECT doc_id, term, count(*) AS tf
         |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
         |       WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
         |       GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT term, doc_id, tf, dl,
         |         tf * ${Bm25K1 + 1} / (tf + $Bm25K1 * (${1 - Bm25B} + $Bm25B * dl * n / total)) AS rank_key,
         |         ln((n - df + 0.5) / (df + 0.5) + 1) AS idf
         |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY term ORDER BY rank_key DESC, doc_id) AS rk
         |           FROM scored)
         |SELECT term, rk, doc_id, tf, dl, round(idf * rank_key, 6) AS bm25
         |FROM ranked WHERE rk <= $Bm25TopK ORDER BY term, rk""".stripMargin) {
      (s, dir) => {
        val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
        val dl = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
        val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
        val tf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .where(col("term").isin(Bm25Terms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        // operator order mirrors the SQL text exactly: left-assoc products
        // before the divide, so every intermediate double matches
        val rankKey = col("tf") * lit(Bm25K1 + 1) /
          (col("tf") + lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl") * col("n") / col("total")))
        val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1))
        val w = Window.partitionBy("term").orderBy(col("rank_key").desc, col("doc_id"))
        Q.norm(
          tf.join(dl, Seq("doc_id")).join(broadcast(df), Seq("term"))
            .crossJoin(broadcast(st))
            .select(col("term"), col("doc_id"), col("tf"), col("dl"),
              rankKey.as("rank_key"), idf.as("idf"))
            .withColumn("rk", row_number().over(w).cast("long"))
            .where(col("rk") <= Bm25TopK)
            .select(col("term"), col("rk"), col("doc_id"), col("tf"), col("dl"),
              (col("idf") * col("rank_key")).as("bm25")),
          "term", "rk")
      }
    },

    // GPT-style sequence packing: concatenate every document's tokens in
    // doc_id order and cut the stream into fixed $PackBlock-token training
    // blocks; emit one row per (block, contributing doc) with the token
    // count the doc contributes — the concat-and-chunk packing layout
    // every autoregressive training pipeline materializes.
    //
    // The global token offset is THE textbook distributed prefix sum, and
    // the plan computes it that way instead of a single-partition window:
    // range-repartition on doc_id, per-partition running sums (32 windows
    // in parallel), then O(#partitions) per-partition totals fold into
    // exclusive base offsets on the driver (same O(partitions) driver
    // state as EwmaScan) and broadcast-join back. Block math after that is
    // pure integer per-row algebra: doc spans blocks floor(off/B) ..
    // floor((off+n-1)/B), each overlap length an integer min/max.
    Q("x_pack",
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
         |o AS (SELECT doc_id, n_tok,
         |             COALESCE(CAST(sum(n_tok) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
         |      FROM t),
         |b AS (SELECT doc_id, n_tok, off,
         |             unnest(range(off // $PackBlock, (off + n_tok - 1) // $PackBlock + 1)) AS block_id
         |      FROM o WHERE n_tok > 0)
         |SELECT block_id, doc_id,
         |       least(off + n_tok, (block_id + 1) * $PackBlock)
         |         - greatest(off, block_id * $PackBlock) AS n_tok_in_block,
         |       CAST(CASE WHEN off >= block_id * $PackBlock THEN 1 ELSE 0 END AS BIGINT) AS is_head
         |FROM b ORDER BY block_id, doc_id""".stripMargin) {
      (s, dir) => packedBlocks(s, dir)
    },

    // Vocabulary head: top terms by corpus frequency with rank and exact
    // cumulative share — the Zipf curve a corpus-QA sweep reads to spot
    // boilerplate explosions and tokenizer pathologies. Term counts ride
    // one hash agg (map-side partial) down to vocabulary size; the rank
    // window and cumulative sum then run on vocab-sized data (≪ corpus),
    // with integer cumsums and a single correctly-rounded division per
    // reported share.
    Q("x_zipf",
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |f AS (SELECT term, count(*) AS freq FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f),
         |r AS (SELECT term, freq,
         |             row_number() OVER (ORDER BY freq DESC, term) AS rank,
         |             CAST(sum(freq) OVER (ORDER BY freq DESC, term
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumfreq
         |      FROM f)
         |SELECT rank, term, freq,
         |       round(freq * 1.0 / total, 6) AS share,
         |       round(cumfreq * 1.0 / total, 6) AS cum_share
         |FROM r, tot WHERE rank <= $ZipfTopK ORDER BY rank""".stripMargin) {
      (s, dir) => {
        val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
        val f = docs.select(explode(tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("freq"))
        val tot = f.agg(sum(col("freq")).as("total"))
        // vocab-sized global window: input is the aggregated term table
        val w = Window.orderBy(col("freq").desc, col("term"))
        Q.norm(
          f.withColumn("rank", row_number().over(w).cast("long"))
            .withColumn("cumfreq", sum(col("freq")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .where(col("rank") <= ZipfTopK)
            .crossJoin(broadcast(tot))
            .select(col("rank"), col("term"), col("freq"),
              (col("freq") * lit(1.0) / col("total")).as("share"),
              (col("cumfreq") * lit(1.0) / col("total")).as("cum_share")),
          "rank")
      }
    })

  /** x_pack's Spark plan (factored out so specs can pin the plan shape and
    * property-test the block invariants).
    *
    * Driver state is O(#partitions): the per-partition token totals that
    * seed the exclusive base offsets — the same two-phase scan-then-fold
    * layout as [[graft.functions.EwmaScan]].
    */
  def packedBlocks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nParts = 32
    val t0 = Tables.documents(s, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
    // DETERMINISTIC range buckets from the doc_id key space, NOT
    // repartitionByRange: range partitioning samples its boundaries with
    // a nondeterministic seed, and this plan executes twice (once for the
    // per-partition totals, once for the final output) — at sf1 the two
    // executions drew different boundaries and the base offsets were
    // computed for partitions that no longer existed (3 rows off vs the
    // oracle; caught by the scale rung). Fixed key-space spans make both
    // executions see identical buckets; balance only matters for speed,
    // and doc_ids are dense here.
    val head = t0.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (head.getLong(0), head.getLong(1))
    val span = (hi - lo) / nParts + 1
    val t = t0.withColumn("pid", expr(s"int((doc_id - $lo) div $span)"))
    // phase 1: per-partition running sums, all partitions in parallel
    val wPart = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = t.withColumn("run", sum(col("n_tok")).over(wPart))
    // phase 2: fold O(#partitions) totals into exclusive base offsets
    val totals = local.groupBy("pid").agg(max(col("run")).as("ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).map { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val baseDf = bases.toDF("pid", "base")
    val o = local.join(broadcast(baseDf), Seq("pid"))
      .select(col("doc_id"), col("n_tok"),
        (col("base") + col("run") - col("n_tok")).as("off"))
      .where(col("n_tok") > 0)
    val b = o.select(col("doc_id"), col("n_tok"), col("off"),
      explode(sequence(expr(s"off div $PackBlock"),
        expr(s"(off + n_tok - 1) div $PackBlock"))).as("block_id"))
    Q.norm(
      b.select(col("block_id"), col("doc_id"),
        (least(col("off") + col("n_tok"), (col("block_id") + 1) * PackBlock)
          - greatest(col("off"), col("block_id") * PackBlock)).as("n_tok_in_block"),
        when(col("off") >= col("block_id") * PackBlock, 1L).otherwise(0L).as("is_head")),
      "block_id", "doc_id")
  }
}
