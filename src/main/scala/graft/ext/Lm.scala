package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus language-model statistics — the two distributed passes under
  * tokenizer training and LM-based quality filtering, expressed as plain
  * aggregations (beyond-reference LLM-pipeline surface; reference scope
  * ends at per-bar aggregation, flink_processor.py:105-109).
  *
  *  - `x_bpe_pairs`: adjacent-token pair counts, the inner loop of a BPE
  *    tokenizer-training step (the merge candidate is the top count).
  *    One map (array zip, no shuffle) + one count aggregate with
  *    map-side partials + a TakeOrdered top-k — no global sort.
  *  - `x_lm_df`: per-document bigram document-frequency score, the
  *    KenLM/CCNet-style "how much does this doc look like the corpus"
  *    quality signal with exact integer arithmetic: mean corpus df of
  *    the doc's bigrams (per-mille), plus the novelty tail (bigrams
  *    occurring in no other document).
  *
  * Scale shape (x_lm_df): (doc, bigram) pre-aggregation shuffles once on
  * the doc-local pair, the df table is vocabulary-sized (≪ corpus — at
  * 100 TB it broadcasts, today it hash-joins), and the final per-doc
  * roll-up reuses the doc keying. Every aggregate does map-side partial
  * combine; nothing holds per-token state beyond one row.
  */
object Lm {

  /** Exploded (doc_id, a, b) adjacent token pairs. */
  private def pairs(df: org.apache.spark.sql.DataFrame) = {
    val toks = Portable.tokens(col("text"))
    val sz = size(toks)
    df.select(col("doc_id"),
        explode(zip_with(
          slice(toks, lit(1), sz - 1), slice(toks, lit(2), sz - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
  }

  private val sqlPairs =
    """SELECT doc_id, u.z.a AS a, u.z.b AS b
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |       UNNEST(list_zip(toks[1:-2], toks[2:-1])::STRUCT(a VARCHAR, b VARCHAR)[]) u(z)""".stripMargin

  def queries: Seq[Q] = bpeQueries ++ Seq(

    Q("x_bpe_pairs",
      s"""WITH p AS (
         |$sqlPairs)
         |SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
         |FROM p GROUP BY a, b
         |ORDER BY cnt DESC, a, b LIMIT 20""".stripMargin) {
      (s, dir) =>
        pairs(Tables.documents(s, dir))
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(20) // TakeOrderedAndProject: per-partition heaps, no global sort
    },

    Q("x_lm_df",
      s"""WITH p AS (
         |$sqlPairs),
         |db AS (
         |  SELECT doc_id, a || ' ' || b AS bg, CAST(count(*) AS BIGINT) AS c_db
         |  FROM p GROUP BY doc_id, bg),
         |df AS (SELECT bg, CAST(count(*) AS BIGINT) AS df_b FROM db GROUP BY bg)
         |SELECT db.doc_id,
         |       CAST(sum(db.c_db) AS BIGINT) AS n_bigrams,
         |       CAST(sum(db.c_db * df.df_b) AS BIGINT) AS sum_df,
         |       CAST((sum(db.c_db * df.df_b) * 1000) // sum(db.c_db) AS BIGINT)
         |         AS milli_mean_df,
         |       CAST(sum(CASE WHEN df.df_b = 1 THEN db.c_db ELSE 0 END) AS BIGINT)
         |         AS n_novel_bigrams
         |FROM db JOIN df ON db.bg = df.bg
         |GROUP BY db.doc_id
         |ORDER BY db.doc_id""".stripMargin) {
      (s, dir) => {
        // the bigram key stays the (a, b) token PAIR on the Spark side
        // (the oracle's `a || ' ' || b` string is only a display key):
        // tokens never contain spaces, so the pair and the concat are
        // bijective, and grouping/joining on two dictionary-encoded
        // token columns skips materializing n_bigrams concat strings
        // through two exchanges
        // round 16 (guide §2.4, measured): the db subtree fed BOTH the
        // df aggregate and the join — DataFrame reuse duplicates the
        // logical subtree, so the explode + pair build ran twice (the
        // same never-shared shape as the batch-2 postings frames).
        // Below the shared-postings tier: spread the scan on doc_id —
        // hash(doc_id) satisfies the (doc_id, a, b) clustering, so the
        // db aggregate needs NO exchange — and cache the aggregated
        // triples: the pair build runs once, the df aggregate re-keys
        // only aggregated rows, and the final groupBy(doc_id) inherits
        // the cache's doc_id partitioning (also exchange-free). Above
        // the tier the dual-subtree recompute shape is kept (same 512 MB
        // line and rationale as Boilerplate.ShareTierBytes: a corpus-
        // sized triple cache is a scratch-disk liability at sf100).
        val raw = Tables.documents(s, dir)
        val small = (try graft.sources.Layout.sourceBytes(
            s, s"$dir/documents.parquet") <= (512L << 20)
          catch { case _: Throwable => true })
        val db0 = (if (small) pairs(Portable.spread(raw, "doc_id"))
                   else pairs(raw))
          .groupBy("doc_id", "a", "b").agg(count(lit(1)).as("c_db"))
        val db = if (small) { val c = db0.cache(); c.count(); c } else db0
        val df = db.groupBy("a", "b").agg(count(lit(1)).as("df_b"))
        db.join(df, Seq("a", "b"))
          .groupBy("doc_id")
          .agg(sum("c_db").as("n_bigrams"),
            sum(col("c_db") * col("df_b")).as("sum_df"),
            sum(when(col("df_b") === 1, col("c_db")).otherwise(0L))
              .as("n_novel_bigrams"))
          .select(col("doc_id"), col("n_bigrams"), col("sum_df"),
            expr("(sum_df * 1000) div n_bigrams").as("milli_mean_df"),
            col("n_novel_bigrams"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // Vocabulary coverage / UNK rate against a corpus-derived top-K
    // vocabulary — the tokenizer-coverage check run before committing a
    // vocab: what fraction of each document would tokenize to <unk>.
    // Vocab = top 20 tokens by corpus frequency (ties by token text, a
    // total order). The vocab is built by the same map-side-combine
    // count as x_bpe_pairs, is tiny by construction (top-K of a
    // TakeOrdered), and BROADCASTS to the coverage join — per-token
    // probe, no shuffle of the exploded corpus.
    Q("x_vocab_unk",
      """WITH tok AS (
        |  SELECT doc_id, u.t AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |       UNNEST(toks) u(t)),
        |vocab AS (
        |  SELECT tok FROM (SELECT tok, count(*) AS c FROM tok GROUP BY tok
        |                   ORDER BY c DESC, tok LIMIT 20)),
        |doc AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |         CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_in_vocab
        |  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_in_vocab,
        |       CAST(((n_tokens - n_in_vocab) * 1000) // n_tokens AS BIGINT) AS pm_unk
        |FROM doc ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"), explode(Portable.tokens(col("text"))).as("tok"))
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok")).limit(20)
          .select("tok")
        tok.join(broadcast(vocab.withColumn("in_v", lit(1))), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("in_v"), lit(0))).cast("long").as("n_in_vocab"))
          .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
            expr("((n_tokens - n_in_vocab) * 1000) div n_tokens").as("pm_unk"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // RAG-style token-window chunk planning: 64-token chunks, stride 48
    // (16-token overlap), the text twin of m4's byte-window media
    // chunker. Metadata-only output (boundaries + boundary tokens) —
    // integer-exact, no chunk text materialized; chunk_id is pure
    // arithmetic on the start offset (no per-doc window sort). Per-row
    // flatMap via sequence+explode: zero shuffle before the output sort.
    Q("x_chunk_text",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, u.s AS start_tok, least(u.s + 63, n) AS end_tok, toks
        |      FROM t, UNNEST(range(1, n + 1, 48)) u(s))
        |SELECT doc_id,
        |       CAST((start_tok - 1) // 48 + 1 AS BIGINT) AS chunk_id,
        |       CAST(start_tok AS BIGINT) AS start_tok,
        |       CAST(end_tok AS BIGINT) AS end_tok,
        |       CAST(end_tok - start_tok + 1 AS BIGINT) AS n_tokens,
        |       toks[start_tok] AS first_tok, toks[end_tok] AS last_tok
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) {
      (s, dir) => {
        val toks = Portable.tokens(col("text"))
        Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
          .select(col("doc_id"), col("toks"), col("n"),
            explode(sequence(lit(1), col("n"), lit(48))).as("start_tok"))
          .select(col("doc_id"),
            expr("CAST((start_tok - 1) DIV 48 + 1 AS BIGINT)").as("chunk_id"),
            col("start_tok").cast("long").as("start_tok"),
            least(col("start_tok") + 63, col("n")).cast("long").as("end_tok"),
            (least(col("start_tok") + 63, col("n")) - col("start_tok") + 1)
              .cast("long").as("n_tokens"),
            element_at(col("toks"), col("start_tok")).as("first_tok"),
            element_at(col("toks"),
              least(col("start_tok") + 63, col("n")).cast("int")).as("last_tok"))
          .transform(d => graft.Q.sorted(d, "doc_id", "chunk_id"))
      }
    },

    // CCNet-style perplexity-proxy quality filter: per-document mean
    // negative log-likelihood under the corpus's OWN unigram LM (the
    // "does this doc look like the corpus" scalar that perplexity
    // filtering thresholds; x_lm_df is the df-based cousin). Exactness:
    // the only transcendental (ln) is evaluated per VOCABULARY TERM and
    // immediately 1e-6-quantized to a BIGINT (the e7/e9 shared-double
    // convention), so every cross-row sum is exact integer math —
    // identical across engines and shuffle orders. Scale: the unigram
    // table is vocabulary-sized (broadcasts), the (doc, term) tf
    // pre-aggregation shuffles once on the doc-local pair with map-side
    // partials, and the per-doc roll-up reuses the doc keying.
    Q("x_unigram_nll",
      """WITH tok AS (
        |  SELECT doc_id, u.t AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |       UNNEST(toks) u(t)),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM cnt),
        |q AS (SELECT tok,
        |             CAST(round(ln(CAST(n AS DOUBLE) / CAST(ct AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |               AS qnll
        |      FROM cnt, tot)
        |SELECT tf.doc_id, CAST(sum(tf.c) AS BIGINT) AS n_tokens,
        |       CAST(sum(tf.c * q.qnll) AS BIGINT) AS sum_qnll,
        |       CAST(sum(tf.c * q.qnll) // sum(tf.c) AS BIGINT) AS micro_mean_nll
        |FROM tf JOIN q USING (tok)
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) => graft.Q.sorted(unigramNll(s, dir), "doc_id")
    },

    // DSIR-style importance weighting (Xie et al., "Data Selection for
    // Language Models via Importance Resampling"): hashed-unigram bucket
    // features, Laplace-smoothed log-likelihood ratio of a TARGET
    // distribution (here the 'src0' slice — the in-domain sample) vs the
    // RAW corpus, per-doc weight = Σ tf_h · log-ratio_h, then the top-K
    // selection a resampling pass would keep. Same quantized-ln
    // discipline as x_unigram_nll: ln is per-BUCKET (1024 rows),
    // 1e-6-quantized, so doc weights are exact integers and the top-K
    // rank key (micro_logratio, doc_id) is a total integer order. Scale:
    // bucket tables are fixed-size (broadcast), the doc-side tf shuffles
    // once, top-K is TakeOrdered — no global sort.
    Q("x_dsir", {
      val h = Portable.sqlHash32("tok")
      s"""WITH tok AS (
         |  SELECT doc_id, source, u.t AS tok
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         |       UNNEST(toks) u(t)),
         |f AS (SELECT doc_id, source, $h % $DsirBuckets AS h FROM tok),
         |cr AS (SELECT h, CAST(count(*) AS BIGINT) AS cr FROM f GROUP BY 1),
         |ct AS (SELECT h, CAST(count(*) AS BIGINT) AS ct
         |       FROM f WHERE source = '$DsirTarget' GROUP BY 1),
         |nt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM ct),
         |nr AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM cr),
         |q AS (SELECT cr.h,
         |             CAST(round(ln(CAST((coalesce(ct.ct, 0) + 1) * (nr + $DsirBuckets) AS DOUBLE)
         |                        / CAST((cr.cr + 1) * (nt + $DsirBuckets) AS DOUBLE)) * 1e6, 0)
         |               AS BIGINT) AS qlr
         |      FROM cr LEFT JOIN ct USING (h), nt, nr),
         |tfh AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
         |w AS (SELECT tfh.doc_id, CAST(sum(tfh.c) AS BIGINT) AS n_feats,
         |             CAST(sum(tfh.c * q.qlr) AS BIGINT) AS micro_logratio
         |      FROM tfh JOIN q USING (h) GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY micro_logratio DESC, doc_id) AS rk
         |      FROM w)
         |SELECT doc_id, n_feats, micro_logratio, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= $DsirTopK ORDER BY rk""".stripMargin
    }) {
      (s, dir) => {
        val f = Portable.spread(Tables.documents(s, dir), "doc_id")
          .select(col("doc_id"), col("source"),
            explode(Portable.tokens(col("text"))).as("tok"))
          .select(col("doc_id"), col("source"),
            (Portable.hash32(col("tok")) % DsirBuckets).as("h"))
        val cr = f.groupBy("h").agg(count(lit(1)).as("cr"))
        val ct = f.where(col("source") === DsirTarget)
          .groupBy("h").agg(count(lit(1)).as("ct"))
        val nt = broadcast(ct.agg(coalesce(sum("ct"), lit(0L)).as("nt")))
        val nr = broadcast(cr.agg(sum("cr").as("nr")))
        val q = cr.join(ct, Seq("h"), "left").crossJoin(nt).crossJoin(nr)
          .select(col("h"),
            round(log(((coalesce(col("ct"), lit(0L)) + 1) * (col("nr") + DsirBuckets)).cast("double")
              / ((col("cr") + 1) * (col("nt") + DsirBuckets)).cast("double")) * 1e6, 0)
              .cast("long").as("qlr"))
        val tfh = f.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
        val w = tfh.join(broadcast(q), Seq("h"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_feats"), sum(col("c") * col("qlr")).as("micro_logratio"))
        val ord = Seq(col("micro_logratio").desc, col("doc_id").asc)
        // TakeOrderedAndProject bounds the candidate set, then the rank
        // window runs on DsirTopK rows only
        w.orderBy(ord: _*).limit(DsirTopK)
          .withColumn("rk",
            row_number().over(org.apache.spark.sql.expressions.Window.orderBy(ord: _*))
              .cast("long"))
          .select(col("doc_id"), col("n_feats"), col("micro_logratio"), col("rk"))
          .transform(d => graft.Q.sorted(d, "rk"))
      }
    })

  /** The x_unigram_nll frame (doc_id, n_tokens, sum_qnll,
    * micro_mean_nll), exposed for the curation-pipeline composition. */
  def unigramNll(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val tok = Portable.spread(Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), explode(Portable.tokens(col("text"))).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val cnt = tok.groupBy("tok").agg(count(lit(1)).as("ct"))
    val tot = broadcast(cnt.agg(sum("ct").as("n")))
    val q = cnt.crossJoin(tot)
      .select(col("tok"),
        round(log(col("n").cast("double") / col("ct").cast("double")) * 1e6, 0)
          .cast("long").as("qnll"))
    tf.join(broadcast(q), Seq("tok"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), sum(col("c") * col("qnll")).as("sum_qnll"))
      .select(col("doc_id"), col("n_tokens"), col("sum_qnll"),
        expr("sum_qnll div n_tokens").as("micro_mean_nll"))
  }

  /** DSIR feature space: hashed unigram buckets (the paper's hashed
    * n-gram features at n=1), Laplace-smoothed by +1 per bucket. */
  val DsirBuckets = 1024
  /** The in-domain target slice the importance ratio aims at. */
  val DsirTarget = "src0"
  /** Rows kept by the resampling selection. */
  val DsirTopK = 50

  // --- Full BPE trainer: x_bpe_pairs' counting step iterated into the
  // actual tokenizer-training loop (the e9 -> e12 / step -> full-solver
  // pattern applied to the last remaining "step-only" family) ---

  /** Merge rounds trained (the twin of PrFullIters/KmFullIters: a fixed
    * round count the oracle can replay verbatim). */
  val BpeRounds = 5

  /** One greedy left-to-right merge pass: every non-overlapping adjacent
    * (a, b) becomes "a_b"; a matched position consumes its right
    * neighbor, so `[a,a,a]` under (a,a) yields `[a_a, a]` — real BPE
    * application semantics, not a stateless substitution (which
    * over-merges runs). Implemented as an `aggregate` HOF with a
    * (acc, skip) struct state — O(n) per doc, codegen, no UDF. The
    * oracle replays the identical fold with the state flattened into a
    * string ('S'/'N' skip flag + ';'-joined acc), because DuckDB 1.0's
    * list_reduce corrupts list-inside-struct accumulators; symbols are
    * corpus words (never containing '|'/';'), which the round SQL
    * relies on.
    */
  def bpeApply(sym: Column, a: String, b: String): Column =
    bpeApplyCol(sym, lit(a), lit(b))

  /** [[bpeApply]] with the merge pair as COLUMNS — the form
    * [[bpeApplyAll]] needs, where (a, b) are fields of the outer fold's
    * lambda variable rather than string literals. */
  private def bpeApplyCol(sym: Column, a: Column, b: Column): Column =
    aggregate(
      sequence(lit(1), size(sym)),
      struct(array().cast("array<string>").as("acc"), lit(false).as("skip")),
      (st, i) => {
        val cur = element_at(sym, i)
        val nxt = when(i < size(sym), element_at(sym, i + 1)).otherwise(lit(""))
        when(st.getField("skip"),
          struct(st.getField("acc").as("acc"), lit(false).as("skip")))
          .when(cur === a && nxt === b,
            struct(concat(st.getField("acc"), array(concat_ws("_", cur, nxt))).as("acc"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(st.getField("acc"), array(cur)).as("acc"),
              lit(false).as("skip")))
      },
      st => st.getField("acc"))

  /** The WHOLE trained merge table applied in ONE expression (round-12
    * verdict task 2 — single-pass encode): an outer `aggregate` fold
    * over the K-row merge-table array literal whose state is the
    * document's symbol array, each step replaying one greedy
    * left-to-right pass via [[bpeApplyCol]]. Semantically identical to
    * the K chained rewrite passes — same fold, same order, same greedy
    * consumption (BpeSpec pins one-pass ≡ K-pass on the gate corpus) —
    * but the PLAN is one narrow projection over ONE corpus scan: no
    * per-round localCheckpoint materializations, no K corpus copies
    * through the block manager, and the expression size is fixed (two
    * nested folds) regardless of K, unlike K syntactically-nested
    * rewrites which stack expression depth linearly. At serve time this
    * is the difference between K corpus scans and one (the sf100 served
    * encode was 286 s of mostly rescan cost).
    */
  def bpeApplyAll(sym: Column, merges: Seq[(String, String)]): Column = {
    // An empty merge symbol would diverge HOF vs kernel: the HOF's
    // out-of-range right neighbor substitutes "" (so b == "" could
    // "match" past the last element) while BpeEncodeAllK's i+1 < n guard
    // never can. Training can't produce empty symbols (pairs come from
    // whitespace tokens, merges concat with '_'), so reject them here
    // rather than carry a latent divergence.
    require(merges.forall { case (a, b) => a.nonEmpty && b.nonEmpty },
      "BPE merge pairs must be non-empty symbols")
    if (merges.isEmpty) sym
    else aggregate(
      array(merges.map { case (a, b) =>
        struct(lit(a).as("a"), lit(b).as("b")) }: _*),
      sym,
      (acc, m) => bpeApplyCol(acc, m.getField("a"), m.getField("b")))
  }

  final case class BpeMergeRow(
      round: Long, a: String, b: String, cnt: Long, n_syms: Long)

  /** Train [[BpeRounds]] merges over the whitespace-symbol corpus.
    * Each round is the canonical distributed-BPE pass: one map-side-
    * combined pair-count aggregation, a deterministic argmax fetch
    * (count DESC, pair ASC — ONE row to the driver: the merge decision
    * IS the trained artifact, exactly the kmeans/pagerank convergence-
    * probe budget), then a narrow per-doc rewrite with the merge folded
    * in as a literal; `localCheckpoint` cuts the growing lineage per
    * round (the CC-loop discipline). K rounds = K linear corpus passes
    * — how SentencePiece-style trainers shard at web scale. Returns the
    * merge table: (round, a, b, pair count, corpus symbols after).
    */
  /** Trained-merge memo: the BPE artifact is [[BpeRounds]] rows — O(1)
    * driver state, the kmeans-centroid budget — keyed by the documents
    * source fingerprint (the Layout identity trick). First caller pays
    * the training passes; every later x_bpe_train / x_bpe_encode over
    * the same source replays the memoized decisions instead of
    * re-running the corpus-wide pair-count argmax (~2x the suite's BPE
    * cost before this). A regenerated source fingerprints differently
    * and retrains. GRANULARITY ASSUMPTION: the fingerprint is
    * (path, byte length, mtime-ms) — NOT a content hash — so data
    * rewritten in place within the same millisecond AND to the same
    * byte length would silently replay stale merges. Acceptable for the
    * bench harness (testdata is written once per round); a serving
    * deployment should fingerprint content (or version the path). */
  private val mergeMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[BpeMergeRow]]

  /** Where the trained merge table PERSISTS (round-12 task 2 — the
    * e13/classifier artifact pattern applied to the tokenizer): K rows
    * of (round, a, b, cnt, n_syms) under the warehouse, named by the
    * corpus fingerprint + round count, so a regenerated corpus or a
    * changed K trains fresh instead of replaying stale merges. A NEW JVM
    * over the same corpus serves x_bpe_encode straight from this file —
    * K narrow rewrite passes, no pair counting, no argmax: the
    * first-touch training cost (the slowest sf10 bench row) is paid once
    * per corpus, ever. */
  private[graft] def mergesPath(spark: SparkSession, dir: String): String = {
    val fp = graft.sources.Layout
      .sourceFingerprint(spark, s"$dir/documents.parquet")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    new org.apache.hadoop.fs.Path(warehouse,
      s"graft_bpe_merges_${fp}_r$BpeRounds").toString
  }

  /** Test hook: training-loop invocations (the artifact-serve spec pins
    * that a memo-cleared reload does NOT retrain). */
  private[graft] val trainLoopRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test hook: drop the in-JVM memo (simulates a fresh JVM over the
    * same warehouse). */
  private[graft] def clearMergeMemo(): Unit = mergeMemo.clear()

  /** Load a committed merge artifact, validating it is a contiguous
    * round chain (1..len, len <= K) — a gapped or over-long file fails
    * loudly instead of silently skewing every encode. */
  private def loadMerges(spark: SparkSession, path: String): Seq[BpeMergeRow] = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("round", "a", "b", "cnt", "n_syms")
      .as[BpeMergeRow].collect().sortBy(_.round).toSeq
    require(rows.length <= BpeRounds,
      s"merge artifact $path has ${rows.length} rounds, expected <= $BpeRounds")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.round == i + 1L, s"merge artifact $path: round gap at ${i + 1}")
    }
    rows
  }

  private def trainedMerges(spark: SparkSession, dir: String): Seq[BpeMergeRow] = {
    val key = graft.sources.Layout
      .sourceFingerprint(spark, s"$dir/documents.parquet")
    mergeMemo.getOrElseUpdate(key, {
      import spark.implicits._
      val p = mergesPath(spark, dir)
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(hp, "_SUCCESS")))
        loadMerges(spark, p)
      else {
        val trained = bpeTrainLoop(spark, dir)
        // the Classifier commit protocol: temp write + publish that
        // never deletes a committed artifact (Classifier.publishArtifact)
        val tmp = new org.apache.hadoop.fs.Path(
          hp.getParent, s".${hp.getName}.tmp-${java.util.UUID.randomUUID}")
        trained.toDF().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        Classifier.publishArtifact(fs, tmp, hp)
        trained
      }
    })
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir).toDF()
  }

  /** The trained tokenizer APPLIED: the corpus in its post-merge symbol
    * stream — what a tokenize stage hands to packing/counting. Serves
    * the memoized merge decisions through the
    * [[graft.functions.ArrayOps.bpeEncodeAuto]] dispatch: ONE corpus
    * scan, one narrow projection, the merge table riding in as a K-row
    * constant (how a real tokenizer applies a loaded merge file).
    * The kernel is the rank-greedy heap walk — O(n log n) per doc
    * INDEPENDENT of K (round-13 verdict task 6: the K-pass kernel's
    * per-doc cost scaled with the merge table, untenable at a
    * production K ≈ 50k) — with the K-pass kernel as the dispatch
    * fallback for tables that alias merge outputs, and [[bpeApplyAll]]
    * kept as the semantics reference BpeSpec pins both kernels
    * against. The symbol arrays stay distributed end to end — the
    * driver sees only the K merge rows.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    Portable.spread(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"),
        graft.functions.ArrayOps.bpeEncodeAuto(Portable.tokens(col("text")),
          merges.map(m => (m.a, m.b))).as("sym"))
      .select(col("doc_id"), size(col("sym")).cast("long").as("n_syms"),
        array_join(col("sym"), ";").as("enc"))
  }

  /** The pre-round-13 serve path — K chained rewrite passes with a
    * released checkpoint per link — kept as the EQUIVALENCE REFERENCE
    * for the single-pass encode (BpeSpec pins [[bpeEncode]] ≡ this on
    * the gate corpus; the training loop still uses the per-round shape
    * because each round's argmax must see the previous round's corpus).
    */
  private[graft] def bpeEncodeKPass(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    var sym = Portable.spread(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), Portable.tokens(col("text")).as("sym"))
    merges.foreach { m =>
      sym = rollCheckpoint(sym,
        sym.select(col("doc_id"), bpeApply(col("sym"), m.a, m.b).as("sym")))
    }
    sym.select(col("doc_id"), size(col("sym")).cast("long").as("n_syms"),
      array_join(col("sym"), ";").as("enc"))
  }

  /** The materialized RDD behind a localCheckpoint'ed frame — the handle
    * needed to RELEASE a checkpoint chain link once its successor is
    * materialized. Targeted (not a getPersistentRDDs diff), so parallel
    * suites/queries can never unpersist each other's state. */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Checkpoint the next chain link and free the previous one. Eager
    * localCheckpoint materializes `next` BEFORE the release, so the data
    * is never recomputed; without the release a K-round chain holds K
    * corpus-sized copies until driver GC gets around to them — the
    * round-11 K=64 scaling requirement (BpeSpec pins per-round cost and
    * that at most one predecessor stays persisted). */
  private def rollCheckpoint(prev: DataFrame, next: DataFrame): DataFrame = {
    val cp = next.localCheckpoint()
    checkpointRdd(prev).foreach(_.unpersist(blocking = false))
    cp
  }

  /** Test hook for the release discipline (BpeSpec). */
  private[graft] def rollCheckpointForTest(prev: DataFrame, next: DataFrame): DataFrame =
    rollCheckpoint(prev, next)

  private[graft] def bpeTrainLoop(spark: SparkSession, dir: String,
      rounds: Int = BpeRounds,
      perRoundMillis: Option[scala.collection.mutable.ArrayBuffer[Long]] = None)
      : Seq[BpeMergeRow] = {
    trainLoopRuns.incrementAndGet()
    var sym = Portable.spread(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), Portable.tokens(col("text")).as("sym"))
      .localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer.empty[BpeMergeRow]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val t0 = System.nanoTime()
      val top = sym.where(size(col("sym")) >= 2)
        .select(explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect().headOption
      top match {
        // a corpus whose adjacent pairs exhaust before BpeRounds (every
        // doc down to one symbol) terminates with a SHORT merge table
        // instead of crashing on an empty argmax; the fixed-round oracle
        // assumes the gate corpora, where pairs never run out
        case None => exhausted = true
        case Some(t) =>
          val (a, b, cnt) = (t.getString(0), t.getString(1), t.getLong(2))
          sym = rollCheckpoint(sym,
            sym.select(col("doc_id"), bpeApply(col("sym"), a, b).as("sym")))
          val nSyms = sym.agg(sum(size(col("sym")))).head().getLong(0)
          rows += BpeMergeRow(r.toLong, a, b, cnt, nSyms)
      }
      perRoundMillis.foreach(_ += (System.nanoTime() - t0) / 1000000L)
    }
    checkpointRdd(sym).foreach(_.unpersist(blocking = false))
    rows.toSeq
  }

  /** Oracle twin: the identical fixed-round recurrence, each round's
    * argmax and greedy rewrite chained as MATERIALIZED CTEs (the
    * pagerankFullOracleSql scheme). */
  private def bpeRoundCtes: String = {
    val rounds = (1 to BpeRounds).map { k =>
      s"""p$k AS (SELECT z.a AS a, z.b AS b, count(*) AS cnt
         |       FROM s${k - 1},
         |            UNNEST(list_zip(sym[1:-2], sym[2:-1])::STRUCT(a VARCHAR, b VARCHAR)[]) u(z)
         |       WHERE len(sym) >= 2 GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |s$k AS MATERIALIZED (SELECT doc_id, string_split(substr(list_reduce(
         |    list_prepend('N', list_transform(range(1, len(sym)+1), i ->
         |      sym[i] || '|' || CASE WHEN i < len(sym) THEN sym[i+1] ELSE '' END)),
         |    (st, e) -> CASE
         |      WHEN substr(st, 1, 1) = 'S' THEN 'N' || substr(st, 2)
         |      WHEN e = m.a || '|' || m.b
         |        THEN 'S' || substr(st, 2) || ';' || string_split(e, '|')[1] || '_' || string_split(e, '|')[2]
         |      ELSE 'N' || substr(st, 2) || ';' || string_split(e, '|')[1] END), 3), ';') AS sym
         |  FROM s${k - 1} CROSS JOIN m$k AS m)""".stripMargin
    }.mkString(",\n")
    s"""s0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS sym FROM documents),
       |$rounds""".stripMargin
  }

  private def bpeTrainOracleSql: String = {
    val out = (1 to BpeRounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round, a, b, CAST(cnt AS BIGINT) AS cnt,
         |       (SELECT CAST(sum(len(sym)) AS BIGINT) FROM s$k) AS n_syms FROM m$k""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeRoundCtes
       |$out
       |ORDER BY round""".stripMargin
  }

  private def bpeEncodeOracleSql: String =
    s"""WITH $bpeRoundCtes
       |SELECT doc_id, CAST(len(sym) AS BIGINT) AS n_syms,
       |       array_to_string(sym, ';') AS enc
       |FROM s$BpeRounds ORDER BY doc_id""".stripMargin

  def bpeQueries: Seq[Q] = Seq(
    Q("x_bpe_train", bpeTrainOracleSql) {
      (s, dir) => bpeTrain(s, dir).transform(d => graft.Q.sorted(d, "round"))
    },
    Q("x_bpe_encode", bpeEncodeOracleSql) {
      (s, dir) => bpeEncode(s, dir).transform(d => graft.Q.sorted(d, "doc_id"))
    })
}
