package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment-level dedup over the `documents` table — the line/paragraph
  * tier of a training-data sweep (the document tier lives in
  * `ext/Dedup.scala`). Two operators:
  *
  *   - `x_linededup`: corpus-wide boilerplate removal. Documents split
  *     into fixed-length token segments (the stand-in for "lines" — the
  *     synthetic corpus has no newlines); any segment occurring in more
  *     than [[HotDocs]] DISTINCT documents is boilerplate and is removed
  *     from every document, which is then reassembled in original order.
  *     The CCNet/RefinedWeb line-dedup shape.
  *   - `x_span_dedup`: duplicated-span profiling. Sliding token windows
  *     (width [[SpanLen]], stride [[SpanStride]]) as exact keys; a span
  *     is duplicated when it occurs in >= 2 distinct documents; each doc
  *     reports its duplicated-span fraction — the "fraction of text
  *     duplicated elsewhere" metric of exact-substring-dedup pipelines.
  *
  * Scale design (100 TB): both queries hash-partition on the segment
  * string once and derive everything from that single exchange — the
  * frequency aggregation and the flag/anti join are co-partitioned, so
  * Catalyst reuses the exchange rather than shuffling twice. The hot set
  * in `x_linededup` is the *boilerplate* tail (high-frequency segments),
  * which is tiny by construction — it broadcasts, so the removal pass is
  * a broadcast anti join, not a shuffle. Reassembly shuffles once on
  * doc_id with map-side partial aggregation. No step is quadratic: exact
  * segment equality needs no pair enumeration, unlike the Jaccard tier
  * (`d4`/`d6`), which is why line dedup is the cheap first rung of a
  * production sweep.
  */
object Boilerplate {
  import Portable._

  /** Tokens per fixed segment ("line") in x_linededup. */
  val ChunkLen = 4

  /** A segment in more than this many distinct docs is boilerplate. */
  val HotDocs = 2

  /** Sliding-window width/stride (tokens) for x_span_dedup. */
  val SpanLen = 4
  val SpanStride = 2

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Portable.spread(Tables.documents(spark, dir), "doc_id")

  /** Shared-postings materialization tier (round 16, guide §2.4): a
    * postings frame feeding BOTH a frequency aggregate and a flag join
    * never shares an exchange between them — DataFrame reuse duplicates
    * the logical subtree and column pruning makes the copies canonically
    * unequal, so the window-explode/hash map side runs once PER CONSUMER
    * (measured at sf0.1: the x_substr_dedup sha256-per-window stage ran
    * twice, ~1.9 s each). Below this documents.parquet size the frame is
    * repartitioned on its join key and cached, so the map side runs once
    * and consumers read co-partitioned rows with no further exchange;
    * above it the recompute shape that survived sf100 stays (same 512 MB
    * line as Bench.LargeSfBytes). */
  private val ShareTierBytes = 512L << 20
  private def smallDocs(spark: SparkSession, dir: String): Boolean =
    try graft.sources.Layout.sourceBytes(spark, s"$dir/documents.parquet") <= ShareTierBytes
    catch { case _: Throwable => true }

  /** Spread-and-cache below the tier; untouched recompute frame above. */
  private def shareByKey(spark: SparkSession, dir: String,
      df: DataFrame, key: String): DataFrame =
    if (smallDocs(spark, dir)) Portable.spread(df, key).cache() else df

  /** (doc_id, seg_idx, seg): consecutive ChunkLen-token segments. */
  private def segments(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nseg = ceil(size(col("toks")) / lit(ChunkLen.toDouble)).cast("long")
    val segs = when(col("nseg") > 0,
      transform(sequence(lit(0L), col("nseg") - 1),
        i => array_join(slice(col("toks"), (i * ChunkLen).cast("int") + 1, lit(ChunkLen)), " ")))
      .otherwise(array().cast("array<string>"))
    docs(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("nseg", nseg)
      .select(col("doc_id"), posexplode(segs).as(Seq("seg_idx", "seg")))
  }

  def queries: Seq[Q] = Seq(

    // Corpus-wide boilerplate ("line") removal + ordered reassembly.
    Q("x_linededup",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |seg0 AS (SELECT doc_id,
         |                unnest(list_transform(range(CAST(ceil(len(toks) / $ChunkLen.0) AS BIGINT)),
         |                       i -> {'i': i, 'seg': array_to_string(toks[(i*$ChunkLen+1):(i*$ChunkLen+$ChunkLen)], ' ')})) AS s
         |         FROM t),
         |seg AS (SELECT doc_id, s.i AS seg_idx, s.seg AS seg FROM seg0),
         |hot AS (SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS nd
         |                         FROM seg GROUP BY seg) WHERE nd > $HotDocs),
         |kept AS (SELECT * FROM seg WHERE seg NOT IN (SELECT seg FROM hot)),
         |tot AS (SELECT doc_id, count(*) AS n_seg FROM seg GROUP BY doc_id),
         |k AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS kept_text,
         |             count(*) AS n_kept
         |      FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(k.kept_text, '') AS kept_text,
         |       coalesce(k.n_kept, 0) AS n_kept,
         |       t.n_seg - coalesce(k.n_kept, 0) AS n_dropped
         |FROM tot t LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val seg = segments(s, dir).cache()
        // boilerplate = high-df tail: tiny by construction -> broadcast
        val hot = seg.groupBy("seg")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") > HotDocs)
          .select("seg")
        val kept = seg.join(broadcast(hot), Seq("seg"), "left_anti")
        val tot = seg.groupBy("doc_id").agg(count(lit(1)).as("n_seg"))
        // round 16 (guide §4): sort_array + GetArrayStructFields instead
        // of array_sort + a transform lambda — the lambda ran interpreted
        // once per document on the reassembly task; the native pair is
        // whole-stage-codegen. Natural struct ordering is identical
        // (seg_idx is unique per doc), so output is bit-identical.
        val k = kept.groupBy("doc_id").agg(
          array_join(
            sort_array(collect_list(struct(col("seg_idx"), col("seg"))))
              .getField("seg"), " ").as("kept_text"),
          count(lit(1)).as("n_kept"))
        Q.norm(
          tot.join(k, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("kept_text"), lit("")).as("kept_text"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dropped")),
          "doc_id")
      }
    },

    // Duplicated-span fraction per document (sliding exact windows).
    Q("x_span_dedup",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sp AS (SELECT doc_id,
         |              unnest(list_transform(range(CAST(floor((len(toks) - $SpanLen) / $SpanStride.0) AS BIGINT) + 1),
         |                     i -> array_to_string(toks[(i*$SpanStride+1):(i*$SpanStride+$SpanLen)], ' '))) AS span
         |       FROM t WHERE len(toks) >= $SpanLen),
         |nd AS (SELECT span, count(DISTINCT doc_id) AS nd FROM sp GROUP BY span)
         |SELECT doc_id, count(*) AS n_spans,
         |       count(*) FILTER (nd.nd >= 2) AS n_dup_spans,
         |       round(count(*) FILTER (nd.nd >= 2) * 1.0 / count(*), 6) AS dup_frac
         |FROM sp JOIN nd USING (span)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val toks = tokens(col("text"))
        val nspan = (floor((size(col("toks")) - SpanLen) / lit(SpanStride.toDouble))).cast("long") + 1
        // round 16 (guide §2.4): span-hash spread + cache below the tier
        // (see shareByKey) — the window-explode map side used to run
        // once per consumer (frequency aggregate AND flag join)
        val sp = shareByKey(s, dir,
          docs(s, dir)
            .select(col("doc_id"), toks.as("toks"))
            .where(size(col("toks")) >= SpanLen)
            .select(col("doc_id"),
              explode(transform(sequence(lit(0L), nspan - 1),
                i => array_join(slice(col("toks"), (i * SpanStride).cast("int") + 1, lit(SpanLen)), " "))).as("span")),
          "span")
        val nd = sp.groupBy("span").agg(countDistinct(col("doc_id")).as("nd"))
        val flagged = sp.join(nd, Seq("span"))
        Q.norm(
          flagged.groupBy("doc_id").agg(
            count(lit(1)).as("n_spans"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
            .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
              (col("n_dup_spans") * 1.0 / col("n_spans")).as("dup_frac")),
          "doc_id")
      }
    },

    // Exact-substring span REMOVAL (Lee et al., "Deduplicating Training
    // Data Makes Language Models Better" — the ExactSubstr pass, at
    // window grain instead of suffix arrays): every stride-1
    // SubLen-token window occurring in >= 2 DISTINCT documents marks its
    // token positions; covered positions are removed from every document
    // and the survivors reassemble in order — x_span_dedup measures the
    // duplicated fraction, this op actually emits the cleaned corpus.
    //
    // Scale design: window keys are 60-bit portable hashes, not window
    // strings — the df aggregation and the dup-flag join shuffle
    // O(tokens) LONGS (not SubLen-token strings) on the same `h`
    // partitioning (one exchange, reused). A 60-bit collision makes two
    // different windows "duplicates" in BOTH engines identically (the
    // hash IS the dedup key cross-engine), at ~1e-18/pair — the honest
    // price of not shuffling full window text at 100 TB. Coverage
    // explode is ×SubLen of DUP windows only; the anti join needs no
    // distinct (anti joins ignore right-side multiplicity); reassembly
    // shuffles once on doc_id. Within-doc-only repeats are kept (nd
    // counts distinct docs) — the cross-doc contamination signal, not
    // intra-doc repetition (x_repetition's job).
    Q("x_substr_dedup",
      s"""WITH $substrCleanSqlCtes
         |SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
         |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |       CAST(t.n - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
         |       coalesce(k.cleaned_text, '') AS cleaned_text
         |FROM t LEFT JOIN k USING (doc_id) ORDER BY t.doc_id""".stripMargin) {
      (s, dir) => Q.norm(substrCleaned(s, dir), "doc_id")
    })

  /** Window width (tokens) for x_substr_dedup — the exact-substring
    * grain; Lee et al. use 50 BPE tokens, scaled here to the synthetic
    * corpus's short documents. */
  val SubLen = 8

  /** The x_substr_dedup frame (doc_id, n_tokens, n_kept, n_removed,
    * cleaned_text), exposed for the curation-pipeline composition. */
  def substrCleaned(s: SparkSession, dir: String): DataFrame = {
    val toksC = tokens(col("text"))
    val t = docs(s, dir)
      .select(col("doc_id"), toksC.as("toks"), size(toksC).as("n"))
    // round 16 (guide §2.4): the df aggregate and the flag join each
    // recomputed the sha256-per-window map side (duplicated pruned
    // subtrees — see shareByKey); spread + cache on h runs it once and
    // feeds both consumers co-partitioned
    val w = shareByKey(s, dir,
      t.where(col("n") >= SubLen)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), col("n") - (SubLen - 1))).as("start"))
        .select(col("doc_id"), col("start"),
          Portable.hash60(
            array_join(slice(col("toks"), col("start"), lit(SubLen)), " ")).as("h")),
      "h")
    val nd = w.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
    val dup = w.join(nd.where(col("nd") >= 2).select("h"), Seq("h"))
      .select(col("doc_id"), col("start"))
    val cov = dup.select(col("doc_id"),
      explode(sequence(col("start"), col("start") + (SubLen - 1))).as("pos"))
    val tok = t.select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
    val kept = tok.join(cov, Seq("doc_id", "pos"), "left_anti")
    // round 16: native sort_array + struct-field projection (see
    // x_linededup) — removes the per-doc interpreted transform lambda
    val k = kept.groupBy("doc_id").agg(
      array_join(
        sort_array(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok"), " ").as("cleaned_text"),
      count(lit(1)).as("n_kept"))
    t.select(col("doc_id"), col("n")).join(k, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n").cast("long") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** The x_substr_dedup CTE chain (everything up to `k`), shared with
    * the curation-pipeline oracle. Expects table `documents`. */
  private[ext] val substrCleanSqlCtes: String = {
    val h = Portable.sqlHash60(s"array_to_string(toks[u.s:u.s+${SubLen - 1}], ' ')")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks,
       |                 len(string_split(text, ' ')) AS n FROM documents),
       |w AS (SELECT doc_id, u.s AS start, $h AS h
       |      FROM t, UNNEST(range(1, n - $SubLen + 2)) u(s) WHERE n >= $SubLen),
       |nd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h),
       |dup AS (SELECT doc_id, start FROM w JOIN nd USING (h) WHERE nd.nd >= 2),
       |cov AS (SELECT doc_id, u.p AS pos
       |        FROM dup, UNNEST(range(start, start + $SubLen)) u(p)),
       |tok AS (SELECT doc_id, u.p AS pos, toks[u.p] AS tok
       |        FROM t, UNNEST(range(1, n + 1)) u(p)),
       |kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
       |         WHERE NOT EXISTS (SELECT 1 FROM cov c
       |                           WHERE c.doc_id = tok.doc_id AND c.pos = tok.pos)),
       |k AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned_text,
       |             count(*) AS n_kept
       |      FROM kept GROUP BY doc_id)""".stripMargin
  }
}
