package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline extension surface (north-star ops beyond the
  * reference's own inventory; SURVEY.md §7.1 step 10): token counting,
  * quality scoring, n-gram language ID, document fingerprinting, and
  * exact dedup.
  *
  * Scale design: every derived column is per-row Column algebra (one
  * narrow scan, no shuffle except the dedup groupBy); language marker
  * lists are literal arrays folded into codegen, not a join.
  */
object TextStats {
  import Portable._

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Portable.spread(Tables.documents(spark, dir), "doc_id")

  /** Fixed stopword list (synthetic corpus vocabulary). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Marker tokens per language for the n-gram/stopword language-ID
    * heuristic. NOTE: the synthetic corpus draws the same vocabulary for
    * every `lang` value, so predictions are deterministic but carry no
    * real signal — the operator's value is its (tested) shape: marker
    * scoring + fixed-priority argmax, the standard cheap lang-ID scheme.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "shi", "bu"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
  private def sqlMarkerCount(toks: String, markers: Seq[String]): String =
    s"len(list_filter($toks, t -> list_contains([${markers.map(m => s"'$m'").mkString(",")}], t)))"

  // shared with the composed keep-pipeline (Dedup.pipelineQueries)
  def markerCountPublic(toks: Column, markers: Seq[String]): Column =
    markerCount(toks, markers)
  def sqlMarkerCountPublic(toks: String, markers: Seq[String]): String =
    sqlMarkerCount(toks, markers)

  def queries: Seq[Q] = Seq(

    // Corpus-level n-gram novelty: per document, the fraction of its
    // distinct 3-shingles that occur in NO other document — the standard
    // cheap "how much of this doc is new text" curation signal (inverse
    // boilerplate/dup pressure). Scale shape: explode -> groupBy(g) df
    // count -> join back on g. The shared shingle projection plans as one
    // ReusedExchange (EXPLAIN.md: Exchange(4) reused at (7)); the df side
    // broadcasts under the threshold and flips to a shuffled join on g
    // beyond it — either way the join is 1:1 (no blowup on hot shingles:
    // each exploded row meets exactly one df row) and the per-doc agg
    // reuses the spread partitioning with NO extra exchange. Linear in
    // total shingle count; exact integers until one final division.
    Q("x_ngram_novelty",
      s"""WITH sh0 AS (SELECT doc_id, ${sqlShingles3(sqlTokens("text"))} AS sh FROM documents),
         |shingled AS (SELECT * FROM sh0 WHERE len(sh) > 0),
         |e AS (SELECT doc_id, unnest(sh) AS g FROM shingled),
         |df AS (SELECT g, count(*) AS df FROM e GROUP BY g),
         |n AS (SELECT e.doc_id, count(*) AS n_shingles,
         |             sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS n_novel
         |      FROM e JOIN df USING (g) GROUP BY e.doc_id)
         |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |       CAST(n_novel AS BIGINT) AS n_novel,
         |       round(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novel_frac
         |FROM n ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val sh = docs(s, dir)
          .where(size(tokens(col("text"))) >= 3)
          .select(col("doc_id"), shingles3(tokens(col("text"))).as("sh"))
        val e = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        // shingles are distinct within a doc, so count == document freq
        val dfreq = e.groupBy("g").agg(count(lit(1)).as("df"))
        graft.Q.norm(
          e.join(dfreq, "g")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_shingles"),
              sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
            .withColumn("novel_frac",
              col("n_novel").cast("double") / col("n_shingles")),
          "doc_id")
      }
    },

    // Token counting: whitespace tokens + BPE-ish greedy <=4-char chunks.
    Q("x_tokens",
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |       len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS n_subtokens
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        docs(s, dir).select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0))).cast("long").as("n_subtokens"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
    },

    // Quality scoring: length/stopword-ratio/mean-token-length features.
    // Integer-derived doubles only (count/count divisions + ln) so both
    // engines compute identical IEEE results.
    Q("x_quality",
      s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, n_chars, len(toks) AS nt,
         |             ${sqlMarkerCount("toks", Stopwords)} AS nstop,
         |             list_sum(list_transform(toks, x -> length(x))) AS chars_in_toks
         |      FROM t)
         |SELECT doc_id, nt AS n_tokens,
         |       round(nstop * 1.0 / nt, 6) AS stopword_ratio,
         |       round(chars_in_toks * 1.0 / nt, 6) AS mean_token_len,
         |       round(ln(1 + n_chars) * (1.0 - nstop * 1.0 / nt), 6) AS quality
         |FROM f ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val t = docs(s, dir).select(col("doc_id"), col("n_chars"),
          tokens(col("text")).as("toks"))
        val f = t.select(col("doc_id"), col("n_chars"),
          size(col("toks")).as("nt"),
          markerCount(col("toks"), Stopwords).as("nstop"),
          aggregate(transform(col("toks"), x => length(x).cast("long")),
            lit(0L), (a, v) => a + v).as("chars_in_toks"))
        f.select(col("doc_id"), col("nt").cast("long").as("n_tokens"),
          graft.Q.r6(col("nstop") * 1.0 / col("nt")).as("stopword_ratio"),
          graft.Q.r6(col("chars_in_toks") * 1.0 / col("nt")).as("mean_token_len"),
          graft.Q.r6(log(lit(1) + col("n_chars")) * (lit(1.0) - col("nstop") * 1.0 / col("nt")))
            .as("quality"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // Language ID: marker-count argmax with fixed priority order.
    Q("x_langid", {
      val counts = LangMarkers.map { case (l, ms) =>
        s"${sqlMarkerCount("toks", ms)} AS c_$l"
      }.mkString(",\n             ")
      val best = LangMarkers.map { case (l, _) => s"c_$l" }.mkString("greatest(", ", ", ")")
      val cases = LangMarkers.map { case (l, _) =>
        s"WHEN c_$l = $best THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id, lang, $counts FROM t)
         |SELECT doc_id, lang, CASE $cases END AS predicted
         |FROM f ORDER BY doc_id""".stripMargin
    }) {
      (s, dir) => {
        val t = docs(s, dir).select(col("doc_id"), col("lang"),
          tokens(col("text")).as("toks"))
        val f = t.select(Seq(col("doc_id"), col("lang")) ++
          LangMarkers.map { case (l, ms) => markerCount(col("toks"), ms).as(s"c_$l") }: _*)
        val best = greatest(LangMarkers.map { case (l, _) => col(s"c_$l") }: _*)
        val pred = LangMarkers.foldLeft(when(lit(false), lit(""))) {
          case (acc, (l, _)) => acc.when(col(s"c_$l") === best, l)
        }
        f.select(col("doc_id"), col("lang"), pred.as("predicted")).transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // Document fingerprinting: polynomial rolling hash of the text.
    Q("x_fingerprint",
      s"""SELECT doc_id, ${sqlFingerprint("text")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
    },

    // Winnowing fingerprint selection (the MOSS algorithm): hash every
    // positional 3-token gram, slide a w=4 window over the hash sequence,
    // keep each window's minimum — the guarantee-backed LOCAL fingerprint
    // set (any shared run of >= w+k-1 tokens shares a selected
    // fingerprint), the building block plagiarism/near-dup detectors use
    // where whole-doc hashes (x_fingerprint) are too coarse and full
    // shingle sets (d4) too heavy. Pure per-row integer array algebra —
    // portable sha256 gram hashes, window minima, distinct — so zero
    // shuffle and bit-identical output; the reported digests (count, sum,
    // min, max over exact int64) pin the selected set cross-engine
    // without emitting a fingerprint array per row (e7 discipline).
    Q("x_winnow", {
      val gramHash = sqlHash32("array_to_string(toks[i+1:i+3], ' ')")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id,
         |             CASE WHEN len(toks) >= 3 THEN
         |               list_transform(range(0, len(toks) - 2), i -> $gramHash)
         |             ELSE CAST([] AS BIGINT[]) END AS hs
         |      FROM t),
         |w AS (SELECT doc_id, len(hs) AS n_grams,
         |             CASE WHEN len(hs) >= 4 THEN
         |               list_distinct(list_transform(range(0, len(hs) - 3),
         |                             j -> list_min(hs[j+1:j+4])))
         |             ELSE CAST([] AS BIGINT[]) END AS sel
         |      FROM g)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(len(sel) AS BIGINT) AS n_selected,
         |       CAST(coalesce(list_sum(sel), 0) AS BIGINT) AS fp_sum,
         |       list_min(sel) AS fp_min, list_max(sel) AS fp_max
         |FROM w ORDER BY doc_id""".stripMargin
    }) {
      (s, dir) => {
        val emptyL = typedLit(Seq.empty[Long])
        val toks = tokens(col("text"))
        val hs = when(size(toks) >= 3,
          transform(sequence(lit(0), size(toks) - 3),
            i => hash32(array_join(slice(toks, i + 1, lit(3)), " "))))
          .otherwise(emptyL)
        val sel = when(size(col("hs")) >= 4,
          array_distinct(transform(sequence(lit(0), size(col("hs")) - 4),
            j => array_min(slice(col("hs"), j + 1, lit(4))))))
          .otherwise(emptyL)
        docs(s, dir)
          .select(col("doc_id"), hs.as("hs"))
          .select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"), sel.as("sel"))
          .select(col("doc_id"), col("n_grams"),
            size(col("sel")).cast("long").as("n_selected"),
            coalesce(aggregate(col("sel"), lit(0L), (acc, x) => acc + x), lit(0L)).as("fp_sum"),
            array_min(col("sel")).as("fp_min"),
            array_max(col("sel")).as("fp_max"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // Pivot: doc counts by source x language (wide shape). The oracle
    // expresses the same pivot as conditional aggregation, which is what
    // Spark's pivot plans to internally.
    Q("x_pivot", {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val cells = langs.map(l => s"count(*) FILTER (lang = '$l') AS $l").mkString(", ")
      s"SELECT source, $cells FROM documents GROUP BY source ORDER BY source"
    }) {
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("source")
          .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
          .count()
          .na.fill(0L)
          .transform(d => graft.Q.sorted(d, "source"))
    },

    // Exact dedup: group identical texts by content hash, keep min doc_id.
    // (The synthetic corpus has no exact dups — every group has size 1 —
    // but the operator is the standard exact-dedup shape: hash groupBy
    // with map-side partial aggregation.)
    Q("d1_exact_dedup",
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies, sha256(text) AS content_hash
        |FROM documents GROUP BY sha256(text) ORDER BY keeper""".stripMargin) {
      (s, dir) =>
        docs(s, dir).groupBy(sha2(col("text"), 256).as("content_hash"))
          .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
          .select("keeper", "n_copies", "content_hash")
          .transform(d => graft.Q.sorted(d, "keeper"))
    })
}
