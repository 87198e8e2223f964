package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing pass every training-data
  * pipeline runs before anything else touches the text (reference scope:
  * the LLM-pipeline extension surface; the reference itself ships raw
  * Yahoo JSON with no scrubbing).
  *
  * The synthetic corpus contains no digits or '@' at all, so the query
  * first *injects* deterministic PII derived from `doc_id` — the same
  * arithmetic on both engines — then detects and redacts it. That keeps
  * the op oracle-checkable end-to-end: every regex must fire on the same
  * spans in Spark (Java regex) and DuckDB (RE2), which is why the
  * patterns stick to the ASCII-safe common subset (`\b`, `\d`, bounded
  * repetition, literal char classes — no lookarounds, no unicode
  * classes).
  *
  * Scale: one projection per row, no shuffle except the output sort —
  * `regexp_count`/`regexp_replace` are codegen'd string kernels, so the
  * pass is scan-bound at 100 TB exactly like x_quality/x_langid.
  */
object Pii {

  // Shared Spark/DuckDB regex subset (Java + RE2 agree on all of these).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val SsnRe   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Deterministic PII injection, SQL side. doc_id % 5 picks the class
    * (4 = clean); the payload digits derive from doc_id so every row is
    * unique and reproducible.
    */
  private val sqlAug: String =
    // single-line branches: this fragment is re-embedded in a
    // stripMargin'd outer query, so no line may begin with '||'
    "text || CASE CAST(doc_id % 5 AS INT)" +
      " WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'" +
      " WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||" +
      " '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'" +
      " WHEN 2 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) ||" +
      " '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'" +
      " WHEN 3 THEN ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ok'" +
      " ELSE '' END"

  /** Same injection, Column side. */
  private def aug(docId: Column, text: Column): Column = {
    val m = pmod(docId, lit(5)).cast("int")
    concat(text,
      when(m === 0, concat(lit(" contact user"), docId.cast("string"),
        lit("@mail.example.com now")))
        .when(m === 1, concat(lit(" call 555-"),
          lpad(pmod(docId, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(docId, lit(10000)).cast("string"), 4, "0"), lit(" now")))
        .when(m === 2, concat(lit(" host 10."),
          pmod(docId, lit(256)).cast("string"), lit(".0."),
          pmod(docId * 7, lit(256)).cast("string"), lit(" up")))
        .when(m === 3, concat(lit(" ssn 987-65-"),
          lpad(pmod(docId, lit(10000)).cast("string"), 4, "0"), lit(" ok")))
        .otherwise(lit("")))
  }

  /** Redaction order is part of the contract (applied identically on
    * both engines). The four patterns are disjoint by construction
    * (3-3-4 phones vs 3-2-4 SSNs; emails have no digit-dash runs), so
    * order only matters defensively.
    */
  val Masks: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ssn", SsnRe, "<SSN>"),
    ("ip", Ipv4Re, "<IP>"))

  def queries: Seq[Q] = Seq(
    Q("x_pii", {
      val counts = Masks.map { case (k, re, _) =>
        s"CAST(len(regexp_extract_all(aug, '$re')) AS BIGINT) AS n_$k"
      }.mkString(",\n       ")
      val redacted = Masks.foldLeft("aug") { case (acc, (_, re, mask)) =>
        s"regexp_replace($acc, '$re', '$mask', 'g')"
      }
      s"""WITH a AS (SELECT doc_id, $sqlAug AS aug FROM documents),
         |r AS (SELECT doc_id,
         |       $counts,
         |       $redacted AS clean FROM a)
         |SELECT doc_id, n_email, n_phone, n_ssn, n_ip,
         |       CAST(length(clean) AS BIGINT) AS clean_len,
         |       substr(clean, greatest(1, length(clean) - 31)) AS tail
         |FROM r ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val a = Tables.documents(s, dir)
        .select(col("doc_id"), aug(col("doc_id"), col("text")).as("aug"))
      val countCols = Masks.map { case (k, re, _) =>
        regexp_count(col("aug"), lit(re)).cast("long").as(s"n_$k")
      }
      val clean = Masks.foldLeft(col("aug")) { case (acc, (_, re, mask)) =>
        regexp_replace(acc, re, mask)
      }
      a.select(Seq(col("doc_id")) ++ countCols :+ clean.as("clean"): _*)
        .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ssn"),
          col("n_ip"), length(col("clean")).cast("long").as("clean_len"),
          // explicit 1-based substr: `right()` / negative-substring
          // semantics disagree across engines for strings shorter than
          // the window, this form is identical in both
          expr("substr(clean, greatest(1, length(clean) - 31))").as("tail"))
        .transform(d => graft.Q.sorted(d, "doc_id"))
    })
}
