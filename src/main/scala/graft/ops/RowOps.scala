package graft.ops

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Row-level scalar operators (SURVEY.md §2.2 P1/P2/P7 + the JSON scalar
  * path): UTC timestamp normalization to the reference's wire format
  * (`yahoo_finance_producer.py:53-56`), timezone shift for display
  * (`streamlit_app.py:341-343`), and JSON field extraction
  * (`provider.py:104`).
  *
  * The display-shift query uses a fixed -5h offset (the January test
  * window's America/New_York offset) instead of a tz-database lookup so
  * the DuckDB oracle is independent of the oracle process's session
  * timezone and tzdata version; the engine API for real use is Spark's
  * `from_utc_timestamp(col, tz)`.
  */
object RowOps {

  def queries: Seq[Q] = Seq(
    Q("p1_timestamps",
      """SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_str,
        |       strftime(ts - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS display_str,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir).select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("utc_str"),
          date_format(col("ts") - expr("INTERVAL 5 HOURS"), "yyyy-MM-dd HH:mm:ss")
            .as("display_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
          .transform(d => graft.Q.sorted(d, "event_id"))
    })
}
