package graft

import org.apache.spark.sql.functions._

/** The native as-of join operator ([[graft.plans.AsOfJoinExec]]):
  * plan shape, semantics vs the union-trick composition, and the
  * partitioning-preservation contract.
  */
class AsOfExecSpec extends SparkTestBase {

  private def inputs = {
    val ev = graft.sources.Tables.events(spark, sf).select(
      col("event_id"), graft.sources.Bars.symbolFor(col("user_id")).as("symbol"),
      col("ts"), col("value"))
    val b = graft.sources.Bars(spark, sf)
      .select(col("symbol"), col("datetime"), col("close"))
      .withColumnRenamed("datetime", "bar_time")
      .withColumnRenamed("close", "bar_close")
    (ev, b)
  }

  private def native = {
    val (ev, b) = inputs
    graft.ops.AsOf.asofJoinNative(ev, b, "symbol", "ts", "bar_time",
      payload = Seq("bar_time", "bar_close"))
  }

  test("the physical plan contains AsOfJoinExec") {
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"no AsOfJoinExec in plan:\n$plan")
  }

  test("matches the union+window composition row-for-row") {
    val (ev, b) = inputs
    val composed = graft.ops.AsOf.asofJoin(ev, b, "symbol", "ts", "bar_time",
      payload = Seq("bar_time", "bar_close"))
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
  }

  test("inner as-of semantics: only events at-or-after some bar survive") {
    val (ev, b) = inputs
    val out = native.cache()
    // every output row's bar really is at-or-before the event, per key
    assert(out.where(col("bar_time") > col("ts")).count() == 0)
    // row count == events having any bar at-or-before, per key (window recheck)
    val exp = ev.join(b.groupBy("symbol").agg(min("bar_time").as("t0")), "symbol")
      .where(col("ts") >= col("t0")).count()
    assert(out.count() == exp)
    // the joined bar is the LATEST eligible one: no bar strictly between
    assert(out.join(b.withColumnRenamed("bar_time", "later")
        .drop("bar_close"), Seq("symbol"))
      .where(col("later") > col("bar_time") && col("later") <= col("ts"))
      .count() == 0)
    out.unpersist()
  }

  test("left-outer variant: unmatched left rows survive with null payload") {
    // synthetic frames — the parquet testdata can never produce an
    // unmatched event (each event seeds its own symbol's bar), so the
    // null-payload branch is pinned here
    val s = spark
    import s.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val trades = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L), // before any A quote
      ("A", ts("2024-01-01 10:30:00"), 2L), // after q1
      ("B", ts("2024-01-01 10:00:00"), 3L), // B has no quotes at all
      ("C", ts("2024-01-01 11:00:00"), 4L), // exactly at C's quote ts
      (null, ts("2024-01-01 12:00:00"), 5L) // NULL key: never matches
    ).toDF("sym", "t", "id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 101.0),
      ("A", ts("2024-01-01 11:00:00"), 102.0),
      ("C", ts("2024-01-01 11:00:00"), 300.0),
      (null, ts("2024-01-01 09:00:00"), 999.0) // NULL key: matches nothing
    ).toDF("sym", "qt", "px")
    val out = graft.ops.AsOf.asofJoinNative(
      trades, quotes, "sym", "t", "qt", Seq("qt", "px"), leftOuter = true)
      .select(col("id"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(101.0), 3L -> None,
      4L -> Some(300.0), 5L -> None))
    // inner variant drops exactly the unmatched ones (incl. null-key rows)
    val inner = graft.ops.AsOf.asofJoinNative(
      trades, quotes, "sym", "t", "qt", Seq("qt", "px"))
      .select("id").as[Long].collect().toSet
    assert(inner == Set(2L, 4L))
  }

  test("union-trick payload is atomic per right row (NULL payload cells)") {
    // A right row carrying NULL in one payload column must not have its
    // other columns stitched together with an EARLIER right row's values
    // (per-column last(ignoreNulls) did exactly that), and a matched row
    // whose payload is entirely NULL still matches under inner as-of.
    val s = spark
    import s.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val trades = Seq(
      ("A", ts("2024-01-01 11:30:00"), 1L), // latest quote has px, no tag
      ("A", ts("2024-01-01 10:30:00"), 2L), // latest quote has tag, no px
      ("D", ts("2024-01-01 10:30:00"), 3L)  // only quote is all-NULL
    ).toDF("sym", "t", "id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), None: Option[Double], Some("q1")),
      ("A", ts("2024-01-01 11:00:00"), Some(102.0), None: Option[String]),
      ("D", ts("2024-01-01 10:00:00"), None: Option[Double], None: Option[String])
    ).toDF("sym", "qt", "px", "tag")
    val out = graft.ops.AsOf.asofJoin(
        trades, quotes, "sym", "t", "qt", Seq("px", "tag"))
      .select(col("id"), col("px"), col("tag")).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
          Option(r.getString(2))))
      .toMap
    assert(out == Map(
      1L -> ((Some(102.0), None)),    // NOT (102.0, "q1") stitched
      2L -> ((None, Some("q1"))),
      3L -> ((None, None))))          // matched despite all-NULL payload
  }

  test("output preserves the left partitioning: no extra exchange downstream") {
    def nExchanges(p: String) = "(?i)exchange".r.findAllIn(p).length
    val base = nExchanges(native.queryExecution.executedPlan.toString)
    val agg = native.groupBy("symbol").count()
    val plan = agg.queryExecution.executedPlan.toString
    // the downstream per-key agg reuses the operator's preserved
    // clustering: not one exchange beyond what the join itself plans
    assert(nExchanges(plan) == base,
      s"agg added exchanges (base=$base):\n$plan")
  }
}
