package graft.ops

import graft.Q
import graft.sources.{Bars, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical market-data operator (each left row picks
  * the latest right row at-or-before its timestamp, per key) that Spark
  * has no native operator for.
  *
  * Implementation is the scalable union trick, NOT a range join:
  * tag both sides, union, and take `last(payload, ignoreNulls)` over a
  * running row window ordered by (time, side). One shuffle on the key +
  * one sort — the same cost as a single sort-merge join — where a naive
  * `l.ts >= r.ts` theta-join is O(|L|x|R|) per key and a per-left-row
  * `max_by` subquery is O(|L|x|R|) again. At 100 TB both sides shuffle
  * once on the key; the window is per-key sequential, which is exactly
  * the operator's semantics (time order within key).
  *
  * The right side's payload must be a known column list; rows from the
  * right act as "state updates" and left rows read the running state —
  * the batch analog of a stream-table temporal join.
  */
object AsOf {

  /** Left rows + `last right payload at-or-before leftTs` per key.
    * Left rows with no preceding right row are DROPPED (inner as-of,
    * DuckDB `ASOF JOIN` semantics).
    *
    * @param payload right-side columns to carry (everything except key
    *                and time); emitted with their own names
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lType = left.schema.map(f => f.name -> f.dataType).toMap
    // The whole right payload rides in ONE struct column: last(struct)
    // is atomic per right row, so a right row holding NULL in some
    // payload column can never have its other columns stitched together
    // with a different row's values, and a matched-but-all-NULL payload
    // still counts as a match (the struct itself is non-null) — same
    // semantics as AsOfJoinExec and DuckDB ASOF JOIN.
    val pStruct = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payload.contains(f.name)))
    // one unioned schema: key, t, side (0=right first at equal t), left
    // cols, right payload struct; absent-side columns are typed nulls so
    // the union needs no coercion
    val rightTagged = right.select(
      (col(key) +: col(rightTs).as("_t") +: lit(0).as("_side") +:
        (leftCols.filterNot(c => c == key)
          .map(c => lit(null).cast(lType(c)).as(c)) :+
          struct(payload.map(col): _*).as("_p"))): _*)
    val leftTagged = left.select(
      (col(key) +: col(leftTs).as("_t") +: lit(1).as("_side") +:
        (leftCols.filterNot(c => c == key).map(col) :+
          lit(null).cast(pStruct).as("_p"))): _*)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightTagged.unionByName(leftTagged)
      .withColumn("_asof_p", last(col("_p"), ignoreNulls = true).over(w))
    filled.where(col("_side") === 1 && col("_asof_p").isNotNull)
      .select(leftCols.map(col) ++
        payload.map(c => col("_asof_p").getField(c).as(c)): _*)
  }

  /** Range (interval) join: left rows matched to right rows with
    * rightTs in [leftTs, leftTs + width). A raw inequality join is a
    * per-key cartesian; this bucketizes BOTH sides to `width`-sized time
    * buckets (each left row probes its own and the next bucket — every
    * interval of length `width` spans at most 2 buckets), turning the
    * range predicate into an equi-join Catalyst can hash/sort-merge plan
    * and AQE can re-balance, with the exact predicate re-checked after.
    * Join cost scales with per-bucket density, not per-key row count.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, widthSec: Long): DataFrame = {
    // floor, not cast-truncate: truncation rounds toward zero, so
    // pre-1970 (negative epoch) timestamps near a boundary would land in
    // the wrong bucket and silently miss matches despite the recheck
    val lb = floor(unix_timestamp(col(leftTs)) / widthSec).cast("long")
    val rb = floor(unix_timestamp(col(rightTs)) / widthSec).cast("long")
    val l = left.withColumn("_lb", explode(array(lb, lb + 1)))
    val r = right.withColumn("_rb", rb)
    l.join(r, l(key) === r(key) && col("_lb") === col("_rb") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) < col(leftTs) + expr(s"INTERVAL $widthSec SECONDS"))
      .drop("_lb", "_rb").drop(r(key))
  }

  /** As-of join through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]]): a per-session planner strategy
    * turns the logical node into a merge pass over two key-clustered,
    * (key, ts)-sorted children. Same inner-as-of semantics as
    * [[asofJoin]]; unlike the union trick it never widens the schema or
    * runs window state over probe rows, and it preserves the left
    * side's partitioning AND ordering for downstream operators.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      leftOuter: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    org.apache.spark.sql.graftshim.Interop.ensureStrategy(
      spark, graft.plans.AsOfJoinStrategy)
    val lPlan = org.apache.spark.sql.graftshim.Interop.analyzed(left)
    val rPlan = org.apache.spark.sql.graftshim.Interop.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = p.output.filter(_.name == name) match {
      case Seq(a) => a
      case Seq() =>
        sys.error(s"asofJoinNative: no column '$name' in ${p.output.map(_.name)}")
      case many => // fail loudly instead of silently binding the first
        sys.error(s"asofJoinNative: ambiguous column '$name' (${many.size} matches)")
    }
    org.apache.spark.sql.graftshim.Interop.ofRows(spark,
      graft.plans.AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        payload.map(attr(rPlan, _)), leftOuter))
  }

  /** Raw derivations of the as-of family's two sides. */
  private def rawSides(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), Bars.symbolFor(col("user_id")).as("symbol"),
      col("ts"), col("value"))
    val b = Bars(s, dir)
      .select(col("symbol"), col("datetime").as("bar_time"),
        col("close").as("bar_close"))
    (ev, b)
  }

  /** (events, bars) for a8/a20/a20b — SERVED from the a20c bucketed
    * artifacts when BOTH are already persisted for this corpus (round-15
    * verdict task 7: a20b paid the 61 s raw scan+exchange+sort at sf100
    * while a20c answered the same oracle in 37 s from the artifacts that
    * already existed), falling back to the raw derivation otherwise.
    * Presence never triggers a build — only a20c pays that, once per
    * corpus fingerprint. The artifacts are projections of the raw
    * tables, so either arm answers the identical oracle; the dispatch
    * precedent is ops/Dashboard.cascade's history-depth arm. */
  private[graft] def asofSidesServed(s: org.apache.spark.sql.SparkSession,
      dir: String): Option[(DataFrame, DataFrame)] = {
    val b = graft.ops.CoPurchase.buckets(s, dir)
    val fp = graft.sources.Layout.sourceFingerprint(s, s"$dir/events.parquet")
    for {
      ev <- graft.sources.Layout.bucketedArtifactIfPresent(s,
        s"graft_asofev_$fp", "symbol", b, Seq("symbol", "ts"))
      bars <- graft.sources.Layout.bucketedArtifactIfPresent(s,
        s"graft_asofbar_$fp", "symbol", b, Seq("symbol", "bar_time"))
    } yield (ev, bars)
  }

  private[graft] def asofSides(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) =
    asofSidesServed(s, dir).getOrElse(rawSides(s, dir))

  def queries: Seq[Q] = Seq(

    // a8: each event joined to the latest bar at-or-before its ts for
    // its symbol. Oracle uses DuckDB's native ASOF JOIN — two engines,
    // two completely different operator implementations, same rows.
    Q("a8_asof_join",
      s"""WITH ${Bars.cte},
         |ev AS (SELECT event_id, ${Bars.sqlSymbolFor("user_id")} AS symbol,
         |              ts, value
         |       FROM events),
         |b AS (SELECT symbol, datetime, close FROM bars)
         |SELECT ev.event_id, ev.symbol, ev.ts, round(ev.value, 6) AS value,
         |       b.datetime AS bar_time, round(b.close, 6) AS bar_close
         |FROM ev ASOF JOIN b
         |  ON ev.symbol = b.symbol AND ev.ts >= b.datetime
         |ORDER BY ev.event_id""".stripMargin) {
      (s, dir) => {
        // round-16 (verdict task 7): past the deep-history tier the
        // union trick's by-construction exchange+sort dominates (82 s vs
        // 25 s at sf100 for the same oracle), so when the a20c
        // co-bucketed artifacts already exist a8 rides AsOfJoinExec over
        // their (symbol, ts) bucket order instead. At the gate SFs (and
        // wherever the artifacts are absent) the union+running-window
        // arm stays the pinned implementation (PlanShapeSpec) — three
        // independent as-of implementations remain oracle-covered.
        asofSidesServed(s, dir) match {
          case Some((ev, b)) if graft.ops.Dashboard.deepHistory(s, dir) =>
            Q.norm(
              asofJoinNative(ev, b, "symbol", "ts", "bar_time",
                payload = Seq("bar_time", "bar_close")),
              "event_id")
          case served =>
            val (ev, b) = served.getOrElse(rawSides(s, dir))
            Q.norm(
              asofJoin(ev, b, "symbol", "ts", "bar_time",
                payload = Seq("bar_time", "bar_close")),
              "event_id")
        }
      }
    },

    // a20: a8's as-of join through the native AsOfJoinExec physical
    // operator instead of the union+window composition — same DuckDB
    // ASOF JOIN oracle, third independent implementation of the
    // semantics (union trick / custom merge operator / DuckDB native).
    Q("a20_asof_exec",
      s"""WITH ${Bars.cte},
         |ev AS (SELECT event_id, ${Bars.sqlSymbolFor("user_id")} AS symbol,
         |              ts, value
         |       FROM events),
         |b AS (SELECT symbol, datetime, close FROM bars)
         |SELECT ev.event_id, ev.symbol, ev.ts, round(ev.value, 6) AS value,
         |       b.datetime AS bar_time, round(b.close, 6) AS bar_close
         |FROM ev ASOF JOIN b
         |  ON ev.symbol = b.symbol AND ev.ts >= b.datetime
         |ORDER BY ev.event_id""".stripMargin) {
      (s, dir) => {
        val (ev, b) = asofSides(s, dir)
        Q.norm(
          asofJoinNative(ev, b, "symbol", "ts", "bar_time",
            payload = Seq("bar_time", "bar_close")),
          "event_id")
      }
    },

    // a20b: the left-outer variant through the same native operator —
    // events before their symbol's first bar survive with a -1
    // sentinel (NULL bar_close never reaches the cross-engine hash).
    // Oracle: DuckDB ASOF LEFT JOIN.
    Q("a20b_asof_left",
      s"""WITH ${Bars.cte},
         |ev AS (SELECT event_id, ${Bars.sqlSymbolFor("user_id")} AS symbol,
         |              ts, value
         |       FROM events),
         |b AS (SELECT symbol, datetime, close FROM bars)
         |SELECT ev.event_id, ev.symbol, ev.ts, round(ev.value, 6) AS value,
         |       coalesce(round(b.close, 6), -1) AS bar_close,
         |       CAST(CASE WHEN b.datetime IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |         AS matched
         |FROM ev ASOF LEFT JOIN b
         |  ON ev.symbol = b.symbol AND ev.ts >= b.datetime
         |ORDER BY ev.event_id""".stripMargin) {
      (s, dir) => {
        val (ev, b) = asofSides(s, dir)
        Q.norm(
          asofJoinNative(ev, b, "symbol", "ts", "bar_time",
            payload = Seq("bar_time", "bar_close"), leftOuter = true)
            .select(col("event_id"), col("symbol"), col("ts"), col("value"),
              coalesce(col("bar_close"), lit(-1.0)).as("bar_close"),
              when(col("bar_time").isNull, 0L).otherwise(1L).as("matched")),
          "event_id")
      }
    },

    // a20c: a20b's as-of LEFT join SERVED from co-bucketed, (key, ts)-
    // sorted artifacts — the j2b pattern applied to the round-13 sf100
    // worst a-row (a20b 173.1 s, almost all exchange + disk sort, not
    // merge cost). Both sides persist ONCE per corpus fingerprint,
    // bucketed on symbol at the same size-scaled count and sorted
    // (symbol, ts) within buckets; AsOfJoinExec declares
    // ClusteredDistribution(symbol) + (symbol, ts) ordering, so with
    // one file per bucket the scans satisfy BOTH requirements and the
    // exec plans with zero Exchange and zero Sort (PlanShapeSpec pins
    // it). Same DuckDB ASOF LEFT JOIN oracle as a20b — the artifacts
    // are projections of the raw tables, so a stale or mis-bucketed
    // artifact is a hash mismatch.
    Q("a20c_asof_bucketed",
      s"""WITH ${Bars.cte},
         |ev AS (SELECT event_id, ${Bars.sqlSymbolFor("user_id")} AS symbol,
         |              ts, value
         |       FROM events),
         |b AS (SELECT symbol, datetime, close FROM bars)
         |SELECT ev.event_id, ev.symbol, ev.ts, round(ev.value, 6) AS value,
         |       coalesce(round(b.close, 6), -1) AS bar_close,
         |       CAST(CASE WHEN b.datetime IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |         AS matched
         |FROM ev ASOF LEFT JOIN b
         |  ON ev.symbol = b.symbol AND ev.ts >= b.datetime
         |ORDER BY ev.event_id""".stripMargin) {
      (s, dir) => {
        // Spark reports a bucketed scan's in-file sort as outputOrdering
        // only under spark.sql.legacy.bucketedTableScan.outputOrdering
        // (SPARK-28595 turned it off by default because multi-file
        // buckets interleave) — and even then ONLY when every bucket has
        // exactly one file, which ensureBucketedArtifact's pre-write
        // repartition guarantees and append paths (multiple files per
        // bucket) automatically fail, so the flag can never claim an
        // ordering the files don't have. Without it the exec's (key, ts)
        // requirement plans a partition-local sort over each scan — the
        // exact disk-resident sort that made a20b's sf100 row 173 s.
        // The flag is a SESSION-CONSTRUCTION setting (round-15 advice:
        // setting it here made later bucketed plans depend on query
        // order) — every harness session sets it at build time; library
        // callers who want the sort-free plan must do the same.
        val b = graft.ops.CoPurchase.buckets(s, dir)
        val fp = graft.sources.Layout
          .sourceFingerprint(s, s"$dir/events.parquet")
        val ev = graft.sources.Layout.ensureBucketedArtifact(s,
            s"graft_asofev_$fp", "symbol", b, Seq("symbol", "ts")) {
          Tables.events(s, dir).select(
            col("event_id"), Bars.symbolFor(col("user_id")).as("symbol"),
            col("ts"), col("value"))
        }
        val bars = graft.sources.Layout.ensureBucketedArtifact(s,
            s"graft_asofbar_$fp", "symbol", b, Seq("symbol", "bar_time")) {
          Bars(s, dir)
            .select(col("symbol"), col("datetime").as("bar_time"),
              col("close").as("bar_close"))
        }
        Q.norm(
          asofJoinNative(ev, bars, "symbol", "ts", "bar_time",
            payload = Seq("bar_time", "bar_close"), leftOuter = true)
            .select(col("event_id"), col("symbol"), col("ts"), col("value"),
              coalesce(col("bar_close"), lit(-1.0)).as("bar_close"),
              when(col("bar_time").isNull, 0L).otherwise(1L).as("matched")),
          "event_id")
      }
    },

    // a11: per-bar activity in the 5 minutes from bar open — a range
    // join (bars x events on a time interval) through the bucketized
    // equi-join, checked against DuckDB's plain inequality join.
    Q("a11_range_join",
      s"""WITH ${Bars.cte},
         |ev AS (SELECT ${Bars.sqlSymbolFor("user_id")} AS symbol, ts, value
         |       FROM events)
         |SELECT b.symbol, b.datetime, count(*) AS n_events,
         |       CAST(sum(CAST(ev.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         |FROM bars b JOIN ev
         |  ON ev.symbol = b.symbol AND ev.ts >= b.datetime
         | AND ev.ts < b.datetime + INTERVAL 5 MINUTE
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, dir) => {
        val b = Bars(s, dir).select(col("symbol"), col("datetime"))
        val ev = Tables.events(s, dir).select(
          Bars.symbolFor(col("user_id")).as("symbol"), col("ts"), col("value"))
        Q.norm(
          rangeJoin(b, ev, "symbol", "datetime", "ts", widthSec = 300L)
            .groupBy("symbol", "datetime")
            .agg(count(lit(1)).as("n_events"),
              sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum")),
          "symbol", "datetime")
      }
    })
}
