package graft

import graft.ops.{Core, Indicators, Rolling, Strategies}
import graft.sources.Bars
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property/invariant specs for the operator surface (SURVEY.md §5.3). */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val bars: DataFrame = Bars(spark, sf).cache()

  test("bars: one row per (symbol, datetime); high >= low; volume > 0") {
    val n = bars.count()
    assert(n > 0)
    assert(bars.select("symbol", "datetime").distinct().count() == n)
    assert(bars.where(col("high") < col("low")).count() == 0)
    assert(bars.where(col("volume") <= 0).count() == 0)
    assert(bars.where(!col("open").between(col("low"), col("high"))).count() == 0)
    assert(bars.where(!col("close").between(col("low"), col("high"))).count() == 0)
  }

  test("p5 indicator agrees with sign(close - open) and is closed over {BUY,SELL,HOLD}") {
    val scored = Core.scored(spark, sf)
    assert(scored.where(!col("indicator").isin("BUY", "SELL", "HOLD")).count() == 0)
    assert(scored.where(
      (col("close") > col("open") && col("indicator") =!= "BUY") ||
      (col("close") < col("open") && col("indicator") =!= "SELL") ||
      (col("close") === col("open") && col("indicator") =!= "HOLD")).count() == 0)
  }

  test("rolling mean: NULL for first n-1 rows, equals hand-sliced mean after") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 16.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }.toDF("symbol", "datetime", "x")
    val got = df.withColumn("m", Rolling.mean(col("x"), 3))
      .orderBy("datetime").select("m").as[Option[Double]].collect().toSeq
    assert(got(0).isEmpty && got(1).isEmpty)
    got.drop(2).zipWithIndex.foreach { case (g, i) =>
      val want = xs.slice(i, i + 3).sum / 3.0
      assert(math.abs(g.get - want) < 1e-12)
    }
  }

  test("rsi is in [0, 100] where defined") {
    val rsi = Indicators.withRsi(bars).select("rsi").as[Option[Double]].collect()
    assert(rsi.flatten.forall(v => v >= 0.0 && v <= 100.0))
    assert(rsi.flatten.nonEmpty)
  }

  test("t1 scalping signal is identically 0 (the as-written quirk, SURVEY §2.5)") {
    // rolling windows INCLUDE the current row, so close < min(close) and
    // close > max(close) are unsatisfiable — replicated faithfully.
    val s = Strategies.scalping(bars)
    assert(s.where(col("signal") =!= 0).count() == 0)
  }

  test("w12-w15: atr >= 0; stochastic in [0,100]; obv starts at 0; drawdown <= 0") {
    val atr = Indicators.withAtr(bars)
    assert(atr.where(col("atr") < 0).count() == 0)

    // 1-ulp headroom: 100*(close-ll)/(hh-ll) lands at 100.00000000000001
    // when close == hh — identical on both engines, erased by the 6-dp gate
    val st = Indicators.withStochastic(bars)
    assert(st.where(col("stoch_k") < -1e-9 || col("stoch_k") > 100 + 1e-9).count() == 0)
    assert(st.where(col("stoch_d") < -1e-9 || col("stoch_d") > 100 + 1e-9).count() == 0)
    // %D is NULL until 3 non-null %K values have accumulated: Rolling.mean's
    // count(stoch_k) >= 3 gate means a non-null %D implies the current %K
    // (the frame's newest row) is itself non-null — the strict form holds.
    assert(st.where(col("stoch_d").isNotNull && col("stoch_k").isNull).count() == 0)

    val obv = graft.SparkEntry.queries("w14_obv")(spark, sf)
    val firstPerSym = obv.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("symbol").orderBy("datetime")))
      .where(col("rn") === 1)
    assert(firstPerSym.where(col("obv") =!= 0L).count() == 0)

    val dd = graft.SparkEntry.queries("w15_drawdown")(spark, sf)
    assert(dd.where(col("drawdown") > 0).count() == 0)
    assert(dd.where(col("close") > col("peak")).count() == 0)
  }

  test("w16 pair correlation is in [-1, 1] (1-ulp headroom) and engages") {
    val corr = graft.SparkEntry.queries("w16_pair_corr")(spark, sf)
    assert(corr.where(col("corr20") < -1 - 1e-9 || col("corr20") > 1 + 1e-9).count() == 0)
    // sf0.001's aligned AAPL/MSFT grid can be shorter than the 20-bar
    // window; non-vacuity on a synthetic aligned series instead
    val ds = (0 until 30).map { i =>
      val dt = java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00")
      ("P", dt, 100L + i, 200L + 3 * i)
    }.toDF("pair", "datetime", "x", "y")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("pair").orderBy("datetime").rowsBetween(-19, 0)
    val n = count(lit(1)).over(win)
    val sx = sum(col("x")).over(win); val sy = sum(col("y")).over(win)
    val sxy = sum(col("x") * col("y")).over(win)
    val sxx = sum(col("x") * col("x")).over(win)
    val syy = sum(col("y") * col("y")).over(win)
    val got = ds.select(
      when(n === 20, (n * sxy - sx * sy) /
        (sqrt((n * sxx - sx * sx).cast("double")) * sqrt((n * syy - sy * sy).cast("double"))))
        .as("c")).where(col("c").isNotNull).as[Double].collect()
    assert(got.length == 11 && got.forall(v => math.abs(v - 1.0) < 1e-12),
      s"perfectly linear series should correlate at 1.0, got ${got.take(3).toSeq}")
  }

  test("t6 pairs z-score: signal closed over {-1,0,1}; fired rows clear the z2 floor") {
    val t6 = graft.SparkEntry.queries("t6_pairs_zscore")(spark, sf)
    assert(t6.where(!col("signal").isin(-1L, 0L, 1L)).count() == 0)
    // |z| > 2 <=> z^2*1000 > 4000; milli_z2 is the FLOOR of z^2*1000, so
    // a fired row can sit exactly AT 4000 (dev^2*1000 = 4000*var + eps)
    assert(t6.where(col("signal") =!= 0L && col("milli_z2") < 4000L).count() == 0)
    // direction: wide spread shorts (-1 means n*s - sm > 0)
    assert(t6.count() > 0)
  }

  test("heikin-ashi: ha_high >= max(open, close) of the original bar") {
    val ha = graft.ops.Charts.heikinAshi(bars)
    assert(ha.where(col("ha_high") < greatest(col("open"), col("close"))).count() == 0)
  }

  test("a3 latest snapshot has exactly one row per symbol, the max-datetime one") {
    val scored = Core.scored(spark, sf)
    val snap = scored.groupBy("symbol").agg(
      max_by(col("close"), col("datetime")).as("price"))
    val manual = scored.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("symbol").orderBy(col("datetime").desc)))
      .where(col("rn") === 1).select(col("symbol"), col("close").as("price"))
    assert(snap.except(manual).count() == 0 && manual.except(snap).count() == 0)
  }

  test("sessionize: sessions are disjoint, gap-separated, and cover all events") {
    val sess = graft.ops.Cube.queries.find(_.name == "a6_sessionize").get
      .build(spark, sf).collect()
    assert(sess.nonEmpty)
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(sess.map(_.getAs[Long]("n_events")).sum == events)
    // within a user, consecutive sessions are separated by > 1800s
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("session_no"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = (b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime) / 1000
          assert(gap > 1800, s"gap $gap between sessions")
        case _ =>
      }
    }
  }

  test("asofJoin: picks the LATEST right row at-or-before each left ts, per key") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // (sym, t, id)
      ("A", 5L, 1), // before first quote -> dropped (inner as-of)
      ("A", 10L, 2), // exactly at quote -> inclusive match
      ("A", 25L, 3), // between 20 and 30 -> 20
      ("A", 99L, 4), // after last -> 30
      ("B", 14L, 5), // before B's only quote -> dropped
      ("B", 16L, 6)).toDF("sym", "tt", "id")
    val got = graft.ops.AsOf.asofJoin(trades, quotes, "sym", "tt", "qt",
        payload = Seq("qt", "px"))
      .orderBy("id").select("id", "qt", "px").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((2, 10L, 1.0), (3, 20L, 2.0), (4, 30L, 3.0), (6, 15L, 9.0)))
  }

  test("rangeJoin: [t, t+w) boundaries exact, matches across bucket edges") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("A", ts("2024-01-01 10:04:00"), 1)) // bucket straddle: window crosses 10:05
      .toDF("sym", "lt", "lid")
    val right = Seq(
      ("A", ts("2024-01-01 10:03:59"), 10), // before window -> out
      ("A", ts("2024-01-01 10:04:00"), 11), // inclusive lower bound
      ("A", ts("2024-01-01 10:06:30"), 12), // next 5-min bucket, inside window
      ("A", ts("2024-01-01 10:09:00"), 13), // exclusive upper bound (lt+300s) -> out
      ("B", ts("2024-01-01 10:04:30"), 14)) // other key -> out
      .toDF("sym", "rt", "rid")
    val got = graft.ops.AsOf.rangeJoin(left, right, "sym", "lt", "rt", widthSec = 300L)
      .select("rid").as[Int].collect().sorted
    assert(got.toSeq == Seq(11, 12))
  }
}
