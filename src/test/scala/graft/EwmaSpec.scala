package graft

import graft.functions.Ewma
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** W1 EMA semantics vs the pandas recurrence
  * `ewm(span/alpha, adjust=False).mean()` (reference
  * `streamlit_app/streamlit_app.py:165-166`): y_0 = x_0,
  * y_t = a*x_t + (1-a)*y_{t-1}.
  */
class EwmaSpec extends SparkTestBase {
  import spark.implicits._

  private def emaCol(span: Int) =
    Ewma.span(col("x"), span, Seq(col("g")), Seq(col("i")))

  private def run(xs: Seq[Option[Double]], span: Int): Seq[Option[Double]] =
    xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "i", "x")
      .withColumn("ema", emaCol(span))
      .orderBy("i").select("ema").as[Option[Double]].collect().toSeq

  private def oracle(xs: Seq[Option[Double]], alpha: Double): Seq[Option[Double]] =
    xs.scanLeft(Option.empty[Double]) {
      case (None, None) => None
      case (None, Some(x)) => Some(x)        // seed
      case (Some(y), None) => Some(y)        // carry
      case (Some(y), Some(x)) => Some(alpha * x + (1 - alpha) * y)
    }.tail

  test("matches hand-computed pandas values (span=2)") {
    // pandas: s.ewm(span=2, adjust=False).mean() on [10, 11, 9, 14]
    // -> [10.0, 10.666666666666666, 9.555555555555555, 12.518518518518519]
    val got = run(Seq(10.0, 11.0, 9.0, 14.0).map(Some(_)), 2).flatten
    val want = Seq(10.0, 10.666666666666666, 9.555555555555555, 12.518518518518519)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("leading nulls delay the seed; interior nulls carry") {
    val got = run(Seq(None, None, Some(4.0), None, Some(8.0)), 3)
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(got(2).contains(4.0))
    assert(got(3).contains(4.0))
    assert(got(4).contains(0.5 * 8.0 + 0.5 * 4.0))
  }

  test("property: equals the scalar recurrence for arbitrary series") {
    // scalacheck generator driven manually (scalatestplus bridge is not in
    // the offline cache); fixed seeds keep the cases reproducible.
    val series = Gen.listOfN(20, Gen.option(Gen.choose(-1e3, 1e3)))
    (1L to 10L).foreach { s =>
      val xs = series.apply(Gen.Parameters.default, Seed(s)).get
      val span = 5
      val got = run(xs, span)
      val want = oracle(xs, 2.0 / (span + 1))
      got.zip(want).foreach {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-9)
        case (g, w) => assert(g == w)
      }
    }
  }

  test("partitions are independent (two symbols interleaved)") {
    val df = Seq(("a", 1, 10.0), ("b", 1, 100.0), ("a", 2, 20.0), ("b", 2, 200.0))
      .toDF("g", "i", "x")
      .withColumn("ema", emaCol(1)) // span 1 -> alpha 1 -> ema == x
      .orderBy("g", "i").select("ema").as[Double].collect().toSeq
    assert(df == Seq(10.0, 20.0, 100.0, 200.0))
  }

  test("EwmaScan: distributed prefix scan agrees with the window fold across partition boundaries") {
    import graft.sources.Bars
    val bars = Bars(spark, sf)
    val alpha = 2.0 / 6.0 // span 5
    val ref = bars.withColumn("ema",
        Ewma.span(col("close"), 5, Seq(col("symbol")), Seq(col("datetime"))))
      .select("symbol", "datetime", "ema")
      .orderBy("symbol", "datetime").collect()
    // 7 range partitions: symbol runs are forced to span boundaries
    val scan = graft.functions.EwmaScan(bars, alpha, "symbol", "datetime", "close",
        numPartitions = 7)
      .select("symbol", "datetime", "ema")
      .orderBy("symbol", "datetime").collect()
    assert(ref.length == scan.length && ref.nonEmpty)
    ref.zip(scan).foreach { case (a, b) =>
      val (x, y) = (a.getDouble(2), b.getDouble(2))
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
        s"${a.get(0)}/${a.get(1)}: window=$x scan=$y")
    }
  }
}
