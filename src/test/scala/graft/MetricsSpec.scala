package graft

import graft.ops.Metrics
import org.apache.spark.sql.functions._

/** `observe` contract: metrics ride the plan's own execution — one scan,
  * no second job — and report exact counts.
  */
class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("observed: null counters and row count from the pipeline's own action") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some("c"), None),
      (4L, None, None)
    ).toDF("id", "s", "x")
    val (instrumented, obs) = Metrics.observed(df, Seq("s", "x"))
    // the action the pipeline would run anyway
    assert(instrumented.where(col("id") > 0).collect().length == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("s_nulls") == 2L)
    assert(m("x_nulls") == 2L)
  }
}
