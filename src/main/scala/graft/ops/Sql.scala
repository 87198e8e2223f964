package graft.ops

/** DuckDB oracle-SQL fragments mirroring [[Rolling]] and
  * [[graft.functions.Ewma]] *bit-for-bit*.
  *
  * Cross-engine determinism rules (see SURVEY.md §7.4.4):
  *   - Window folds (rolling mean, EWMA) are written as `list_reduce`
  *     sequential folds so the floating-point accumulation order matches
  *     Spark's WindowExec (which replays each frame in row order). A plain
  *     DuckDB `avg(...) OVER ...` would use segment-tree combination and
  *     diverge in the last ulps.
  *   - Rolling min/max/count are exact (no fp accumulation) and use native
  *     window aggregates.
  *   - Every query's final projection rounds doubles to 6 dp on BOTH sides.
  */
object Sql {
  val w = "PARTITION BY symbol ORDER BY datetime"
  /** whole-partition window, e.g. `lag(x) OVER (...)`. */
  val over = s"OVER ($w)"
  /** trailing row frame of n rows. */
  def fr(n: Int) = s"OVER ($w ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
  val run = s"OVER ($w ROWS UNBOUNDED PRECEDING)"

  /** pandas rolling(n).mean with min_periods — sequential-sum fold / n. */
  def rollMean(x: String, n: Int): String =
    s"CASE WHEN count($x) ${fr(n)} >= $n THEN list_reduce(list($x) ${fr(n)}, (acc, v) -> acc + v) / $n.0 END"

  def rollMin(x: String, n: Int): String =
    s"CASE WHEN count($x) ${fr(n)} >= $n THEN min($x) ${fr(n)} END"

  def rollMax(x: String, n: Int): String =
    s"CASE WHEN count($x) ${fr(n)} >= $n THEN max($x) ${fr(n)} END"

  /** pandas ewm(span=n, adjust=False).mean — alpha written as the same
    * IEEE division Spark computes (`2.0/(span+1)`). */
  def ewmaSpan(x: String, span: Int): String = ewma(x, s"2.0/${span + 1}.0")

  /** pandas ewm(alpha=a, adjust=False).mean as a sequential scalar fold;
    * NULL inputs carry, leading NULLs delay the seed — identical to
    * [[graft.functions.Ewma]]. */
  def ewma(x: String, a: String): String =
    s"list_reduce(list($x) $run, (acc, v) -> CASE WHEN v IS NULL THEN acc WHEN acc IS NULL THEN v ELSE ($a)*v + (1.0-($a))*acc END)"

  def lag(x: String): String = s"lag($x) $over"
  def diff(x: String): String = s"($x - lag($x) $over)"
  def diffK(x: String, k: Int): String = s"($x - lag($x, $k) $over)"
}
