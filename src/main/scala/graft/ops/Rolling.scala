package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-symbol ordered rolling primitives with pandas `min_periods=window`
  * semantics: every rolling op yields NULL until the frame holds `n`
  * non-NULL observations (SURVEY.md §2.3 A5 / §7.4.2; pandas default
  * `rolling(n)` behavior throughout reference
  * `streamlit_app/streamlit_app.py:169-257`).
  *
  * Scale design: all ops share `W = partitionBy(symbol).orderBy(datetime)`,
  * so Catalyst plans the whole indicator cascade as consecutive Window
  * operators over ONE hash shuffle on `symbol` and one sort — adding more
  * indicator columns adds zero extra shuffles. Frames are row-bounded and
  * small (<= 26 rows), so per-row cost is O(frame) with no state blowup.
  */
object Rolling {
  /** The recurring per-symbol event-time frame (SURVEY.md §2.4). */
  val W: WindowSpec = Window.partitionBy("symbol").orderBy("datetime")

  def frame(n: Int): WindowSpec = W.rowsBetween(-(n - 1), 0)

  /** pandas `rolling(n).mean()` (NULL for the first n-1 rows). */
  def mean(c: Column, n: Int): Column =
    when(count(c).over(frame(n)) >= n, avg(c).over(frame(n)))

  /** pandas `rolling(n).min()`. */
  def rmin(c: Column, n: Int): Column =
    when(count(c).over(frame(n)) >= n, min(c).over(frame(n)))

  /** pandas `rolling(n).max()`. */
  def rmax(c: Column, n: Int): Column =
    when(count(c).over(frame(n)) >= n, max(c).over(frame(n)))

  /** pandas `diff(k)`: NULL on the first k rows of each symbol. */
  def diff(c: Column, k: Int = 1): Column = c - lag(c, k).over(W)

  /** pandas `shift(1)` within the symbol frame. */
  def lag1(c: Column): Column = lag(c, 1).over(W)
}
