package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.Interop
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a native Catalyst
  * `AggregateWindowFunction` — the one operator in the reference's surface
  * that a plain SQL window aggregate cannot express (SURVEY.md §2.9).
  *
  * Semantics replicate pandas `Series.ewm(span/alpha, adjust=False).mean()`
  * as used by the reference indicators (reference
  * `streamlit_app/streamlit_app.py:165-166,181-182,187-190,200-203`):
  *
  *   y_0 = x_0;  y_t = alpha * x_t + (1 - alpha) * y_{t-1}
  *
  * NULL inputs carry the previous value forward and leading NULLs delay the
  * seed — exactly pandas behavior for series whose only NULLs are leading
  * (the only case the indicator cascade produces: `diff()` row 0, rolling
  * warm-ups). For *interior* NULLs pandas (`ignore_na=False`) renormalizes
  * relative weights; we deliberately carry instead, which keeps the fold a
  * single scalar recurrence and matches the engine's DuckDB oracle
  * (`list_reduce` fold) bit-for-bit. Interior NULLs only arise in degenerate
  * flat-window cases (documented deviation).
  *
  * Scale design: a `DeclarativeAggregate` over the running row frame —
  * WindowExec evaluates it with one O(1) buffer update per row, so a
  * 100 TB per-symbol cascade stays O(n) with no per-row list
  * materialization (contrast the `aggregate(collect_list(...))`
  * higher-order-function fallback, which is O(n^2) per partition).
  * The update expressions are pure Catalyst, so they run through the
  * generated MutableProjection like the built-in `Lag`/`Lead`.
  */
case class Ewma(child: Expression, alpha: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma"

  private def d(v: Double) = Literal(v, DoubleType)
  private val nullD = Literal(null, DoubleType)

  private lazy val acc = AttributeReference("ewma_acc", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override val initialValues: Seq[Expression] = Seq(nullD)
  override val updateExpressions: Seq[Expression] = Seq(
    CaseWhen(
      Seq(
        (IsNull(child), acc),   // NULL input: carry previous state
        (IsNull(acc), child)),  // first non-NULL input: seed y = x
      Add(Multiply(d(alpha), child), Multiply(d(1.0 - alpha), acc))))
  override val evaluateExpression: Expression = acc

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Ewma = copy(child = newChildren.head)
}

object Ewma {
  /** pandas `ewm(span=n, adjust=False).mean()` over partition/order:
    * alpha = 2 / (span + 1).
    */
  def span(c: Column, span: Int, partition: Seq[Column], order: Seq[Column]): Column =
    alpha(c, 2.0 / (span + 1.0), partition, order)

  /** pandas `ewm(alpha=a, adjust=False).mean()` over partition/order.
    *
    * Builds the Catalyst `WindowExpression` directly instead of
    * `Column.over`: Spark 4.1's ColumnNode->Expression conversion of
    * `Window(ExpressionColumnNode(...), spec)` leaves the window function
    * naked under a wrapper node, which CheckAnalysis rejects with
    * WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE (verified empirically against
    * built-in `RowNumber` too). Direct construction is the supported path
    * for custom window expressions.
    */
  def alpha(c: Column, a: Double, partition: Seq[Column], order: Seq[Column]): Column =
    Interop.column(
      WindowExpression(
        Ewma(Interop.expression(c), a),
        WindowSpecDefinition(
          partition.map(Interop.expression),
          order.map(Interop.expression(_) match {
            case s: SortOrder => s
            case e => SortOrder(e, Ascending)
          }),
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))))
}
