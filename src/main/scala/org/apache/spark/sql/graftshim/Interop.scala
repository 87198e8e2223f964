package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 keeps `Column <-> Expression` conversion
  * `private[sql]` (the Connect refactor made `Column` wrap a ColumnNode),
  * so the engine exposes exactly the two conversions it needs from inside
  * the `org.apache.spark.sql` namespace — the same approach third-party
  * Spark extensions use.
  */
object Interop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function on a LIVE session's registry (the extensions
    * mechanism only applies at session build; `sessionState` is
    * `private[sql]`, hence this shim).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]` — the standard entry point every Spark extension
    * uses for custom operators).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes, for
    * building custom plan nodes on top).
    */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy to a LIVE session (the
    * extensions path — `injectPlannerStrategy` — covers configured
    * sessions; this covers ones that already exist).
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = synchronized {
    // idempotent within extraStrategies (synchronized: the read-append
    // pair below would otherwise race). A session configured with
    // spark.sql.extensions=GraftExtensions holds the strategy in the
    // injected planner list instead, which this cannot see — the cost
    // of the resulting double registration is one extra no-op pattern
    // match per plan node, never a wrong plan (both copies produce the
    // same candidate and the planner picks the first).
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
