package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the custom-operator tier of the engine: a
  * `LogicalPlan` node, a planner `Strategy`, and a `SparkPlan` physical
  * operator registered per-session, the extension path Spark provides
  * for whole-operator semantics the built-ins can't express
  * (SURVEY.md §7.3; the composed alternative is `ops/AsOf.asofJoin`'s
  * union+window trick, which this operator beats by not materializing
  * the unioned schema or running window state over the probe rows).
  *
  * Physical contract (what makes it correct at 1000 executors):
  *   - `requiredChildDistribution` clusters BOTH children on the join
  *     key — EnsureRequirements inserts compatible hash exchanges
  *     exactly as it does for SortMergeJoin, so the operator never sees
  *     rows for one key split across partitions.
  *   - `requiredChildOrdering` asks for (key, ts) ascending on both
  *     sides — the planner reuses existing sorts when upstream already
  *     provides them.
  *   - Each partition then merges the two sorted streams in one O(|L|+|R|)
  *     pass with O(1) state: the latest right row at-or-before the
  *     current left row's ts. No buffering of either side, ever — the
  *     100 TB profile is the same two shuffles + sorts a single
  *     sort-merge join costs.
  *
  * Inner as-of semantics (DuckDB `ASOF JOIN`): left rows with no
  * at-or-before right row are dropped; with `isLeftOuter` they survive
  * with a null payload (DuckDB `ASOF LEFT JOIN`).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    isLeftOuter: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) payload.map(_.withNullability(true)) else payload)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute],
    isLeftOuter: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) payload.map(_.withNullability(true)) else payload)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // one row in -> at most one row out, in input order: the left child's
  // partitioning AND ordering survive, so downstream per-key operators
  // plan zero additional exchanges
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val (lOut, rOut) = (left.output, right.output)
    val (lKeyIdx, lTsIdx) = (lOut.indexWhere(_.exprId == leftKey.exprId),
      lOut.indexWhere(_.exprId == leftTs.exprId))
    val (rKeyIdx, rTsIdx) = (rOut.indexWhere(_.exprId == rightKey.exprId),
      rOut.indexWhere(_.exprId == rightTs.exprId))
    val (keyType, tsType) = (leftKey.dataType, leftTs.dataType)
    val payloadAttrs = payload
    val outAttrs = output

    val outer = isLeftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      // bind the result against NULLABLE payload slots when outer —
      // BoundReference takes nullability from the input schema, and a
      // non-nullable binding would read the null-payload row as 0/""
      val payloadIn =
        if (outer) payloadAttrs.map(_.withNullability(true)) else payloadAttrs
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadIn)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val nullPayload = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(payloadAttrs.length)

      new Iterator[InternalRow] {
        // lookahead right row not yet consumed, and the current
        // candidate (latest right row with candKey, ts <= left ts)
        private var rNext: InternalRow = _
        private var cand: InternalRow = _
        private var candKey: Any = _
        private var nextOut: InternalRow = _

        private def readRight(): Unit =
          rNext = if (rIter.hasNext) rIter.next() else null

        @annotation.tailrec
        private def advance(): Unit = {
          if (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            // NULL key/ts on the left can never match (SQL join
            // semantics): drop under inner, null-extend under outer
            if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)) {
              if (outer) {
                numOutputRows += 1
                nextOut = resultProj(joined(l, nullPayload))
              }
            } else {
              val lk = l.get(lKeyIdx, keyType)
              val lt = l.get(lTsIdx, tsType)
              // pull right rows up to (lk, lt); the last one with
              // key == lk becomes the candidate
              var stop = false
              while (!stop) {
                if (rNext == null) readRight()
                if (rNext == null) stop = true
                // NULL-keyed/ts right rows match nothing: skip (they
                // sort NULLS FIRST, so they drain before real keys)
                else if (rNext.isNullAt(rKeyIdx) || rNext.isNullAt(rTsIdx)) {
                  rNext = null
                } else {
                  val cmp = keyOrd.compare(rNext.get(rKeyIdx, keyType), lk)
                  if (cmp < 0) { rNext = null } // behind every remaining left key
                  else if (cmp == 0 &&
                      tsOrd.compare(rNext.get(rTsIdx, tsType), lt) <= 0) {
                    // copy the row and read the key back from OUR copy:
                    // object-typed keys (UTF8String) read from l or
                    // rNext alias iterator-owned buffers that the next
                    // next() overwrites (sort-spill readers and codegen
                    // stages reuse row memory)
                    cand = rNext.copy()
                    candKey = cand.get(rKeyIdx, keyType)
                    rNext = null
                  } else stop = true // right is ahead; candidate stands
                }
              }
              if (cand != null && keyOrd.compare(candKey, lk) == 0) {
                numOutputRows += 1
                nextOut = resultProj(joined(l, payloadProj(cand)))
              } else if (outer) {
                numOutputRows += 1
                nextOut = resultProj(joined(l, nullPayload))
              }
            }
            advance() // left row had no match (inner): try the next one
          }
        }

        override def hasNext: Boolean = { advance(); nextOut != null }
        override def next(): InternalRow = {
          advance()
          val out = nextOut; nextOut = null; out
        }
      }
    }
  }
}
