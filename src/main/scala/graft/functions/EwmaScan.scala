package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed EMA via a two-phase parallel prefix scan — the 100 TB path
  * for ordered series whose PER-KEY cardinality exceeds one executor
  * ([[Ewma]] runs inside a single WindowExec partition per key, which is
  * the right plan for many-symbols/modest-history but serializes when one
  * key holds billions of rows).
  *
  * The recurrence y_t = a*x_t + (1-a)*y_{t-1} is a linear (affine) map per
  * element, and affine maps compose associatively — the classic scan
  * trick. Phase 1 computes, per range-partition, the composed affine
  * effect of its trailing key-run (A, B) plus the locally-seeded value S;
  * the driver folds the O(#partitions) summaries in order to produce each
  * partition's incoming state; phase 2 replays each partition sequentially
  * from its incoming scalar. Work O(n), depth O(n / #partitions), two
  * passes over the data, no shuffle beyond the range partitioning.
  *
  * NOT bit-identical to the sequential fold: carrying state across a
  * partition boundary via the composed (A, B) reassociates floating-point
  * adds — parallel scans necessarily do. Agreement is to ~1e-12 relative
  * (spec-checked against [[Ewma]]); use the window form where oracle
  * bit-parity matters, this form where single-key scale does.
  */
object EwmaScan {

  /** Affine summary of one partition's trailing run of `lastKey`:
    * y_out = A*y_in + B once seeded upstream; S if upstream is unseeded
    * and this run saw a value; unseeded passthrough otherwise.
    */
  private final case class Part(
      firstKey: String, lastKey: String,
      a: Double, b: Double, hasVal: Boolean, s: Double, nonEmpty: Boolean)

  /** Adds `outCol` = per-`key` EMA of `valueCol` in `timeCol` order.
    * Input may be any partitioning; output is range-partitioned by
    * (key, time).
    */
  def apply(df: DataFrame, alpha: Double, keyCol: String, timeCol: String,
      valueCol: String, outCol: String = "ema",
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, col(keyCol), col(timeCol))
      .sortWithinPartitions(keyCol, timeCol)
    val schema = sorted.schema
    val ki = schema.fieldIndex(keyCol)
    val vi = schema.fieldIndex(valueCol)

    // phase 1: per-partition trailing-run summaries
    val summaries: Array[(Int, Part)] = sorted.rdd.mapPartitionsWithIndex {
      (pid, it) =>
        var first: String = null
        var last: String = null
        var a = 1.0; var b = 0.0; var hasVal = false; var s = 0.0
        var nonEmpty = false
        it.foreach { r =>
          nonEmpty = true
          val k = String.valueOf(r.get(ki))
          if (first == null) first = k
          if (k != last) { last = k; a = 1.0; b = 0.0; hasVal = false; s = 0.0 }
          if (!r.isNullAt(vi)) {
            val x = r.getDouble(vi)
            a *= (1 - alpha); b = alpha * x + (1 - alpha) * b
            s = if (hasVal) alpha * x + (1 - alpha) * s else x
            hasVal = true
          }
        }
        if (nonEmpty) Iterator((pid, Part(first, last, a, b, hasVal, s, nonEmpty)))
        else Iterator.empty
    }.collect().sortBy(_._1)

    // driver fold: incoming state per partition (None = unseeded)
    val incoming = Array.fill[Option[Double]](n)(None)
    var carryKey: String = null
    var carry: Option[Double] = None
    summaries.foreach { case (pid, p) =>
      incoming(pid) = if (p.firstKey == carryKey) carry else None
      val into = if (p.lastKey == carryKey && p.firstKey == p.lastKey) carry else None
      carryKey = p.lastKey
      carry = (into, p.hasVal) match {
        case (Some(y), true) => Some(p.a * y + p.b)
        case (Some(y), false) => Some(y)
        case (None, true) => Some(p.s)
        case (None, false) => None
      }
    }
    val bcIncoming = spark.sparkContext.broadcast(incoming.toSeq)

    // phase 2: sequential replay per partition from the incoming scalar
    val outSchema = StructType(schema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val outRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var last: String = null
      var state: Option[Double] = None
      it.map { r =>
        val k = String.valueOf(r.get(ki))
        if (last == null) {
          last = k
          state = bcIncoming.value(pid)
        } else if (k != last) { last = k; state = None }
        if (!r.isNullAt(vi)) {
          val x = r.getDouble(vi)
          state = Some(state.fold(x)(y => alpha * x + (1 - alpha) * y))
        }
        Row.fromSeq(r.toSeq :+ state.orNull)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
