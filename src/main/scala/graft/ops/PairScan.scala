package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** The pair-window families (w16 rolling Pearson, t6 z-score) as a
  * KEY-COUNT-INDEPENDENT chunked replay — [[DashboardScan]]'s two-pass
  * design specialized to the leg-aligned (x, y) cents series.
  *
  * Why: both queries window `partitionBy(pair)`, and a small watchlist
  * has FEW pairs — at deep history the WindowExec serializes onto
  * C(symbols, 2) tasks no matter how many cores exist (the exact shape
  * w17 had before IchimokuScan). Here every rolling quantity is an
  * EXACT INTEGER sufficient statistic over a bounded 20-row frame
  * (n, Σx, Σy, Σxy, Σx², Σy² in cents), so the replay is bit-exact —
  * a 19-row warm-up tail fully determines every emitted row; there is
  * no EMA truncation caveat at all.
  *
  * One scan serves BOTH queries: the emitted statistics columns feed
  * w16's Pearson and t6's spread z-score as ordinary Catalyst
  * expressions (Σs = Σx−Σy, Σs² = Σx²−2Σxy+Σy² — integer identities),
  * identical to the expressions the window arm applies after its
  * WindowExec, so both tiers answer the same oracle.
  *
  * Scale: two passes over the joined series (the range-shuffle map
  * stage is shared), O(partitions · 19) driver bytes for the boundary
  * composition, parallelism = partition count, flat in pair count.
  */
object PairScan {

  /** Rows of warm-up context per partition boundary at the DEFAULT
    * frame: the frame is [[DefaultFrame]] rows, so frame−1 prior rows
    * fully seed it. [[stats]] derives its warm-up from the `frame`
    * argument; this constant exists only through [[DefaultFrame]], so it
    * cannot drift from the actual warm-up. */
  val WarmLen = 19

  /** The 20-row frame every pair-stats caller uses ([[WarmLen]] + 1 —
    * defined this way round so the two constants cannot disagree). */
  val DefaultFrame = WarmLen + 1

  private val statsSchema = StructType(Seq(
    StructField("pair", StringType), StructField("datetime", TimestampType),
    StructField("x", LongType), StructField("y", LongType),
    StructField("n", LongType),
    StructField("sx", LongType), StructField("sy", LongType),
    StructField("sxy", LongType), StructField("sxx", LongType),
    StructField("syy", LongType)))

  private final case class Tail(
      firstKey: String, keys: Array[String],
      xs: Array[Long], ys: Array[Long])

  /** 20-row rolling integer statistics over the (pair, datetime)-sorted
    * chunked series. `xy` must have columns (pair, datetime, x, y) with
    * x/y integral cents. */
  def stats(spark: SparkSession, xy: DataFrame, frame: Int = DefaultFrame,
      numPartitions: Int = 0): DataFrame = {
    require(frame >= 2, s"frame must be >= 2 (warm-up is frame-1 rows), got $frame")
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sorted = xy.select(col("pair"), col("datetime"),
        col("x").cast("long"), col("y").cast("long"))
      .repartitionByRange(n, col("pair"), col("datetime"))
      .sortWithinPartitions("pair", "datetime")
    val rdd = sorted.rdd // shared lineage across both passes
    val warm = frame - 1

    // pass 1: per-partition trailing warm-up rows
    val tails: Map[Int, Tail] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val keys = new Array[String](warm)
      val xs = new Array[Long](warm)
      val ys = new Array[Long](warm)
      var pos = 0; var size = 0; var firstKey: String = null
      it.foreach { r =>
        val k = r.getString(0)
        if (firstKey == null) firstKey = k
        keys(pos) = k; xs(pos) = r.getLong(2); ys(pos) = r.getLong(3)
        pos = (pos + 1) % warm; if (size < warm) size += 1
      }
      if (firstKey == null) Iterator.empty
      else {
        val ord = (0 until size).map(k => (pos - size + k + 2 * warm) % warm)
        Iterator((pid, Tail(firstKey,
          ord.map(keys).toArray, ord.map(xs).toArray, ord.map(ys).toArray)))
      }
    }.collect().toMap

    // driver composition: the incoming warm-up rows for each partition's
    // FIRST key (range partitioning keeps any non-first key's entire
    // earlier history out of earlier partitions — the DashboardScan walk)
    val incoming: Array[Array[(Long, Long)]] = Array.tabulate(n) { p =>
      tails.get(p).map(_.firstKey) match {
        case None => Array.empty[(Long, Long)]
        case Some(fk) =>
          val acc = new ArrayBuffer[(Long, Long)]
          var q = p - 1
          var continue = true
          while (continue && q >= 0 && acc.length < warm) {
            tails.get(q) match {
              case None => // empty partition: keep walking
              case Some(t) =>
                var i = t.keys.length - 1
                val run = new ArrayBuffer[(Long, Long)]
                while (i >= 0 && t.keys(i) == fk) {
                  run.prepend((t.xs(i), t.ys(i))); i -= 1
                }
                acc.prependAll(run)
                if (run.length < t.keys.length || t.keys.length == warm)
                  continue = false
            }
            q -= 1
          }
          acc.takeRight(warm).toArray
      }
    }
    val bcIn = spark.sparkContext.broadcast(incoming)

    // pass 2: sequential replay — integer ring + running sums (adds and
    // subtracts of longs: exact, order-free)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: String = null
      val rx = new Array[Long](frame); val ry = new Array[Long](frame)
      var pos = 0; var cnt = 0
      var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L; var syy = 0L
      def reset(): Unit = { pos = 0; cnt = 0; sx = 0; sy = 0; sxy = 0; sxx = 0; syy = 0 }
      def push(x: Long, y: Long): Unit = {
        if (cnt == frame) {
          val ox = rx(pos); val oy = ry(pos)
          sx -= ox; sy -= oy; sxy -= ox * oy; sxx -= ox * ox; syy -= oy * oy
        } else cnt += 1
        rx(pos) = x; ry(pos) = y
        sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
        pos = (pos + 1) % frame
      }
      it.map { r =>
        val k = r.getString(0)
        if (k != curKey) {
          reset()
          if (curKey == null) bcIn.value(pid).foreach { case (x, y) => push(x, y) }
          curKey = k
        }
        val x = r.getLong(2); val y = r.getLong(3)
        push(x, y)
        Row(k, r.get(1), x, y, cnt.toLong, sx, sy, sxy, sxx, syy)
      }
    }
    spark.createDataFrame(outRdd, statsSchema)
  }
}
