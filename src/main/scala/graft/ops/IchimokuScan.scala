package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** w17 Ichimoku as a KEY-COUNT-INDEPENDENT two-phase scan — the
  * [[DashboardScan]] pattern extended with LOOK-AHEAD composition
  * (round-11 task 1: the standalone window indicators inherit the
  * flagship's history-depth-adaptive tier).
  *
  * Why w17 specifically needs its own scan: the window tier is one
  * per-symbol Window cascade, and with 3 symbols the sort plus every
  * WindowExec serializes ~n/3 rows onto 3 tasks (40.2 s at sf10 — the
  * round-10 verdict's one weak row). Unlike the dashboard cascade,
  * Ichimoku also reads the FUTURE: `chikou = lead(close, 26)`, so the
  * chunked replay needs both an incoming warm-up tail (rows BEFORE the
  * chunk, for the 9/26/52-bar frames and the 26-bar lag of derived
  * midlines) and an outgoing look-ahead head (the next 26 same-key rows
  * AFTER the chunk, for the lead). Both are O(chunks · bounded-window)
  * driver bytes.
  *
  * Exactness: BIT-EXACT against the window tier — every input to every
  * output is a bounded frame (longest dependency: senkou lines lag a
  * 52-bar midpoint by 26 rows = 78 raw rows), `WarmLen` covers it
  * completely, and each emitted double is produced by the identical
  * IEEE expression ((max+min)/2, (tenkan+kijun)/2) on the identical
  * operands. No EMA, so none of DashboardScan's warm-up-truncation
  * caveat applies. `IchimokuScanSpec` pins equality (exact, not 1e-9)
  * across adversarial partitionings.
  *
  * Mechanics per partition (pass 2): a single O(1)-state machine —
  *   - 52-slot (high, low) ring → tenkan/kijun/span_b midpoints with
  *     pandas min_periods semantics (NULL until the frame holds n rows);
  *   - a 26-slot FIFO of derived (senkou_a_src, senkou_b_src) values →
  *     `lag(x, 26)`: the entry popped when the FIFO is full IS the
  *     current row's senkou value;
  *   - a 26-slot PENDING queue implementing `lead(close, 26)`: each new
  *     row's close completes (and emits) the row 26 back; warm-up and
  *     look-ahead rows run the same step with their pending entries
  *     flagged no-emit, and whatever pending survives the look-ahead
  *     drains with chikou NULL — exactly lead()'s end-of-key NULLs.
  */
object IchimokuScan {

  /** Warm-up rows per boundary: 52 (longest raw frame) + 26 (derived
    * lag) — past this, every column of the first owned row is exact. */
  val WarmLen = 78

  /** Look-ahead rows per boundary = the chikou lead distance. */
  val LeadLen = 26

  private final case class Pending(
      emit: Boolean, dt: Any, close: Double,
      tenkan: java.lang.Double, kijun: java.lang.Double,
      senkouA: java.lang.Double, senkouB: java.lang.Double)

  /** Per-key state machine; see the object doc for the three buffers. */
  private final class State {
    private val HlCap = 52
    private val hs = new Array[Double](HlCap)
    private val ls = new Array[Double](HlCap)
    private var pos = 0
    private var n = 0
    private def midpoint(w: Int): java.lang.Double = {
      if (n < w) return null
      var mx = Double.NegativeInfinity
      var mn = Double.PositiveInfinity
      var k = 0
      while (k < w) {
        val i = (pos - 1 - k + 2 * HlCap) % HlCap
        if (hs(i) > mx) mx = hs(i)
        if (ls(i) < mn) mn = ls(i)
        k += 1
      }
      (mx + mn) / 2.0
    }
    private val fifoA = new Array[java.lang.Double](LeadLen)
    private val fifoB = new Array[java.lang.Double](LeadLen)
    private var fifoPos = 0
    private var fifoSize = 0
    private val pending = new scala.collection.mutable.Queue[Pending]

    /** Advance one bar; returns the completed row 26 back (with chikou =
      * this bar's close), or null while the lead pipeline fills. */
    def step(dt: Any, h: Double, l: Double, c: Double, emit: Boolean): Pending = {
      val popped =
        if (pending.size == LeadLen) {
          val p = pending.dequeue()
          if (p.emit) p.copy() else null // chikou filled by caller from c
        } else null
      hs(pos) = h; ls(pos) = l; pos = (pos + 1) % HlCap; n += 1
      val tenkan = midpoint(9)
      val kijun = midpoint(26)
      val spanB0 = midpoint(52)
      val aSrc: java.lang.Double =
        if (tenkan == null || kijun == null) null
        else (tenkan.doubleValue + kijun.doubleValue) / 2.0
      var senkouA: java.lang.Double = null
      var senkouB: java.lang.Double = null
      if (fifoSize == LeadLen) { // oldest entry = value 26 rows back
        senkouA = fifoA(fifoPos); senkouB = fifoB(fifoPos)
      } else fifoSize += 1
      fifoA(fifoPos) = aSrc; fifoB(fifoPos) = spanB0
      fifoPos = (fifoPos + 1) % LeadLen
      pending.enqueue(Pending(emit, dt, c, tenkan, kijun, senkouA, senkouB))
      popped
    }

    /** Rows still awaiting a lead that will never come: chikou NULL. */
    def drain(): Iterator[Pending] = pending.iterator.filter(_.emit)
  }

  /** Pass-1 summary of one partition: warm-up tail + look-ahead head. */
  private final case class Edges(
      firstKey: String, lastKey: String, nRows: Long,
      tailKeys: Array[String], tailH: Array[Double], tailL: Array[Double],
      tailC: Array[Double],
      headKeys: Array[String], headH: Array[Double], headL: Array[Double],
      headC: Array[Double])

  private val outSchema = StructType(Seq(
    StructField("symbol", StringType), StructField("datetime", TimestampType),
    StructField("close", DoubleType),
    StructField("tenkan", DoubleType), StructField("kijun", DoubleType),
    StructField("senkou_a", DoubleType), StructField("senkou_b", DoubleType),
    StructField("chikou", DoubleType)))

  // input projection indices
  private val SYM = 0; private val DT = 1
  private val HIGH = 2; private val LOW = 3; private val CLOSE = 4

  def apply(spark: SparkSession, dir: String, numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val input = graft.sources.Bars(spark, dir)
      .select(col("symbol"), col("datetime"), col("high"), col("low"), col("close"))
    val sorted = input.repartitionByRange(n, col("symbol"), col("datetime"))
      .sortWithinPartitions("symbol", "datetime")
    val rdd = sorted.rdd // shared lineage: the range-shuffle map stage runs once

    // pass 1: boundary rows of every partition
    val edges: Map[Int, Edges] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val keys = new Array[String](WarmLen)
      val th = new Array[Double](WarmLen); val tl = new Array[Double](WarmLen)
      val tc = new Array[Double](WarmLen)
      var pos = 0; var size = 0
      var firstKey: String = null; var lastKey: String = null; var cnt = 0L
      val hk = ArrayBuffer.empty[String]
      val hh = ArrayBuffer.empty[Double]; val hl = ArrayBuffer.empty[Double]
      val hc = ArrayBuffer.empty[Double]
      it.foreach { r =>
        val k = r.getString(SYM)
        if (firstKey == null) firstKey = k
        lastKey = k; cnt += 1
        if (hk.length < LeadLen) {
          hk += k; hh += r.getDouble(HIGH); hl += r.getDouble(LOW)
          hc += r.getDouble(CLOSE)
        }
        keys(pos) = k; th(pos) = r.getDouble(HIGH); tl(pos) = r.getDouble(LOW)
        tc(pos) = r.getDouble(CLOSE)
        pos = (pos + 1) % WarmLen; if (size < WarmLen) size += 1
      }
      if (firstKey == null) Iterator.empty
      else {
        val ord = (0 until size).map(k => (pos - size + k + 2 * WarmLen) % WarmLen)
        Iterator((pid, Edges(firstKey, lastKey, cnt,
          ord.map(keys).toArray, ord.map(th).toArray, ord.map(tl).toArray,
          ord.map(tc).toArray,
          hk.toArray, hh.toArray, hl.toArray, hc.toArray)))
      }
    }.collect().toMap

    // driver composition (the DashboardScan walk, both directions):
    // warm-up = up to WarmLen earlier same-key rows, walking BACK
    val warm: Array[Array[(Double, Double, Double)]] = Array.tabulate(n) { p =>
      edges.get(p).map(_.firstKey) match {
        case None => Array.empty[(Double, Double, Double)]
        case Some(fk) =>
          val acc = new ArrayBuffer[(Double, Double, Double)]
          var q = p - 1
          var continue = true
          while (continue && q >= 0 && acc.length < WarmLen) {
            edges.get(q) match {
              case None => // empty partition: keep walking
              case Some(t) =>
                var i = t.tailKeys.length - 1
                val run = new ArrayBuffer[(Double, Double, Double)]
                while (i >= 0 && t.tailKeys(i) == fk) {
                  run.prepend((t.tailH(i), t.tailL(i), t.tailC(i))); i -= 1
                }
                acc.prependAll(run)
                if (run.length < t.tailKeys.length || t.tailKeys.length == WarmLen)
                  continue = false
            }
            q -= 1
          }
          acc.takeRight(WarmLen).toArray
      }
    }
    // look-ahead = up to LeadLen later same-key rows, walking FORWARD
    val lead: Array[Array[(Double, Double, Double)]] = Array.tabulate(n) { p =>
      edges.get(p).map(_.lastKey) match {
        case None => Array.empty[(Double, Double, Double)]
        case Some(lk) =>
          val acc = new ArrayBuffer[(Double, Double, Double)]
          var q = p + 1
          var continue = true
          while (continue && q < n && acc.length < LeadLen) {
            edges.get(q) match {
              case None => // empty partition: keep walking
              case Some(t) =>
                var i = 0
                var broke = false
                while (!broke && i < t.headKeys.length && acc.length < LeadLen) {
                  if (t.headKeys(i) == lk) {
                    acc += ((t.headH(i), t.headL(i), t.headC(i))); i += 1
                  } else broke = true
                }
                // stop once a later key appeared, or this partition holds
                // rows beyond its collected head (they are same-key only
                // if the whole head matched AND nRows > head length — in
                // which case the head already supplied LeadLen rows)
                if (broke || t.nRows > t.headKeys.length.toLong ||
                    acc.length >= LeadLen) continue = false
            }
            q += 1
          }
          acc.toArray
      }
    }
    val bc: Broadcast[(Array[Array[(Double, Double, Double)]],
        Array[Array[(Double, Double, Double)]])] =
      spark.sparkContext.broadcast((warm, lead))

    // pass 2: sequential replay — warm-up (no emit), owned rows, then the
    // look-ahead rows for the LAST key (no emit; they complete the tail's
    // pending leads), then drain chikou-NULL leftovers. STREAMING: each
    // input row yields at most 1 + LeadLen output rows (the key-change
    // drain), so the task never holds more than O(LeadLen) rows — at 100
    // TB a chunk streams through, it is never buffered.
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (warmAll, leadAll) = bc.value
      var curKey: String = null
      var st: State = null
      def row(sym: String, p: Pending, chikou: java.lang.Double): Row =
        Row(sym, p.dt, p.close, p.tenkan, p.kijun, p.senkouA, p.senkouB, chikou)
      val body = it.flatMap { r =>
        val k = r.getString(SYM)
        val drained =
          if (k != curKey) {
            // a key change inside the partition is a GLOBAL end of the
            // old key (range partitioning): its unmet leads are NULL
            val d = if (st != null)
              st.drain().map(p => row(curKey, p, null)).toList
            else Nil
            st = new State
            if (curKey == null)
              warmAll(pid).foreach { case (h, l, c) =>
                st.step(null, h, l, c, emit = false)
              }
            curKey = k
            d
          } else Nil
        val c = r.getDouble(CLOSE)
        val popped = st.step(r.get(DT), r.getDouble(HIGH), r.getDouble(LOW),
          c, emit = true)
        if (popped != null) drained :+ row(k, popped, c) else drained
      }
      val tail = Iterator(()).flatMap { _ => // deferred until `body` is spent
        if (st == null) Iterator.empty
        else {
          val fromLead = leadAll(pid).iterator.flatMap { case (h, l, c) =>
            val popped = st.step(null, h, l, c, emit = false)
            if (popped != null) Iterator(row(curKey, popped, c))
            else Iterator.empty
          }
          fromLead ++ st.drain().map(p => row(curKey, p, null))
        }
      }
      body ++ tail
    }
    spark.createDataFrame(outRdd, outSchema)
      .select(col("symbol"), col("datetime"), col("close"), col("tenkan"),
        col("kijun"), col("senkou_a"), col("senkou_b"), col("chikou"))
  }
}
