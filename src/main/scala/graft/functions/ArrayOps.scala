package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Interop
import org.apache.spark.sql.types._

/** Native codegen array kernels for the extension surface.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`,
  * nested `transform`) are semantically right but evaluate their lambdas
  * interpreted, and nested lambdas re-evaluate inner expressions per outer
  * element — the minhash HOF recomputed sha256 of every shingle 32 times
  * (once per permutation). These expressions evaluate their input ONCE and
  * run tight generated-Java loops, preserving the exact arithmetic (and
  * IEEE accumulation order) of the HOF/DuckDB-oracle definitions in
  * [[graft.ext.Portable]] — outputs are bit-identical, only faster.
  *
  * Scale note: each is a per-row O(len) kernel inside whole-stage codegen,
  * so the 100 TB cost model is unchanged: narrow projection, no shuffle.
  */

/** Dot product of two float arrays as a sequential double fold
  * (index-ascending adds — same IEEE result as the `aggregate` fold and
  * DuckDB `list_reduce`).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over an array of 32-bit hash values:
  * sig[i] = min over v of ((2i+1)*v + (2654435761*(i+1)) mod P) mod P,
  * P = 4294967311. Identical to [[graft.ext.Portable.sqlMinhashSig]].
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  private val P = 4294967311L

  override def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val a = 2L * i + 1L
      val b = (2654435761L * (i + 1L)) % P
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = (a * hv.getLong(j) + b) % P
        if (h < m) m = h
        j += 1
      }
      out(i) = if (n == 0) null else m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hv => {
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |int n = $hv.numElements();
         |Object[] out = new Object[$k];
         |for (int i = 0; i < $k; i++) {
         |  long a = 2L * i + 1L;
         |  long b = (2654435761L * (i + 1L)) % ${P}L;
         |  long m = Long.MAX_VALUE;
         |  for (int j = 0; j < n; j++) {
         |    long h = (a * $hv.getLong(j) + b) % ${P}L;
         |    if (h < m) m = h;
         |  }
         |  out[i] = (n == 0) ? null : (Object) m;
         |}
         |${ev.value} = new $arrCls(out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 32-bit SimHash over an array of 32-bit token hash values (multiset —
  * occurrences weight). bit_j set iff sum over tokens of
  * (bit_j(v)*2 - 1) >= 0. Identical to
  * [[graft.ext.Portable.sqlSimhash32]].
  */
case class SimHash32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    var sig = 0L
    var j = 0
    while (j < 32) {
      var s = 0L
      var i = 0
      while (i < n) {
        s += ((th.getLong(i) >> j) & 1L) * 2L - 1L
        i += 1
      }
      if (s >= 0) sig += (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      s"""
         |int n = $th.numElements();
         |long sig = 0L;
         |for (int j = 0; j < 32; j++) {
         |  long s = 0L;
         |  for (int i = 0; i < n; i++) {
         |    s += (($th.getLong(i) >> j) & 1L) * 2L - 1L;
         |  }
         |  if (s >= 0) sig += (1L << j);
         |}
         |${ev.value} = sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object ArrayOps {
  def dotF(a: Column, b: Column): Column =
    Interop.column(DotProductF(Interop.expression(a), Interop.expression(b)))
  def minhashSig(hashes: Column, k: Int): Column =
    Interop.column(MinHashSig(Interop.expression(hashes), k))
  def simhash32(hashes: Column): Column =
    Interop.column(SimHash32(Interop.expression(hashes)))
}
