package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * so every kernel is callable from `spark.sql(...)` exactly like a
  * built-in — the `SparkSessionExtensions` integration path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`), plus a
  * live-session `register` for sessions that already exist.
  *
  * SQL surface:
  *   - `dot_product_f(a, b)`    — float-array dot product (codegen)
  *   - `minhash_sig(hashes, k)` — k-permutation MinHash signature
  *   - `simhash32(hashes)`      — 32-bit SimHash of a hash multiset
  *   - `shingles3(tokens)`      — distinct 3-token shingles
  *   - `poly_hash(s)`           — codepoint polynomial fingerprint
  *   - `ewma(x, alpha)`         — EWMA window function:
  *                                `ewma(close, 0.5) OVER (PARTITION BY ... ORDER BY ...)`
  *
  * Literal-argument extraction happens at registration call sites
  * (k / alpha must be foldable literals — same contract as built-ins
  * like `approx_percentile`'s accuracy argument).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // custom whole-operator tier: the native as-of join planner strategy
    // (live sessions get it via Interop.ensureStrategy instead)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def requireArgs(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: argument must be an integer literal, got $other")
  }

  private def litDouble(name: String, e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    // SQL fractional literals parse as exact decimals (0.5 -> DECIMAL(1,1))
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name: argument must be a numeric literal, got $other")
  }

  /** (name, info, builder) for every engine SQL function. */
  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product_f", info("dot_product_f", "dot_product_f(a, b) - float-array dot product"),
      (args: Seq[Expression]) => {
        requireArgs("dot_product_f", 2, args); DotProductF(args(0), args(1))
      }),
    ("minhash_sig", info("minhash_sig", "minhash_sig(hashes, k) - k-perm MinHash signature"),
      (args: Seq[Expression]) => {
        requireArgs("minhash_sig", 2, args)
        MinHashSig(args(0), litInt("minhash_sig", args(1)))
      }),
    ("simhash32", info("simhash32", "simhash32(hashes) - 32-bit SimHash"),
      (args: Seq[Expression]) => {
        requireArgs("simhash32", 1, args); SimHash32(args(0))
      }),
    ("shingles3", info("shingles3", "shingles3(tokens) - distinct 3-token shingles"),
      (args: Seq[Expression]) => {
        requireArgs("shingles3", 1, args); Shingles3K(args(0))
      }),
    ("poly_hash", info("poly_hash", "poly_hash(s) - codepoint polynomial fingerprint"),
      (args: Seq[Expression]) => {
        requireArgs("poly_hash", 1, args); PolyHash(args(0))
      }),
    ("top_count", info("top_count", "top_count(xs) - max element frequency of a string array"),
      (args: Seq[Expression]) => {
        requireArgs("top_count", 1, args); TopCount(args(0))
      }),
    ("ewma", info("ewma", "ewma(x, alpha) OVER (...) - exponentially weighted moving average"),
      (args: Seq[Expression]) => {
        requireArgs("ewma", 2, args)
        Ewma(args(0), litDouble("ewma", args(1)))
      }))

  /** Register on a live session (tests, notebooks) — same functions the
    * extensions path injects at session build time.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftshim.Interop.registerFunction(spark, name, i, builder)
    }
}
