package graft

import graft.ext.Portable
import org.apache.spark.sql.functions._

/** The SQL face of the engine: every custom Catalyst expression is
  * registered as a SQL function ([[GraftExtensions]]), so a spark.sql
  * user gets the kernels exactly like built-ins.
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("kernels callable from spark.sql, equal to the Column API") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, "pack my box with five dozen liquor jugs", Array(0.5f, -1.0f), Array(2.0f, 2.0f)))
      .toDF("id", "text", "va", "vb")
      .createOrReplaceTempView("sql_surface_t")

    val got = spark.sql(
      """SELECT id,
        |       dot_product_f(va, vb) AS dot,
        |       poly_hash(text) AS fp,
        |       top_count(split(text, ' ')) AS tc,
        |       simhash32(transform(shingles3(split(text, ' ')),
        |                 s -> CAST(conv(substring(sha2(s, 256), 1, 8), 16, 10) AS BIGINT))) AS sh,
        |       minhash_sig(transform(split(text, ' '),
        |                 t -> CAST(conv(substring(sha2(t, 256), 1, 8), 16, 10) AS BIGINT)), 4) AS mh
        |FROM sql_surface_t ORDER BY id""".stripMargin).collect()

    val want = spark.table("sql_surface_t").select(
        col("id"),
        Portable.dot(col("va"), col("vb")).as("dot"),
        Portable.fingerprint(col("text")).as("fp"),
        graft.functions.ArrayOps.topCount(split(col("text"), " ")).as("tc"),
        graft.functions.ArrayOps.simhash32(
          transform(Portable.shingles3(split(col("text"), " ")), s => Portable.hash32(s))).as("sh"),
        graft.functions.ArrayOps.minhashSig(
          transform(split(col("text"), " "), t => Portable.hash32(t)), 4).as("mh"))
      .orderBy("id").collect()

    got.zip(want).foreach { case (g, w) =>
      assert(g.getDouble(1) == w.getDouble(1), "dot")
      assert(g.getLong(2) == w.getLong(2), "poly_hash")
      assert(g.getInt(3) == w.getInt(3), "top_count")
      assert(g.getLong(4) == w.getLong(4), "simhash32")
      assert(g.getSeq[Long](5) == w.getSeq[Long](5), "minhash_sig")
    }
  }

  test("ewma usable as a SQL window function") {
    GraftExtensions.register(spark)
    val s = spark
    import s.implicits._
    Seq(("A", 1, 10.0), ("A", 2, 20.0), ("A", 3, 30.0), ("B", 1, 5.0), ("B", 2, 7.0))
      .toDF("sym", "t", "x").createOrReplaceTempView("sql_ewma_t")
    val got = spark.sql(
      """SELECT sym, t, ewma(x, 0.5) OVER (PARTITION BY sym ORDER BY t) AS e
        |FROM sql_ewma_t ORDER BY sym, t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // y0 = x0; y_t = 0.5 x_t + 0.5 y_{t-1}
    assert(got.toSeq == Seq(
      ("A", 1, 10.0), ("A", 2, 15.0), ("A", 3, 22.5),
      ("B", 1, 5.0), ("B", 2, 6.0)))
  }
}
