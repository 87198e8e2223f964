package graft

import graft.ext.Embeddings
import graft.ext.Portable
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** e12_kmeans_full solver properties: the convergence probe's early exit
  * must be an exact fixpoint (the bit-safety contract against the
  * fixed-round oracle), and assignment must be a partition of the corpus.
  */
class Ext9Spec extends SparkTestBase {

  test("kmeans solver: early exit is an exact integer fixpoint; assignment partitions the corpus") {
    val e = Portable.spread(Tables.embeddings(spark, sf), "vec_id")
    val nVecs = e.count()
    val (g, iters, converged) = Embeddings.kmeansConverged(e, maxIters = 12)
    assert(iters >= 1 && iters <= 12)

    // every dimension's cluster counts sum to the corpus size — the
    // assignment is a partition (no dropped or duplicated vectors)
    val perPos = g.groupBy("pos").agg(sum("n").as("tot")).select("tot").distinct().collect()
    assert(perPos.length == 1 && perPos.head.getLong(0) == nVecs,
      s"assignment is not a partition: ${perPos.mkString(",")} vs $nVecs")

    if (converged) {
      // fixpoint: one MORE Lloyd round reproduces the statistics verbatim
      // (this is exactly the property that makes the early exit bit-safe
      // against the oracle's fixed round count)
      val (g2, it2, conv2) = Embeddings.kmeansConverged(e, maxIters = iters + 1)
      assert(conv2 && it2 == iters, s"re-run diverged: converged=$conv2, $it2 vs $iters")
      val prev = g.select(col("cl"), col("pos"), col("n").as("pn"), col("qsum").as("pq"))
      val mism = g2.join(prev, Seq("cl", "pos"), "full_outer")
        .agg(count(when(!(col("n") <=> col("pn")) || !(col("qsum") <=> col("pq")), 1)))
        .first().getLong(0)
      assert(mism == 0, s"$mism stat rows changed after convergence")
    }
  }
}
