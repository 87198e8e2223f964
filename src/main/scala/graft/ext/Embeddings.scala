package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Embedding-column aggregation — the vector half of a training-data
  * pipeline that the similarity family (e1–e5) doesn't cover: per-label
  * centroids (the building block of IVF index construction, cluster
  * drift monitoring, and class-prototype evaluation).
  *
  * Scale design: `posexplode` fans each 64-dim vector into 64 (pos, v)
  * rows, then ONE hash aggregation on (label, pos). The ×64 row blowup
  * never reaches the shuffle: partial aggregation collapses each map
  * task's contribution to at most (#labels × 64) sufficient-statistic
  * rows, so the exchange carries O(labels·dims·partitions) rows no
  * matter how many vectors are scanned. Sums are over 1e-6-quantized
  * BIGINTs (portable double rounding, then exact integer addition), so
  * the result is bit-identical across engines AND across shuffle orders
  * — float sums would flap on accumulation order.
  */
object Embeddings {

  val Dims = 64

  def queries: Seq[Q] = Seq(
    Q("e6_centroids",
      s"""WITH x AS (
         |  SELECT label, i AS pos,
         |         CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1e6, 0) AS BIGINT) AS qv
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $Dims)) AS i) r),
         |g AS (SELECT label, pos, count(*) AS n, CAST(sum(qv) AS DOUBLE) AS qsum
         |      FROM x GROUP BY 1, 2)
         |SELECT label, pos, n, round(qsum / (1e6 * n), 6) AS centroid
         |FROM g ORDER BY label, pos""".stripMargin) {
      (s, dir) => {
        val x = Portable.spread(Tables.embeddings(s, dir), "vec_id")
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), col("pos").cast("long").as("pos"),
            round(col("v").cast("double") * 1e6, 0).cast("long").as("qv"))
        val g = x.groupBy("label", "pos")
          .agg(count(lit(1)).as("n"), sum(col("qv")).cast("double").as("qsum"))
        g.select(col("label"), col("pos"), col("n"),
            graft.Q.r6(col("qsum") / (lit(1e6) * col("n"))).as("centroid"))
          .transform(d => graft.Q.sorted(d, "label", "pos"))
      }
    })
}
