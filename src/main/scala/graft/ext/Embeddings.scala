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
    },

    // e7: symmetric int8 scalar quantization — the 4x memory compression
    // step before an ANN index is built (float32 -> int8 at a per-vector
    // scale). Per-row Column algebra, no shuffle; the quantized digest
    // columns (sum/min/max over exact integers) pin the full codes
    // cross-engine without emitting a 64-element array per row. The
    // amax=0 guard keeps all-zero vectors at code 0 instead of NaN.
    Q("e7_quantize_int8",
      """WITH q AS (
        |  SELECT vec_id,
        |         list_max(list_transform(embedding,
        |                  x -> abs(CAST(x AS DOUBLE)))) AS amax,
        |         embedding
        |  FROM embeddings),
        |c AS (SELECT vec_id, amax,
        |             list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0
        |               ELSE CAST(round(CAST(x AS DOUBLE) / amax * 127, 0) AS BIGINT)
        |               END) AS codes
        |      FROM q)
        |SELECT vec_id, round(amax / 127, 6) AS scale,
        |       CAST(list_sum(codes) AS BIGINT) AS qsum,
        |       CAST(list_min(codes) AS BIGINT) AS qmin,
        |       CAST(list_max(codes) AS BIGINT) AS qmax
        |FROM c ORDER BY vec_id""".stripMargin) {
      (s, dir) => {
        val amax = array_max(transform(col("embedding"),
          x => abs(x.cast("double"))))
        val codes = transform(col("embedding"),
          x => when(col("amax") === 0, lit(0L))
            .otherwise(round(x.cast("double") / col("amax") * 127, 0).cast("long")))
        Portable.spread(Tables.embeddings(s, dir), "vec_id")
          .select(col("vec_id"), col("embedding"), amax.as("amax"))
          .select(col("vec_id"), col("amax"), codes.as("codes"))
          .select(col("vec_id"),
            graft.Q.r6(col("amax") / 127).as("scale"),
            aggregate(col("codes"), lit(0L), (acc, x) => acc + x).as("qsum"),
            array_min(col("codes")).as("qmin"),
            array_max(col("codes")).as("qmax"))
          .transform(d => graft.Q.sorted(d, "vec_id"))
      }
    })
}
