package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, PAPERS.md): the
  * embedding-space analogue of MinHash dedup — cluster the corpus, then
  * compare pairs ONLY within a cluster, dropping all but one of every
  * semantically-near group. This is the standard way web-scale training
  * sets prune paraphrases that exact/MinHash dedup cannot see.
  *
  * Pipeline (all relational, no all-pairs anywhere):
  *   1. codebook: deterministic codewords (two sizings below), broadcast;
  *   2. assign: nearest codeword by exact squared distance, ties by
  *      codeword id — broadcast join + per-row argmin, NO shuffle of the
  *      corpus beyond the initial spread;
  *   3. pair: self-join ON the cluster id (shuffle hashes on cluster;
  *      candidate count is sum of |cluster|^2, not n^2 — the paper's
  *      k ~ sqrt(n) sizing keeps clusters O(sqrt n));
  *   4. keep rule: a vector is dropped iff a lower-id vector in ITS
  *      cluster is cosine-similar above the threshold (deterministic
  *      min-id representative, the same convention as d8's keep).
  *
  * Both queries share ONE assign/pair/keep pipeline ([[keepPlan]] /
  * [[keepSql]]) parameterized by the codebook — only the cluster sizing
  * differs:
  *   - `x_semdedup`: one codeword per label (k = 10 — the e8/e10
  *     convention; reference-parity shape) — BELOW
  *     [[LabelArmMaxRows]]; past it the query DISPATCHES onto the
  *     sqrt-k sizing (round-12 verdict #1: the label arm's pair join is
  *     Σ|cluster|² ≈ n²/10 candidates — the first full sf10 rung
  *     measured it the slowest row of the whole surface, 285.6 s over
  *     200k vectors, growing quadratically; the sqrt-k arm measured
  *     15.9 s). The `ops/Indicators.tiered` pattern on the cluster
  *     axis: the semantics stay "SemDeDup keep rule over a deterministic
  *     codebook", the codebook sizing becomes scale-appropriate, and the
  *     DuckDB oracle adjudicates the label shape at the gate SFs where
  *     the dispatch keeps it.
  *   - `x_semdedup_sqrtk`: K = ceil(sqrt(n)) codewords (vec_id < K) —
  *     the paper's sizing, unconditionally. A production run trains the
  *     codewords with e12's Lloyd solver and assigns through the e13
  *     IVF index.
  *
  * Cross-engine exactness: distances and cosines are [[Portable.dot]]
  * sequential folds (identical IEEE accumulation order), so the argmin
  * and the threshold compare resolve identically in Spark and DuckDB.
  */
object SemDedup {
  import Portable.{cosine, dot, spread, sqlCosine, sqlDot}

  /** Corpus-size ceiling for x_semdedup's label-cluster arm. With k
    * fixed at ~10 label clusters the within-cluster pair join carries
    * Σ|cluster|² ≈ n²/k candidate cosines, versus ~2·n·√n for the
    * sqrt-k codebook (n·√n assignment distances + n·√n expected pairs)
    * — the crossover is n ≈ (2k)² ≈ 400, so by 20k rows the label arm
    * is already ~20× the work and climbing linearly in n. 20_000 keeps
    * the reference-parity label shape through every oracle-adjudicated
    * SF (gate corpora are 500–2000 vectors; sf1 is exactly 20k) and
    * routes sf10+ (200k+) onto the paper's sizing.
    */
  val LabelArmMaxRows = 20000L

  /** The dispatch decision, naked for the spec: sqrt-k sizing iff the
    * corpus exceeds [[LabelArmMaxRows]]. */
  def useSqrtK(n: Long): Boolean = n > LabelArmMaxRows

  /** Assign → within-cluster pair → keep decision over the given
    * codebook (cl, ce). The corpus-with-cluster frame is used three
    * times (both self-join legs + the output), hence the cache; the
    * verify/bench harnesses clear the session cache after every query —
    * a LIBRARY caller running this inside a longer session should
    * unpersist via `spark.catalog.clearCache()` (or uncache the plan)
    * once the result is consumed. */
  private def keepPlan(e: DataFrame, cw: DataFrame): DataFrame = {
    def d2(v: Column): Column =
      (dot(v, v) - lit(2.0) * dot(v, col("ce"))) + dot(col("ce"), col("ce"))
    val asg = e.crossJoin(broadcast(cw))
      .select(col("vec_id"), col("cl"), d2(col("embedding")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cl"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cl").as("cluster"))
    val v = e.join(asg, "vec_id")
      .select(col("vec_id"), col("embedding"), col("cluster")).cache()
    val a = v.select(col("cluster"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = v.select(col("cluster"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    val dup = a.join(b, Seq("cluster"))
      .where(col("vec_a") < col("vec_b") &&
        cosine(col("ea"), col("eb")) >= Similarity.NearDupThreshold)
      .select(col("vec_b").as("dup_id")).distinct()
    v.join(dup, v("vec_id") === dup("dup_id"), "left")
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        when(col("dup_id").isNull, 1L).otherwise(0L).as("is_kept"))
      .transform(d => graft.Q.sorted(d, "vec_id"))
  }

  /** Oracle twin of [[keepPlan]]: the identical CTE chain over a
    * codebook CTE the caller supplies as `cw AS (...cl, ce...)`. */
  private def keepSql(cwCte: String): String = {
    val d2 = s"((${sqlDot("e.embedding", "e.embedding")}" +
      s" - 2.0*${sqlDot("e.embedding", "cw.ce")})" +
      s" + ${sqlDot("cw.ce", "cw.ce")})"
    s"""$cwCte,
       |d AS (SELECT e.vec_id, cw.cl, $d2 AS d2
       |      FROM embeddings e CROSS JOIN cw),
       |asg AS (SELECT vec_id, cl AS cluster FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
       |    FROM d) WHERE rn = 1),
       |v AS (SELECT a.vec_id, a.embedding, asg.cluster
       |      FROM embeddings a JOIN asg ON a.vec_id = asg.vec_id),
       |dup AS (SELECT DISTINCT b.vec_id
       |        FROM v a JOIN v b
       |          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |        WHERE ${sqlCosine("a.embedding", "b.embedding")} >= ${Similarity.NearDupThreshold})
       |SELECT v.vec_id, CAST(v.cluster AS BIGINT) AS cluster,
       |       CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM v LEFT JOIN dup ON v.vec_id = dup.vec_id
       |ORDER BY v.vec_id""".stripMargin
  }

  /** One deterministic codeword per label (min-vec_id representative —
    * the e3/e8 centroid convention): the reference-parity sizing. */
  private def labelCodebook(e: DataFrame): DataFrame =
    e.withColumn("rn",
        row_number().over(Window.partitionBy("label").orderBy("vec_id")))
      .where(col("rn") === 1)
      .select(col("label").as("cl"), col("embedding").as("ce"))

  /** K = ceil(sqrt(n)) codewords (vec_id < K) — the paper's sizing,
    * which keeps the within-cluster pair join O(n·√n). */
  private def sqrtkCodebook(e: DataFrame, n: Long): DataFrame = {
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    e.where(col("vec_id") < k)
      .select(col("vec_id").as("cl"), col("embedding").as("ce"))
  }

  /** The dispatched x_semdedup plan, with the threshold injectable so
    * the spec can pin BOTH dispatch arms on the gate corpus. */
  private[graft] def semdedupPlan(s: SparkSession, dir: String,
      labelArmMaxRows: Long = LabelArmMaxRows): DataFrame = {
    val e = spread(Tables.embeddings(s, dir), "vec_id")
    // ONE count job (the convergence-probe budget) decides the sizing;
    // the sqrt-k arm needs n anyway
    val n = e.count()
    val cw = if (n > labelArmMaxRows) sqrtkCodebook(e, n) else labelCodebook(e)
    keepPlan(e, cw)
  }

  def queries: Seq[Q] = Seq(
    // oracle = the SAME dispatch as the plan (round-13 advice: the plan
    // switches codebooks at LabelArmMaxRows, so a label-only oracle was
    // valid only at gate SFs — a sf10+ oracle run would report a false
    // mismatch). The cw CTE picks the label codebook when
    // count(*) <= LabelArmMaxRows, the sqrt-k codebook above, keyed on
    // the SAME threshold constant, so oracle and plan agree at EVERY
    // corpus size.
    Q("x_semdedup", keepSql(
      s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
         |cw AS (
         |  SELECT cl, ce FROM (
         |    SELECT label AS cl, embedding AS ce,
         |           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1
         |    AND (SELECT n FROM nn) <= $LabelArmMaxRows
         |  UNION ALL
         |  SELECT vec_id AS cl, embedding AS ce FROM embeddings
         |  WHERE (SELECT n FROM nn) > $LabelArmMaxRows
         |    AND vec_id < CAST(ceil(sqrt((SELECT n FROM nn))) AS BIGINT))""".stripMargin)) { (s, dir) =>
      semdedupPlan(s, dir)
    },

    Q("x_semdedup_sqrtk", keepSql(
      """WITH kk AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM embeddings),
        |cw AS (SELECT vec_id AS cl, embedding AS ce FROM embeddings
        |       WHERE vec_id < (SELECT k FROM kk))""".stripMargin)) { (s, dir) =>
      val e = spread(Tables.embeddings(s, dir), "vec_id")
      // K = ceil(sqrt(n)): ONE count job (the convergence-probe budget)
      keepPlan(e, sqrtkCodebook(e, e.count()))
    })
}
