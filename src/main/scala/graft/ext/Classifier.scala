package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-bag-of-n-grams linear classifier inference — the
  * fastText-quality-filter shape every large curation pipeline runs
  * (CCNet / RefinedWeb style: score each document with a cheap linear
  * model over hashed uni+bigram features, keep what clears the gate).
  *
  * Serving shape, which is the point at 100 TB:
  *   - The MODEL is a weight vector indexed by feature bucket
  *     (`Buckets` entries). It is built once and broadcast as a one-row
  *     array — never joined, never shuffled; scoring is a per-row
  *     map-side lookup-and-fold, fully codegen, zero exchanges beyond
  *     the input scan.
  *   - FEATURES are hashed (`Portable.hash32` mod `Buckets`), so the
  *     feature space is fixed-size regardless of vocabulary — the trick
  *     that keeps the model broadcastable at web scale.
  *   - The fold is INTEGER milli-weights (exact, order-independent), so
  *     the score — and therefore the keep/drop decision — is bit-stable
  *     across partitionings and engines. Only the final mean is a
  *     double, produced by one exact-integer division.
  *
  * The weights themselves are a deterministic synthetic stand-in
  * (`(bucket * 2654435761) % 1001 - 500` milli-units — Knuth
  * multiplicative scatter; a trained model would load the same array
  * from a file): as with [[TextStats.LangMarkers]], the tested value is
  * the inference plumbing, not the model fit.
  */
object Classifier {
  import Portable._

  /** Hashed feature space size. Real fastText defaults to 2M; the value
    * only changes the array literal's length, not the plan shape. */
  val Buckets = 4096

  /** Milli-weight of bucket `b` (integer in [-500, 500]). */
  def milliWeight(b: Column): Column =
    (b * lit(2654435761L)) % lit(1001L) - lit(500L)

  /** One-row `(w: array<long>)` weight vector — the broadcast model,
    * stated closed-form (the TEST FIXTURE; serving loads [[modelFromFile]]). */
  def model(spark: SparkSession): DataFrame =
    spark.range(1).select(
      transform(sequence(lit(0), lit(Buckets - 1)),
        b => milliWeight(b)).as("w"))

  /** Where the model ARTIFACT lives: a parquet of (bucket, milli_w) rows
    * under the warehouse — the file a training job would drop. The name
    * carries the feature-space size (a resized model is a different
    * model, never silently half-read). */
  def weightsPath(spark: SparkSession): String = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    new org.apache.hadoop.fs.Path(warehouse, s"graft_classifier_w_b$Buckets").toString
  }

  /** Write the model file if absent (idempotent; the synthetic generator
    * stands in for the training job — a real deployment replaces this
    * call with its trained (bucket, milli_w) dump at the same path).
    * Commit protocol: write to a temp path, then RENAME into place —
    * `this.synchronized` only serializes one JVM, and the _SUCCESS
    * check-then-overwrite was not atomic across processes sharing a
    * warehouse (an interleaved reader could catch a half-written
    * directory as a spurious bucket-gap failure). The rename is the
    * atomic publish; a concurrent winner makes the rename fail, which
    * is fine — the published artifact is already valid. */
  def ensureWeightsArtifact(spark: SparkSession): String = this.synchronized {
    val p = weightsPath(spark)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(hp, "_SUCCESS"))) {
      val tmp = new org.apache.hadoop.fs.Path(
        hp.getParent, s".${hp.getName}.tmp-${java.util.UUID.randomUUID}")
      spark.range(Buckets)
        .select(col("id").as("bucket"), milliWeight(col("id")).as("milli_w"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.delete(hp, true)
      if (!fs.rename(tmp, hp)) {
        // lost the publish race to another process: keep theirs
        fs.delete(tmp, true)
        require(fs.exists(new org.apache.hadoop.fs.Path(hp, "_SUCCESS")),
          s"weights artifact $p: rename failed and no committed artifact exists")
      }
    }
    p
  }

  /** The SERVING load path (round-11 task 3): read the weight file to
    * the driver (model header, the e13 centroid pattern — Buckets longs,
    * 32 KB here, ~16 MB at fastText's 2M), validate it is a complete
    * dense [0, Buckets) vector, and ship it as ONE array literal in a
    * one-row frame. Downstream is identical to [[model]]: broadcast,
    * never joined, never shuffled. */
  def modelFromFile(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.read.parquet(path).orderBy("bucket").collect()
    require(rows.length == Buckets,
      s"model file $path has ${rows.length} buckets, expected $Buckets")
    val w = new Array[Long](Buckets)
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i.toLong, s"model file $path: bucket gap at $i")
      w(i) = r.getLong(1)
    }
    spark.range(1).select(lit(w).as("w"))
  }

  /** Feature bucket of a token/bigram string. */
  def bucket(f: Column): Column = hash32(f) % lit(Buckets.toLong)

  /** Uni+bigram feature strings of a token array (bigrams joined with
    * '_'); empty-safe: a 1-token doc has no bigrams. */
  def features(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws("_", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))

  def queries: Seq[Q] = Seq(

    // Per-document linear score + keep/drop gate. Oracle computes the
    // same weights closed-form (the broadcast array and the formula are
    // definitionally equal); list_sum yields HUGEINT in DuckDB, hence
    // the BIGINT cast (the d3 lesson, Portable.sqlSimhash32).
    Q("x_classifier_score",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (SELECT doc_id,
         |             array_concat(toks, list_transform(range(1, len(toks)),
         |               i -> toks[i] || '_' || toks[i+1])) AS feats
         |      FROM t),
         |s AS (SELECT doc_id, len(feats) AS n_features,
         |             CAST(list_sum(list_transform(feats,
         |               x -> ((${sqlHash32("x")} % $Buckets) * 2654435761) % 1001 - 500))
         |               AS BIGINT) AS score_milli
         |      FROM f)
         |SELECT doc_id, n_features, score_milli,
         |       round(score_milli * 1.0 / (n_features * 1000), 6) AS mean_w,
         |       CASE WHEN score_milli >= 0 THEN 'keep' ELSE 'drop' END AS label
         |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
      // the model, served FROM ITS FILE (ClassifierSpec pins file ≡
      // generator; the oracle states the weights closed-form, so a
      // corrupt or stale file is a hash mismatch, not a silent skew)
      val scored = docs
        .crossJoin(broadcast(modelFromFile(s, ensureWeightsArtifact(s))))
        .select(col("doc_id"), features(tokens(col("text"))).as("feats"), col("w"))
        .select(col("doc_id"),
          size(col("feats")).cast("long").as("n_features"),
          aggregate(col("feats"), lit(0L),
            (acc, f) => acc + element_at(col("w"), bucket(f).cast("int") + 1))
            .as("score_milli"))
      scored.select(col("doc_id"), col("n_features"), col("score_milli"),
        graft.Q.r6(col("score_milli") * lit(1.0) / (col("n_features") * lit(1000)))
          .as("mean_w"),
        when(col("score_milli") >= 0, lit("keep")).otherwise(lit("drop")).as("label"))
        .transform(d => graft.Q.sorted(d, "doc_id"))
    })
}
