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
  * The loop is CLOSED (round-13): `x_classifier_score` serves the
  * weights the distributed batch perceptron ([[lrTrain]]) actually
  * trained, persisted through the validated fingerprint-keyed writer
  * ([[ensureTrainedWeightsArtifact]]) and loaded back as the broadcast
  * model header — train → file → serve, the fastText deployment shape.
  * The synthetic closed-form model ([[model]] /
  * [[ensureWeightsArtifact]]) remains as the spec fixture for the
  * inference plumbing (partitioning-independence, file validation),
  * no longer on the serving path.
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
    * directory as a spurious bucket-gap failure). A COMMITTED
    * destination (_SUCCESS present) is never deleted — a concurrent
    * winner's artifact survives and this writer discards its temp; only
    * a crashed writer's debris (directory without _SUCCESS) is swept
    * before the rename. The residual cross-process window is one
    * exists-then-rename pair — best-effort on a shared local FS, where
    * a real deployment uses the object store's conditional put. */
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
      publishArtifact(fs, tmp, hp)
    }
    p
  }

  /** Publish `tmp` at `dst` without ever deleting a committed artifact
    * (shared with [[graft.ext.Lm]]'s merge table — the warehouse commit
    * protocol). Within ONE JVM the callers' `synchronized` makes this
    * safe outright; across processes sharing a warehouse, mutual
    * exclusion comes from a lock FILE around the sweep+rename, which
    * closes the exists→delete→rename TOCTOU the bare re-check protocol
    * left open. Round-15 advice hardening:
    *
    *   - ACQUISITION IS ATOMIC where the FS allows it: on the local FS
    *     the lock is taken with NIO `CREATE_NEW` (O_CREAT|O_EXCL — the
    *     kernel picks exactly one winner; Hadoop's
    *     `create(path, overwrite = false)` is exists-then-create and a
    *     settle+read-back is only a heuristic). On HDFS
    *     create-exclusive is atomic and a read-to-EOF UUID check is
    *     belt-and-braces; on an object store use conditional put.
    *   - STALE locks are broken by RENAME to a unique name — rename is
    *     atomic on both local FS and HDFS, so of several processes that
    *     observe the same >[[PublishLockStaleMs]] lock, exactly one wins
    *     the break and the committed-artifact sweep can never run twice
    *     concurrently (the delete-based break let every observer
    *     "succeed").
    *   - A lock-race LOSER keeps its tmp until it has SEEN the winner's
    *     _SUCCESS: if the winner is SIGKILLed mid-publish, the loser
    *     breaks the stale lock and retries the rename with its own
    *     still-valid tmp instead of hard-failing with its work
    *     discarded. The wait is bounded by the stale window, not an
    *     unrelated fixed 60 s.
    */
  private[ext] val PublishLockStaleMs = 10 * 60 * 1000L
  private[ext] def publishArtifact(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val success = new Path(dst, "_SUCCESS")
    val lock = new Path(dst.getParent, s".${dst.getName}.lock")
    val self = java.util.UUID.randomUUID().toString
    var attempts = 0
    while (true) {
      if (fs.exists(success)) { fs.delete(tmp, true); return } // theirs is committed
      val acquired =
        try {
          if (fs.getScheme == "file") {
            // local FS: O_CREAT|O_EXCL via NIO is true mutual exclusion
            // (Hadoop's create(path, false) is exists-then-create, and
            // the old 50 ms settle+read-back was a heuristic — a racer
            // landing after the owner's read-back let BOTH believe they
            // owned it). Content is the UUID, kept for observability.
            java.nio.file.Files.write(
              java.nio.file.Paths.get(lock.toUri.getPath),
              self.getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            true
          } else {
            // HDFS: create-exclusive is atomic; the read-back is a
            // belt-and-braces check. Read to EOF — a partial first
            // read() must not make the true owner falsely lose.
            val out = fs.create(lock, false)
            out.write(self.getBytes("UTF-8")); out.close()
            val in = fs.open(lock)
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](64)
            var nread = in.read(buf)
            while (nread > 0) { bos.write(buf, 0, nread); nread = in.read(buf) }
            in.close()
            bos.toString("UTF-8") == self
          }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      if (acquired) {
        try {
          // under the lock: sweep crashed-writer debris (dir without
          // _SUCCESS), then rename. NEVER rename onto an existing dir —
          // Hadoop local-FS rename would move tmp INSIDE it instead of
          // replacing it. The _SUCCESS re-check handles a writer that
          // committed before we took the lock.
          if (fs.exists(success)) { fs.delete(tmp, true); return }
          if (fs.exists(dst)) fs.delete(dst, true)
          if (!fs.rename(tmp, dst)) {
            fs.delete(tmp, true)
            require(fs.exists(success),
              s"artifact $dst: rename failed and no committed artifact exists")
          }
          return
        } finally fs.delete(lock, false)
      }
      // lock held elsewhere: wait (keeping tmp) for their _SUCCESS until
      // the lock goes stale, then break it by atomic rename and retry
      val deadline = System.currentTimeMillis() + PublishLockStaleMs
      var lockGone = false
      while (!fs.exists(success) && !lockGone &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        lockGone = !fs.exists(lock)
      }
      if (fs.exists(success)) { fs.delete(tmp, true); return }
      if (!lockGone) {
        try {
          val st = fs.getFileStatus(lock)
          if (System.currentTimeMillis() - st.getModificationTime > PublishLockStaleMs) {
            val debris = new Path(lock.getParent, s"${lock.getName}.stale.$self")
            if (fs.rename(lock, debris)) fs.delete(debris, false)
          }
        } catch { case _: java.io.FileNotFoundException => () }
      }
      attempts += 1
      if (attempts >= 5) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"artifact $dst: no committed artifact after $attempts " +
            "lock-acquisition attempts (concurrent publishers crashing " +
            "repeatedly, or a wedged filesystem)")
      }
    }
  }

  /** The SERVING load path (round-11 task 3): read the weight file to
    * the driver (model header, the e13 centroid pattern — Buckets longs,
    * 32 KB here, ~16 MB at fastText's 2M), validate it is a complete
    * dense [0, Buckets) vector, and ship it as ONE array literal in a
    * one-row frame. Downstream is identical to [[model]]: broadcast,
    * never joined, never shuffled. `weightCol` names the weight column
    * ("milli_w" for the synthetic fixture, "w" for the trained model). */
  def modelFromFile(spark: SparkSession, path: String,
      weightCol: String = "milli_w"): DataFrame =
    spark.range(1).select(lit(weightsFromFile(spark, path, weightCol)).as("w"))

  /** The validated driver-side weight vector itself — what the scoring
    * KERNEL bakes into its expression (the broadcast-array frame above
    * wraps this same read for the HOF/spec surface). */
  def weightsFromFile(spark: SparkSession, path: String,
      weightCol: String = "milli_w"): Array[Long] = {
    val rows = spark.read.parquet(path)
      .select(col("bucket"), col(weightCol)).orderBy("bucket").collect()
    require(rows.length == Buckets,
      s"model file $path has ${rows.length} buckets, expected $Buckets")
    val w = new Array[Long](Buckets)
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i.toLong, s"model file $path: bucket gap at $i")
      w(i) = r.getLong(1)
    }
    w
  }

  /** Where the TRAINED model persists: fingerprint-keyed (a regenerated
    * corpus trains fresh, never silently serves stale weights) and
    * geometry-keyed (a resized feature space or changed round count is
    * a different model). */
  def trainedWeightsPath(spark: SparkSession, dir: String): String = {
    val fp = graft.sources.Layout
      .sourceFingerprint(spark, s"$dir/documents.parquet")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    new org.apache.hadoop.fs.Path(warehouse,
      s"graft_classifier_trained_${fp}_b${Buckets}_r$LrRounds").toString
  }

  /** Train-then-persist (round-12 verdict task: close the train→serve
    * loop): first touch runs the REAL [[lrLoop]] training (memoized per
    * fingerprint) and commits the final weight vector as a dense
    * [0, Buckets) parquet through the same temp-write + publish
    * protocol as every other artifact; later calls — and fresh JVMs —
    * are a pure read. Serving loads it via [[modelFromFile]], which
    * validates density and fails loudly on gaps or truncation. */
  def ensureTrainedWeightsArtifact(spark: SparkSession, dir: String): String =
    this.synchronized {
      val p = trainedWeightsPath(spark, dir)
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(hp, "_SUCCESS"))) {
        val w = lrLoop(spark, dir)._2
        val tmp = new org.apache.hadoop.fs.Path(
          hp.getParent, s".${hp.getName}.tmp-${java.util.UUID.randomUUID}")
        spark.range(Buckets)
          .select(col("id").as("bucket"),
            element_at(lit(w), col("id").cast("int") + 1).as("w"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        publishArtifact(fs, tmp, hp)
      }
      p
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

    // Per-document linear score + keep/drop gate under the TRAINED
    // perceptron weights, served FROM THE ARTIFACT (round-13: the
    // train→serve loop closed). The oracle replays the identical
    // fixed-round training recurrence as CTEs and scores with the
    // resulting w_K — so a stale, corrupt, or untrained artifact is a
    // hash mismatch, never a silent skew. Integer folds end to end
    // (sum yields HUGEINT in DuckDB, hence the BIGINT cast — the d3
    // lesson); the only double is the final mean, one division both
    // engines round identically.
    Q("x_classifier_score", classifierScoreOracleSql) { (s, dir) =>
      val docs = Portable.spread(Tables.documents(s, dir), "doc_id")
      // the trained weights, baked INTO the scoring kernel (the model
      // header is plan state, like the e8 codebook): one compiled pass
      // per document streams the uni+bigram bytes through SHA-256 and
      // folds the weights — no feature strings, no broadcast join, no
      // per-feature interpreted hash chain (sf100 serve 103.4 → see
      // SCALING.md). ClassifierSpec pins kernel ≡ the HOF fold.
      val w = weightsFromFile(s, ensureTrainedWeightsArtifact(s, dir), "w")
      val scored = docs
        .select(col("doc_id"),
          graft.functions.ArrayOps
            .hashedFeatureScore(tokens(col("text")), w, Buckets).as("fs"))
        .select(col("doc_id"),
          col("fs.n_features").as("n_features"), col("fs.score").as("score"))
      scored.select(col("doc_id"), col("n_features"), col("score"),
        graft.Q.r6(col("score") * lit(1.0) / col("n_features")).as("mean_w"),
        when(col("score") >= 0, lit("keep")).otherwise(lit("drop")).as("label"))
        .transform(d => graft.Q.sorted(d, "doc_id"))
    },

    // The TRAINING side of the quality filter (round 12 — the
    // step→solver completion for the classifier family, the pattern
    // that gave x_pagerank_step its x_pagerank_full and e9 its e12):
    // a distributed batch PERCEPTRON over the same hashed uni+bigram
    // feature space x_classifier_score serves. Exact integer algebra
    // end to end — scores are BIGINT folds, updates are signed
    // occurrence counts — so every round's decision boundary is
    // bit-stable across engines and partitionings, and the oracle
    // replays the identical fixed-round recurrence as materialized
    // CTEs (the pagerank/BPE scheme). Labels are a deterministic text
    // property hashed features CAN fit (contains [[LabelMarker]]), so
    // the training error measurably FALLS — the spec pins it.
    //
    // Scale shape: the (doc_id, y, feature-buckets) frame checkpoints
    // once; each round is one map-side scoring fold (broadcast weight
    // array, the model-header budget) + one <= Buckets-key aggregation
    // of the misclassified docs' features + a 1-row count probe.
    // K rounds = K linear passes, O(Buckets) driver state — how a
    // fastText-style filter trains at web scale.
    Q("x_perceptron_train", perceptronOracleSql) {
      (s, dir) => graft.Q.sorted(lrTrain(s, dir), "round")
    })

  /** Fixed perceptron rounds (the BpeRounds convention: small enough
    * for the oracle to replay verbatim, enough for the error to fall). */
  val LrRounds = 3

  /** The learnable label: +1 iff the document contains this token. */
  val LabelMarker = "the"

  /** The materialized RDD behind a localCheckpoint'ed frame (the Lm
    * release discipline — targeted, so parallel queries can never
    * unpersist each other's state). */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Trained-run memo (the BPE mergeMemo convention): one training run
    * per corpus fingerprint serves both the stats query and the weight
    * consumers — without it a caller wanting stats AND weights paid the
    * K distributed rounds twice. */
  private val lrMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[(Long, Long, Long)], Array[Long])]

  /** Test hook (the determinism spec re-runs the REAL loop, not the memo). */
  private[graft] def clearLrMemo(): Unit = lrMemo.clear()

  /** The shared training loop: returns the per-round stats and the
    * final weight vector, memoized per corpus fingerprint. */
  private def lrLoop(spark: SparkSession, dir: String)
      : (Seq[(Long, Long, Long)], Array[Long]) = lrMemo.getOrElseUpdate(
    graft.sources.Layout.sourceFingerprint(spark, s"$dir/documents.parquet"),
    lrLoopUncached(spark, dir))

  /** Test hook: training-loop invocations (the artifact-serve spec pins
    * that an artifact hit never retrains — the Lm.trainLoopRuns twin). */
  private[graft] val lrLoopRuns = new java.util.concurrent.atomic.AtomicLong(0)

  private def lrLoopUncached(spark: SparkSession, dir: String)
      : (Seq[(Long, Long, Long)], Array[Long]) = {
    lrLoopRuns.incrementAndGet()
    val docs = Portable.spread(Tables.documents(spark, dir), "doc_id")
    // (doc_id, y, feature buckets with multiplicity) — one corpus pass,
    // checkpointed: every round re-reads THIS, never the raw text
    val df = docs.select(col("doc_id"),
        when(array_contains(tokens(col("text")), LabelMarker), 1L)
          .otherwise(-1L).as("y"),
        // the one-time feature pass rides the bucket KERNEL (same
        // digest arithmetic as serving; ClassifierSpec pins kernel ≡
        // the transform/bucket HOF including order)
        graft.functions.ArrayOps
          .hashedFeatureBuckets(tokens(col("text")), Buckets).as("fb"))
      .localCheckpoint()
    val w = new Array[Long](Buckets)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to LrRounds) {
      val wl = lit(w)
      val miss = df.select(col("doc_id"), col("y"), col("fb"),
          aggregate(col("fb"), lit(0L),
            (acc, b) => acc + element_at(wl, b.cast("int") + 1)).as("s"))
        .where(col("y") * col("s") <= 0L)
      // both actions score against the INCOMING weights: the update
      // aggregation (<= Buckets rows to the driver — the model-header
      // budget) and the 1-row miss-count probe
      val upd = miss.select(col("y"), explode(col("fb")).as("b"))
        .groupBy("b").agg(sum(col("y")).as("dw")).collect()
      val nMiss = miss.count()
      upd.foreach(u => w(u.getLong(0).toInt) += u.getLong(1))
      rows += ((r.toLong, nMiss, w.map(math.abs).sum))
    }
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
    (rows.toSeq, w)
  }

  /** Train [[LrRounds]] batch-perceptron rounds; returns one row per
    * round: (round, n_miss under the incoming weights, l1 of the
    * updated weights). */
  def lrTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lrLoop(spark, dir)._1.toDF("round", "n_miss", "w_l1")
  }

  /** Final trained weights (for the spec: the marker's own bucket must
    * carry positive weight). */
  private[graft] def lrTrainedWeights(spark: SparkSession, dir: String): Array[Long] =
    lrLoop(spark, dir)._2

  /** The shared oracle CTE chain: the identical fixed-round training
    * recurrence as materialized CTEs — w0 = 0 (round 1 misclassifies
    * everything), each round's update joins the exploded feature table
    * against that round's misclassified set. All-BIGINT casts (DuckDB
    * sums to HUGEINT). Ends at `w$LrRounds`, the trained weight table
    * both the train oracle (per-round stats) and the score oracle (the
    * served gate) read. */
  private def perceptronCtes: String = {
    val b = s"(${sqlHash32("u.f")} % $Buckets)"
    val rounds = (2 to LrRounds).map { k =>
      val p = k - 1
      s"""s$k AS (SELECT f.doc_id, any_value(f.y) AS y,
         |        CAST(COALESCE(sum(w$p.w), 0) AS BIGINT) AS s
         |        FROM f LEFT JOIN w$p ON f.b = w$p.b GROUP BY f.doc_id),
         |m$k AS MATERIALIZED (SELECT doc_id FROM s$k WHERE y * s <= 0),
         |u$k AS (SELECT f.b, CAST(sum(f.y) AS BIGINT) AS dw
         |        FROM f JOIN m$k USING (doc_id) GROUP BY f.b),
         |w$k AS MATERIALIZED (SELECT COALESCE(w$p.b, u$k.b) AS b,
         |        CAST(COALESCE(w$p.w, 0) + COALESCE(u$k.dw, 0) AS BIGINT) AS w
         |        FROM w$p FULL JOIN u$k ON w$p.b = u$k.b)""".stripMargin
    }.mkString(",\n")
    s"""d AS (SELECT doc_id,
       |  CASE WHEN list_contains(string_split(text, ' '), '$LabelMarker')
       |       THEN 1 ELSE -1 END AS y,
       |  string_split(text, ' ') AS toks FROM documents),
       |f0 AS (SELECT doc_id, y,
       |  array_concat(toks, list_transform(range(1, len(toks)),
       |    i -> toks[i] || '_' || toks[i+1])) AS feats
       |  FROM d),
       |f AS MATERIALIZED (SELECT doc_id, y, $b AS b
       |  FROM f0, UNNEST(feats) AS u(f)),
       |w1 AS MATERIALIZED (SELECT b, CAST(sum(y) AS BIGINT) AS w
       |  FROM f GROUP BY b),
       |$rounds""".stripMargin
  }

  /** Oracle twin of [[lrTrain]]: per-round (n_miss, w_l1) off the chain. */
  private def perceptronOracleSql: String = {
    val out = (1 to LrRounds).map { k =>
      val missCount =
        if (k == 1) "(SELECT count(*) FROM d)"
        else s"(SELECT count(*) FROM m$k)"
      s"""SELECT CAST($k AS BIGINT) AS round,
         |       CAST($missCount AS BIGINT) AS n_miss,
         |       (SELECT CAST(sum(abs(w)) AS BIGINT) FROM w$k) AS w_l1""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH $perceptronCtes
       |$out
       |ORDER BY round""".stripMargin
  }

  /** Oracle twin of the SERVED score: re-trains w$LrRounds through the
    * identical recurrence, then scores every document's occurrence-level
    * features against it — exactly what the Spark side reads from the
    * persisted artifact. */
  private def classifierScoreOracleSql: String =
    s"""WITH $perceptronCtes,
       |sc AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_features,
       |              CAST(COALESCE(sum(w$LrRounds.w), 0) AS BIGINT) AS score
       |       FROM f LEFT JOIN w$LrRounds ON f.b = w$LrRounds.b
       |       GROUP BY f.doc_id)
       |SELECT doc_id, n_features, score,
       |       round(score * 1.0 / n_features, 6) AS mean_w,
       |       CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
       |FROM sc ORDER BY doc_id""".stripMargin
}
