package graft

import graft.ext.{Classifier, Portable}
import org.apache.spark.sql.functions._

/** The classifier-serving contract: the broadcast weight array IS the
  * closed-form model, features are exactly uni+bigrams, and the integer
  * score is partitioning-independent (the property that makes the gate
  * decision bit-stable on any cluster layout).
  */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("broadcast model array equals the closed-form weights, bounded to [-500, 500]") {
    val w = Classifier.model(spark).select(explode(col("w")).as("w"))
      .as[Long].collect()
    assert(w.length == Classifier.Buckets)
    w.zipWithIndex.foreach { case (v, b) =>
      val expect = (b.toLong * 2654435761L) % 1001L - 500L
      assert(v == expect, s"bucket $b: $v != $expect")
      assert(v >= -500 && v <= 500)
    }
  }

  test("file-loaded model equals the generator model, element for element") {
    val gen = Classifier.model(spark).select(explode(col("w")).as("w"))
      .as[Long].collect()
    val path = Classifier.ensureWeightsArtifact(spark)
    val loaded = Classifier.modelFromFile(spark, path)
      .select(explode(col("w")).as("w")).as[Long].collect()
    assert(loaded.length == Classifier.Buckets)
    assert(loaded.toSeq == gen.toSeq,
      "artifact path diverges from the closed-form generator")
    // a second call is a pure read (idempotent ensure)
    assert(Classifier.ensureWeightsArtifact(spark) == path)
  }

  test("model file validation rejects truncated or gapped weight files") {
    val bad = spark.conf.get("spark.sql.warehouse.dir") + "/graft_classifier_bad"
    spark.range(10).select(col("id").as("bucket"), col("id").as("milli_w"))
      .write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException] {
      Classifier.modelFromFile(spark, bad)
    }
  }

  test("features are uni+bigrams; 1-token docs have no bigrams") {
    val got = Seq("alpha beta gamma", "solo").toDF("text")
      .select(Classifier.features(Portable.tokens(col("text"))).as("f"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("alpha", "beta", "gamma", "alpha_beta", "beta_gamma"))
    assert(got(1) == Seq("solo"))
  }

  test("score is partitioning-independent and the label gate matches its sign") {
    val q = Classifier.queries.find(_.name == "x_classifier_score").get
    val out = q.build(spark, sf)
      .select("doc_id", "score", "label")
      .as[(Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, s, l) =>
      assert((s >= 0) == (l == "keep"), s"doc $id: score $s labeled $l")
    }
    // inline corpus scored under two different partitionings: integer
    // fold => identical scores (no float accumulation-order hazard)
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, s"tok$i alpha beta gamma${i % 7}")).toDF("doc_id", "text")
    def score(parts: Int): Map[Long, Long] = docs.repartition(parts)
      .crossJoin(broadcast(Classifier.model(spark)))
      .select(col("doc_id"),
        aggregate(Classifier.features(Portable.tokens(col("text"))), lit(0L),
          (a, f) => a + element_at(col("w"), Classifier.bucket(f).cast("int") + 1))
          .as("s"))
      .as[(Long, Long)].collect().toMap
    assert(score(2) == score(13))
  }

  test("scoring kernel ≡ the HOF hash-and-fold on adversarial docs") {
    // unicode (multi-byte UTF-8 through the digest), single token (no
    // bigrams), repeats (same bucket folded twice), long tokens, and
    // tokens containing the bigram separator itself
    val docs = Seq(
      "alpha beta gamma", "solo", "a a a a", "héllo wörld ünïcode 日本語",
      "x_y z x_y", "the quick brown fox jumps over the lazy dog").zipWithIndex
      .map(_.swap).toDF("id", "text")
    val w = Array.tabulate(Classifier.Buckets)(b =>
      (b.toLong * 2654435761L) % 1001L - 500L)
    val kern = docs.select(col("id"),
        graft.functions.ArrayOps.hashedFeatureScore(
          Portable.tokens(col("text")), w, Classifier.Buckets).as("fs"))
      .select(col("id"), col("fs.n_features"), col("fs.score"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val hof = docs.crossJoin(broadcast(Classifier.model(spark)))
      .select(col("id"),
        size(Classifier.features(Portable.tokens(col("text")))).cast("long"),
        aggregate(Classifier.features(Portable.tokens(col("text"))), lit(0L),
          (a, f) => a + element_at(col("w"), Classifier.bucket(f).cast("int") + 1)))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(kern == hof, s"kernel diverged from HOF:\nk=$kern\nh=$hof")
    // and the trainer's bucket-array kernel: same buckets, same ORDER
    // (unigrams then bigrams — the features() contract)
    val kb = docs.select(col("id"),
        graft.functions.ArrayOps.hashedFeatureBuckets(
          Portable.tokens(col("text")), Classifier.Buckets).as("fb"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toSeq
    val hb = docs.select(col("id"),
        transform(Classifier.features(Portable.tokens(col("text"))),
          f => Classifier.bucket(f)).as("fb"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(kb == hb, s"bucket kernel diverged:\nk=$kb\nh=$hb")
  }

  test("train→file→serve round trip: artifact == trained weights, artifact hit never retrains, stale fingerprints get their own path") {
    // start clean: no committed trained artifact, no memo
    val p = new org.apache.hadoop.fs.Path(Classifier.trainedWeightsPath(spark, sf))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    Classifier.clearLrMemo()
    val runs0 = Classifier.lrLoopRuns.get()

    // first touch trains once and COMMITS the dense weight file
    val path = Classifier.ensureTrainedWeightsArtifact(spark, sf)
    assert(Classifier.lrLoopRuns.get() == runs0 + 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      "training did not commit the trained-weights artifact")
    val trained = Classifier.lrTrainedWeights(spark, sf)

    // simulated fresh JVM: the served model comes FROM THE FILE, equals
    // the in-memory trained vector element for element, and the ensure
    // is a pure read (no retraining)
    Classifier.clearLrMemo()
    val loaded = Classifier.modelFromFile(spark,
        Classifier.ensureTrainedWeightsArtifact(spark, sf), "w")
      .select(explode(col("w")).as("w")).as[Long].collect()
    assert(Classifier.lrLoopRuns.get() == runs0 + 1,
      "artifact hit must not retrain")
    assert(loaded.toSeq == trained.toSeq,
      "file-served weights diverge from the trained vector")

    // a DIFFERENT corpus fingerprints to a DIFFERENT path: stale
    // weights can never be served across corpora by construction
    assert(Classifier.trainedWeightsPath(spark, sf) !=
      Classifier.trainedWeightsPath(spark, "/root/testdata/sf0.01"))

    // and the path carries the model geometry (a resized feature space
    // or changed round count is a different model)
    assert(path.contains(s"b${Classifier.Buckets}") &&
      path.contains(s"r${Classifier.LrRounds}"))
  }

  test("perceptron trainer: error falls, the marker's bucket goes positive, rounds deterministic") {
    val rows = Classifier.lrTrain(spark, sf)
      .orderBy("round").as[(Long, Long, Long)].collect()
    assert(rows.length == Classifier.LrRounds)
    val total = sources.Tables.documents(spark, sf).count()
    // round 1 scores under w0 = 0: everything misclassifies by definition
    assert(rows.head._2 == total, s"round-1 n_miss ${rows.head._2} != corpus $total")
    // the label IS learnable from the hashed features (the marker's own
    // unigram bucket), so training error must FALL across the rounds
    assert(rows.last._2 < rows.head._2,
      s"training error did not fall: ${rows.map(_._2).mkString(",")}")
    // the decisive feature carries positive weight after training
    val w = Classifier.lrTrainedWeights(spark, sf)
    val markerBucket = spark.range(1)
      .select(Classifier.bucket(lit(Classifier.LabelMarker)).cast("int"))
      .head().getInt(0)
    assert(w(markerBucket) > 0,
      s"marker bucket $markerBucket weight ${w(markerBucket)} not positive")
    // integer algebra: a FRESH training run (memo dropped — otherwise
    // this would just read the cache back) reproduces the rounds
    // bit-for-bit
    Classifier.clearLrMemo()
    val again = Classifier.lrTrain(spark, sf)
      .orderBy("round").as[(Long, Long, Long)].collect()
    assert(again.toSeq == rows.toSeq)
  }
}
