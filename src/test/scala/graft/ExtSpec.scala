package graft

import graft.ext.{Multimodal, Portable}
import org.apache.spark.sql.functions._

/** Specs for the training-pipeline extension primitives. */
class ExtSpec extends SparkTestBase {
  import spark.implicits._

  test("ngram novelty: frac in [0,1], novel <= total, duplicated text scores 0 novel") {
    import org.apache.spark.sql.functions._
    val nov = SparkEntry.queries("x_ngram_novelty")(spark, sf)
    assert(nov.count() > 0)
    assert(nov.where(col("n_novel") > col("n_shingles")).count() == 0)
    assert(nov.where(col("novel_frac") < 0 || col("novel_frac") > 1).count() == 0)
    // two identical docs: every shingle has df 2 -> both score 0 novelty
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota")).toDF("doc_id", "text")
    val e = docs.select(col("doc_id"),
      explode(graft.ext.Portable.shingles3(graft.ext.Portable.tokens(col("text")))).as("g"))
    val df = e.groupBy("g").agg(count(lit(1)).as("df"))
    val out = e.join(df, "g").groupBy("doc_id")
      .agg(sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 3)
  }

  test("pca power: |projection| <= ||v|| (unit axis, Cauchy-Schwarz) and engages") {
    import org.apache.spark.sql.functions._
    val scores = SparkEntry.queries("x_pca_power")(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), aggregate(col("embedding"),
        lit(0.0), (a, v) => a + v.cast("double") * v.cast("double")).as("nsq"))
    val joined = scores.join(emb, "vec_id")
    assert(joined.count() > 0)
    // 6-dp output rounding can push |score| past ||v|| by half an ulp
    assert(joined.where(col("score") * col("score") > col("nsq") + lit(1e-5)).count() == 0)
    assert(scores.where(col("score") =!= 0.0).count() > 0, "all projections zero")
  }

  test("containment: a strict-subset doc scores 1.0 toward its container, less back") {
    import org.apache.spark.sql.functions._
    // doc 1's shingles are a strict subset of doc 2's
    val docs = Seq(
      (1L, "a b c d"),                // shingles: abc, bcd
      (2L, "a b c d e f")).toDF("doc_id", "text") // abc, bcd, cde, def
    val e = docs.select(col("doc_id"),
      explode(graft.ext.Portable.shingles3(graft.ext.Portable.tokens(col("text")))).as("g"))
    val n = docs.select(col("doc_id"),
      size(graft.ext.Portable.shingles3(graft.ext.Portable.tokens(col("text")))).as("ns"))
    val p = e.as("a").join(e.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val c = p.join(n.as("na"), col("doc_a") === col("na.doc_id"))
      .select(col("doc_a"), col("doc_b"), (col("inter") * 1.0 / col("na.ns")).as("cm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((1L, 2L)) == 1.0, s"subset containment should be 1.0, got ${c((1L, 2L))}")
    assert(c((2L, 1L)) == 0.5, s"reverse containment should be 2/4, got ${c((2L, 1L))}")
  }

  test("minhash: identical docs get identical signatures; disjoint docs differ") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "q r s t u v w x y z zz")).toDF("doc_id", "text")
      .select(col("doc_id"), Portable.minhashSig(
        Portable.shingles3(Portable.tokens(col("text")))).as("sig"))
    val sigs = df.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs.forall(_.size == Portable.MinhashK))
  }

  test("minhash signature agreement approximates jaccard (sanity band)") {
    // two docs sharing most shingles should agree on most signature rows
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz")).toDF("doc_id", "text")
      .select(col("doc_id"), Portable.minhashSig(
        Portable.shingles3(Portable.tokens(col("text")))).as("sig"))
    val Array(a, b) = df.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree >= Portable.MinhashK / 2) // true jaccard ~ 9/15
  }

  test("shingles: fewer than 3 tokens -> empty; n tokens -> n-2 distinct-capped") {
    val got = Seq((1, "a b"), (2, "a b c d"), (3, "x x x x"))
      .toDF("id", "text")
      .select(col("id"), Portable.shingles3(Portable.tokens(col("text"))).as("sh"))
      .orderBy("id").select("sh").as[Seq[String]].collect()
    assert(got(0).isEmpty)
    assert(got(1) == Seq("a b c", "b c d"))
    assert(got(2) == Seq("x x x")) // distinct collapses repeats
  }

  test("simhash: equal for identical docs, within 32 bits, order-weighted") {
    val got = Seq((1L, "a b c"), (2L, "a b c"), (3L, "z z z z z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Portable.simhash32(Portable.tokens(col("text"))).as("s"))
      .orderBy("doc_id").select("s").as[Long].collect()
    assert(got(0) == got(1))
    assert(got.forall(s => s >= 0 && s < (1L << 32)))
  }

  test("cosine: self-similarity is 1, orthogonal is 0, zero vector is null") {
    val df = Seq(
      (1, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (2, Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)),
      (3, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("id", "a", "b")
      .select(col("id"), Portable.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").select("c").as[Option[Double]].collect()
    assert(math.abs(df(0).get - 1.0) < 1e-12)
    assert(math.abs(df(1).get) < 1e-12)
    assert(df(2).isEmpty)
  }

  test("fingerprint: deterministic, order-sensitive") {
    val got = Seq((1L, "ab"), (2L, "ab"), (3L, "ba")).toDF("id", "t")
      .select(col("id"), Portable.fingerprint(col("t")).as("fp"))
      .orderBy("id").select("fp").as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
    // h("ab") = (0*31 + 97)*31 + 98 = 3105
    assert(got(0) == 97L * 31 + 98)
  }

  test("ppm codec: decodes spec-grammar headers it never synthesized") {
    import graft.ext.Multimodal.PpmDecoder
    // multi-digit dims, comments between tokens, CRLF whitespace — none
    // of which buildPpm emits, so passing proves a real parser, not a
    // round-trip of the synthesis format
    val w = 12; val h = 3
    val header = s"P6 # wide\n# comment line\n $w\t$h\r\n255 "
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = Array.tabulate(w * h * 3)(i => ((i * 11) % 256).toByte)
    val f = PpmDecoder.features(header ++ raster)
    assert(f.width == w && f.height == h)
    assert(f.nBytes == header.length + raster.length)
    val expected = (0 until w * h).map { j =>
      val r = (j * 33) % 256; val g = (j * 33 + 11) % 256; val b = (j * 33 + 22) % 256
      (2126L * r + 7152L * g + 722L * b) / 10000L
    }.sum
    assert(f.lumaSum == expected)
    // sample == features' per-pixel term
    assert(PpmDecoder.sample(header ++ raster, 5L) ==
      (2126L * (5 * 33 % 256) + 7152L * ((5 * 33 + 11) % 256) + 722L * ((5 * 33 + 22) % 256)) / 10000L)
  }

  test("ppm codec: rejects bad magic, truncated raster, out-of-range sample") {
    import graft.ext.Multimodal.PpmDecoder
    val good = graft.ext.Multimodal.buildPpm(7L, 13L)
    intercept[IllegalArgumentException] {
      PpmDecoder.features("P5\n1 1\n255\nxxx".getBytes)
    }
    intercept[IllegalArgumentException] {
      PpmDecoder.features(good.dropRight(1))
    }
    intercept[IllegalArgumentException] {
      val (w, h, _, _) = PpmDecoder.header(good)
      PpmDecoder.sample(good, w.toLong * h)
    }
    // hostile dims must fail LOUDLY, not wrap w*h*3 negative and return
    // zero features against a spuriously-passing truncation check
    intercept[IllegalArgumentException] {
      PpmDecoder.features("P6\n100000 100000\n255\n".getBytes ++ Array.fill(64)(0.toByte))
    }
    intercept[IllegalArgumentException] {
      PpmDecoder.features("P6\n99999999999999999999 1\n255\n".getBytes)
    }
  }

  test("ppm round-trip: decoder recovers the synthesis formulas") {
    import graft.ext.Multimodal
    for (docId <- Seq(0L, 7L, 250L, 251L); nChars <- Seq(0L, 1L, 9L, 4321L)) {
      val f = Multimodal.PpmDecoder.features(Multimodal.buildPpm(docId, nChars))
      assert(f.width == nChars % 8 + 1)
      assert(f.height == nChars * 7 % 8 + 1)
      assert(f.nBytes == 11 + f.width * f.height * 3)
      val seed = docId % 251
      val expect = (0L until f.width * f.height).map { j =>
        (2126L * ((seed + 21 * j) % 256) + 7152L * ((seed + 21 * j + 7) % 256)
          + 722L * ((seed + 21 * j + 14) % 256)) / 10000L
      }.sum
      assert(f.lumaSum == expect, s"doc $docId nChars $nChars")
    }
  }

  test("multimodal: features deterministic across partition layouts") {
    val f1 = Multimodal.features(spark, sf).orderBy("doc_id").collect().toSeq
    val f2 = Multimodal.features(spark, sf).repartition(7).orderBy("doc_id").collect().toSeq
    assert(f1 == f2)
    assert(f1.nonEmpty)
  }

  test("multimodal frame sampling: k rows per non-empty payload, offsets ascend") {
    val fr = Multimodal.frames(spark, sf).collect()
    val byDoc = fr.groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      assert(rows.length == Multimodal.FramesPerDoc, s"doc $id frame count")
      val sorted = rows.sortBy(_.frame_no)
      assert(sorted.map(_.frame_off).toSeq == sorted.map(_.frame_off).toSeq.sorted,
        s"doc $id offsets not monotone")
      assert(sorted.head.frame_off == 0L)
    }
  }

  test("flatten: nested structs -> underscore-joined leaf columns") {
    import org.apache.spark.sql.functions.struct
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
      .select(col("a"), struct(col("b"), struct(col("c").as("deep")).as("in")).as("nest"))
    val flat = graft.sources.Flatten(df)
    assert(flat.columns.toSeq == Seq("a", "nest_b", "nest_in_deep"))
    assert(flat.collect().head.toSeq == Seq(1, 2, 3))
  }

  test("e4 SRP-LSH results are a subset of e1 exhaustive near-dup pairs") {
    val e1 = graft.ext.Similarity.queries.find(_.name == "e1_cosine_neardup").get
      .build(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val e4 = graft.ext.Similarity.queries.find(_.name == "e4_srp_lsh").get
      .build(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e4.subsetOf(e1), s"LSH found pairs brute force did not: ${e4 -- e1}")
  }

  test("IVF multi-probe recall dominates single-probe against exact brute force") {
    def pairs(name: String) = graft.ext.Similarity.queries.find(_.name == name).get
      .build(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("e2_knn_brute")
    val probe1 = pairs("e3_knn_ivf")
    val probe2 = pairs("e5_knn_ivf_nprobe2")
    val r1 = (probe1 & exact).size
    val r2 = (probe2 & exact).size
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    assert(r2 > 0)
  }

  test("e2 kNN broadcasts the tiny QUERY side, streams the corpus") {
    // building the corpus side would OOM at scale — pin the plan shape
    val df = graft.ext.Similarity.queries.find(_.name == "e2_knn_brute").get
      .build(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val bIdx = plan.indexOf("BroadcastExchange")
    assert(bIdx >= 0, s"no broadcast in plan:\n$plan")
    // the broadcast subtree (printed below the exchange) must be the
    // filtered 5-row query side, not the full corpus scan
    assert(plan.substring(bIdx).contains("< 5"),
      s"broadcast side is not the query filter:\n$plan")
  }
}
