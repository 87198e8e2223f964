package graft

import graft.ext.{Corpus, Embeddings}
import org.apache.spark.sql.functions._

/** Round-4 extension surface: sequence packing, BM25 retrieval scoring,
  * Zipf vocabulary stats, product quantization, the exact Lloyd step,
  * and grouping sets.
  */
class Ext4Spec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("x_pack: blocks are full, offsets conserve tokens, one head per doc") {
    val out = run("x_pack").cache()
    // token conservation: per-doc contributions sum to the doc's count
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
    val leaked = out.groupBy("doc_id").agg(sum("n_tok_in_block").as("got"))
      .join(docs, "doc_id").where(col("got") =!= col("n_tok")).count()
    assert(leaked == 0)
    // every block except the last is exactly full; none exceeds capacity
    val perBlock = out.groupBy("block_id").agg(sum("n_tok_in_block").as("fill")).cache()
    val maxBlock = perBlock.agg(max("block_id")).head.getLong(0)
    assert(perBlock.where(col("fill") > Corpus.PackBlock).count() == 0)
    assert(perBlock.where(col("block_id") < maxBlock &&
      col("fill") =!= Corpus.PackBlock).count() == 0)
    // exactly one head row per doc
    val badHead = out.groupBy("doc_id").agg(sum("is_head").as("h"))
      .where(col("h") =!= 1).count()
    assert(badHead == 0)
    perBlock.unpersist(); out.unpersist()
  }

  test("x_pack: matches the single-window reference cumsum") {
    // the distributed two-phase prefix sum must equal the naive global
    // window (what the DuckDB oracle computes)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = docs.withColumn("off", coalesce(sum("n_tok").over(w), lit(0L)))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("off"))
    val got = ext.Corpus.packedBlocks(spark, sf)
      .where(col("is_head") === 1)
      .join(ref, "doc_id")
      .where(col("block_id") =!= expr(s"off div ${Corpus.PackBlock}"))
    assert(got.count() == 0)
  }

  test("x_bm25: ranked docs contain the term; rank ordered by the key") {
    val out = run("x_bm25").cache()
    assert(out.where(col("tf") < 1).count() == 0)
    // ranked docs actually contain the query term
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val present = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term")).distinct()
    assert(out.join(present, Seq("doc_id", "term"), "left_anti").count() == 0)
    // ranks are 1..k contiguous per term
    val ranks = out.groupBy("term")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
    assert(ranks.where(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    // scores are non-increasing in rank within a term (idf is constant
    // per term, so reported bm25 must follow the rank key ordering up to
    // 6dp rounding ties)
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("rk")
    val inv = out.withColumn("prev", lag(col("bm25"), 1).over(wTerm))
      .where(col("prev").isNotNull && col("bm25") > col("prev") + 1e-9)
    assert(inv.count() == 0)
    out.unpersist()
  }

  test("x_zipf: contiguous ranks, non-increasing freq, cumulative share") {
    val out = run("x_zipf").cache()
    val rows = out.orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    val freqs = rows.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    val shares = rows.map(_.getDouble(3))
    val cums = rows.map(_.getDouble(4))
    // cum_share is the running sum of share (6dp rounding slack)
    val runSum = shares.scanLeft(0.0)(_ + _).tail
    assert(cums.zip(runSum).forall { case (c, r) => math.abs(c - r) < 1e-5 })
    assert(cums.last <= 1.0 + 1e-9)
    out.unpersist()
  }

  test("e8_pq: 8 codes per vector, each the argmin codeword") {
    val out = run("e8_pq").cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.count() == n * Embeddings.PqM)
    assert(out.where(col("err2") < -1e-9).count() == 0)
    // independently recompute the argmin for subspace 0 and compare
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cw = e.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("label").orderBy("vec_id")))
      .where(col("rn") === 1)
      .select(col("label").as("cl"), col("embedding").as("ce"))
    val sd = Embeddings.SubDim
    val d2 = expr(
      s"""aggregate(zip_with(slice(embedding, 1, $sd), slice(ce, 1, $sd),
         |  (x, y) -> (double(x) - double(y)) * (double(x) - double(y))), 0d, (a, v) -> a + v)""".stripMargin)
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d2"), col("cl"))
    val ref = e.crossJoin(cw).withColumn("d2", d2)
      .withColumn("rn", row_number().over(wv)).where(col("rn") === 1)
      .select(col("vec_id"), col("cl").as("ref_code"))
    val mismatch = out.where(col("m") === 0).join(ref, "vec_id")
      .where(col("code") =!= col("ref_code")).count()
    assert(mismatch == 0)
    out.unpersist()
  }

  test("e9_kmeans_step: memberships partition the corpus; centroids in range") {
    val out = run("e9_kmeans_step").cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // per pos, cluster sizes sum to the corpus size
    val bad = out.groupBy("pos").agg(sum("n").as("tot"))
      .where(col("tot") =!= n).count()
    assert(bad == 0)
    // centroid components stay inside the corpus value range per pos
    val rng = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
    val outOfRange = out.join(rng, "pos")
      .where(col("centroid") < col("lo") - 1e-6 || col("centroid") > col("hi") + 1e-6)
    assert(outOfRange.count() == 0)
    out.unpersist()
  }

  test("a13_grouping_sets: equals the union of the two one-dim aggregations") {
    val out = run("a13_grouping_sets")
    val ev = graft.sources.Tables.events(spark, sf)
      .select(graft.sources.Bars.symbolFor(col("user_id")).as("symbol"),
        col("event_type"), col("value"))
    val bySym = ev.groupBy("symbol").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("symbol"), lit("ALL").as("event_type"), col("n"),
        Q.r6(col("value_sum")).as("value_sum"))
    val byTyp = ev.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(lit("ALL").as("symbol"), col("event_type"), col("n"),
        Q.r6(col("value_sum")).as("value_sum"))
    val ref = bySym.unionByName(byTyp)
    assert(out.except(ref).count() == 0 && ref.except(out).count() == 0)
  }

  test("e4: first-band emit produces a duplicate-free candidate verify set") {
    val out = run("e4_srp_lsh")
    // (vec_a, vec_b) appears at most once — the no-earlier-match filter
    // must fully replace the DISTINCT
    val dup = out.groupBy("vec_a", "vec_b").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).count()
    assert(dup == 0)
  }

  test("x_winnow: digests match an independent driver-side winnow") {
    def sha32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = run("x_winnow").where(col("doc_id") < 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val hs = toks.sliding(3).filter(_.length == 3).map(g => sha32(g.mkString(" "))).toVector
      val sel = if (hs.length >= 4) hs.sliding(4).map(_.min).toVector.distinct else Vector()
      assert(out(id) == ((hs.length.toLong, sel.length.toLong, sel.sum)),
        s"doc $id winnow mismatch")
    }
  }

  test("e4w wide bands: precision 1 (subset of exact pairs), narrower than e4") {
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(ext.Similarity.gridNearDup(spark, sf))
    val e4 = pairs(run("e4_srp_lsh"))
    val wide = pairs(run("e4w_srp_wide"))
    assert((wide -- exact).isEmpty, "wide banding must keep precision 1")
    // 8-bit bands can only lose candidates relative to the 4-bit prefix
    // bands sharing their planes... not strictly (band partitions differ),
    // so assert the weaker measured property: no wider result set
    assert(wide.size <= e4.size)
  }
}
