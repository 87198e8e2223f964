package graft

import org.apache.spark.sql.functions._

/** Specs for the round-2 extension additions: repetition filters,
  * stratified sampling, embedding centroids.
  */
class Ext2Spec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("x_repetition: hand-computed metrics on known docs") {
    // independent driver-side recomputation (plain Scala collections,
    // no shared Column code) must agree cell-for-cell
    val got = run("x_repetition")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_token_frac", "top_bigram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val n = toks.size
      val topT = toks.groupBy(identity).values.map(_.size).max
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val (nt, dup, top, topB) = got(id)
      assert(nt == n)
      assert(dup == r6(1.0 - toks.distinct.size.toDouble / n))
      assert(top == r6(topT.toDouble / n))
      if (n >= 2) {
        val topBg = bgs.groupBy(identity).values.map(_.size).max
        assert(topB.contains(r6(topBg.toDouble / (n - 1))))
      } else assert(topB.isEmpty)
    }
  }

  test("x_stratified: exactly min(K, |group|) rows per lang, deterministic") {
    val k = ops.Cube.StratifiedK
    val sizes = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val a = run("x_stratified").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perLang = a.groupBy(_._2)
    assert(perLang.keySet == sizes.keySet)
    perLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, sizes(lang)))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val b = run("x_stratified").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.toSet == b.toSet) // hash rank, not RNG: re-run identical
  }

  test("e6_centroids: matches driver-computed quantized mean per (label, pos)") {
    val got = run("e6_centroids").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").as[(Int, Seq[Float])].collect()
    val dims = vecs.head._2.size
    assert(got.size == vecs.map(_._1).distinct.size * dims)
    // half-away-from-zero, matching Spark/DuckDB round-at-scale-0 on
    // doubles (math.round is half-toward-+inf: differs on negative halves)
    def rnd(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val byLabel = vecs.groupBy(_._1)
    byLabel.foreach { case (label, vs) =>
      (0 until dims).foreach { p =>
        val q = vs.map(v => rnd(v._2(p).toDouble * 1e6))
        val want = rnd(q.sum.toDouble / (1e6 * q.size) * 1e6) / 1e6
        val (n, c) = got((label, p.toLong))
        assert(n == q.size)
        assert(c == want, s"label=$label pos=$p")
      }
    }
  }

  test("d7/d8: near-dup pairs land in one component; exactly one keep per component") {
    val comp = run("d8_dedup_keep")
      .select("doc_id", "component", "keep")
      .as[(Long, Long, Boolean)].collect()
    val byDoc = comp.map(r => r._1 -> r._2).toMap
    // d8 covers the whole corpus, components are min-labels
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(comp.length == nDocs)
    comp.foreach { case (doc, c, _) => assert(c <= doc) }
    // every verified near-dup pair collapses into the same component
    val pairs = run("d4_ngram_jaccard")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across components")
    }
    // the keep policy: exactly one survivor per component
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.count(_._3) == 1, s"component $c keep count != 1")
    }
    // d7 (pairs-only view) agrees with d8's labels on its domain
    val d7 = run("d7_cc_groups")
      .select("doc_id", "component").as[(Long, Long)].collect()
    d7.foreach { case (doc, c) => assert(byDoc(doc) == c) }
  }

  test("d9: benchmark docs excluded, collisions real") {
    val hits = run("d9_decontaminate")
      .select("doc_id", "n_bench_docs", "n_shared_shingles")
      .as[(Long, Long, Long)].collect()
    assert(hits.nonEmpty)
    hits.foreach { case (doc, nb, ns) =>
      assert(doc % 97 != 0, s"benchmark doc $doc flagged as corpus")
      assert(nb >= 1 && ns >= 1)
    }
  }
}
