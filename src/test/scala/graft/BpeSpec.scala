package graft

import graft.ext.Lm
import org.apache.spark.sql.functions._

/** The BPE trainer contract: merge application is GREEDY left-to-right
  * (a matched position consumes its right neighbor — the semantics that
  * distinguish real BPE from a stateless substitution), the argmax is a
  * deterministic total order, and the corpus symbol count shrinks by
  * exactly the number of applied merges each round.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def apply1(sym: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(sym)).toDF("sym")
      .select(Lm.bpeApply(col("sym"), a, b).as("out"))
      .as[Seq[String]].head()

  test("greedy merge application: runs, chains, no-ops, single tokens") {
    // identical-pair run: [a,a,a] under (a,a) merges ONCE (greedy
    // consumption), not twice
    assert(apply1(Seq("a", "a", "a"), "a", "a") == Seq("a_a", "a"))
    assert(apply1(Seq("a", "a", "a", "a"), "a", "a") == Seq("a_a", "a_a"))
    // disjoint repeats all merge in one pass
    assert(apply1(Seq("a", "b", "a", "b"), "a", "b") == Seq("a_b", "a_b"))
    // consumption blocks the FOLLOWING overlapping pair
    assert(apply1(Seq("x", "a", "b", "b"), "a", "b") == Seq("x", "a_b", "b"))
    // no match -> identity; single symbol -> identity
    assert(apply1(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(apply1(Seq("solo"), "a", "b") == Seq("solo"))
  }

  test("encode: total symbols equals the trainer's final n_syms; merged tokens present") {
    val train = Lm.bpeTrain(spark, sf).orderBy(col("round").desc).head()
    val enc = Lm.bpeEncode(spark, sf)
    val total = enc.agg(sum(col("n_syms"))).head().getLong(0)
    assert(total == train.getAs[Long]("n_syms"),
      s"encode total $total != trainer final n_syms ${train.getAs[Long]("n_syms")}")
    // the last-round merge token a_b appears somewhere in the encoding
    val merged = train.getAs[String]("a") + "_" + train.getAs[String]("b")
    assert(enc.where(col("enc").contains(merged)).count() > 0)
  }

  test("single-pass encode ≡ K-pass encode on the gate corpus (round-13 task 2)") {
    // the serve path folds the whole merge table into ONE projection;
    // it must reproduce the K chained rewrite passes row for row
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "n_syms", "enc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val onePass = rows(Lm.bpeEncode(spark, sf))
    val kPass = rows(Lm.bpeEncodeKPass(spark, sf))
    assert(onePass == kPass,
      s"single-pass diverged: only-one=${(onePass -- kPass).take(3)} " +
        s"only-k=${(kPass -- onePass).take(3)}")
    // and the single-pass plan really is one scan: no LogicalRDD
    // (checkpoint materialization) anywhere in it
    val plan = Lm.bpeEncode(spark, sf).queryExecution.optimizedPlan
    val rdds = plan.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr }
    assert(rdds.isEmpty, "single-pass encode must not checkpoint the corpus")
    // empty merge table degenerates to identity (guard path)
    import spark.implicits._
    val id = Seq(Tuple1(Seq("x", "y"))).toDF("sym")
      .select(Lm.bpeApplyAll(col("sym"), Nil).as("out"))
      .as[Seq[String]].head()
    assert(id == Seq("x", "y"))
  }

  test("bpeEncodeAll kernel ≡ the HOF fold on adversarial merge chains") {
    import spark.implicits._
    // chains that exercise greedy consumption, merge-created pairs that
    // a LATER round does/doesn't see, runs, and 1-token docs
    val docs = Seq(
      Seq("a", "a", "a", "a", "a"),
      Seq("a", "b", "a", "b", "c"),
      Seq("a", "b", "b", "c", "a", "b"),
      Seq("x"),
      Seq("a_b", "c", "a", "b"), // pre-merged token colliding with a merge result
      Seq("c", "a", "b", "c")).zipWithIndex.map(_.swap).toDF("id", "sym")
    val merges = Seq(("a", "b"), ("a_b", "c"), ("a", "a"))
    def run(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("out")).as[(Int, Seq[String])]
        .collect().sortBy(_._1).toSeq
    val kern = run(graft.functions.ArrayOps.bpeEncodeAll(col("sym"), merges))
    val hof = run(Lm.bpeApplyAll(col("sym"), merges))
    assert(kern == hof, s"kernel diverged from HOF:\nk=$kern\nh=$hof")
    // the rank-greedy heap kernel (round-14): this table satisfies the
    // greedy precondition (the a_b operand aliases an EARLIER output,
    // which is fine — only later-output aliasing diverges), so it must
    // match bit for bit on the same adversarial chains
    assert(graft.functions.ArrayOps.greedySafe(merges))
    val greedy = run(graft.functions.ArrayOps.bpeEncodeGreedy(col("sym"), merges))
    assert(greedy == hof, s"greedy kernel diverged from HOF:\ng=$greedy\nh=$hof")
  }

  test("greedy-heap kernel: unsafe table dispatches to K-pass; direct use refuses") {
    import spark.implicits._
    // (x, a_b) references the OUTPUT of the LATER merge (a, b): after
    // the heap merges rank-1 (a, b), a NEW rank-0 occurrence (x, a_b)
    // appears, which the heap would merge and a K-pass replay would not
    // — the exact divergence greedySafe exists to catch
    val unsafe = Seq(("x", "a_b"), ("a", "b"))
    assert(!graft.functions.ArrayOps.greedySafe(unsafe))
    intercept[IllegalArgumentException] {
      graft.functions.ArrayOps.bpeEncodeGreedy(col("sym"), unsafe)
    }
    // the dispatch serves the K-pass kernel instead — identical to the
    // HOF fold (K-pass semantics preserved: x a b -> x a_b, NOT x_a_b)
    val docs = Seq((0, Seq("x", "a", "b")), (1, Seq("a", "b", "x", "a", "b")))
      .toDF("id", "sym")
    def run(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("out")).as[(Int, Seq[String])]
        .collect().sortBy(_._1).toSeq
    val auto = run(graft.functions.ArrayOps.bpeEncodeAuto(col("sym"), unsafe))
    val hof = run(Lm.bpeApplyAll(col("sym"), unsafe))
    assert(auto == hof, s"dispatch diverged from K-pass semantics:\na=$auto\nh=$hof")
    assert(auto.head._2 == Seq("x", "a_b"), s"K-pass semantics must hold: $auto")
  }

  test("greedy-heap kernel ≡ K-pass kernel at K=64 and K=1024 over the gate corpus") {
    import spark.implicits._
    // trained tables at two widths (the 1024 ask exercises a table far
    // past the demo K; the gate corpus may exhaust first — whatever
    // prefix trains is the table both kernels must agree on)
    val m64 = Lm.bpeTrainLoop(spark, sf, rounds = 64).map(m => (m.a, m.b))
    val m1024 = Lm.bpeTrainLoop(spark, sf, rounds = 1024).map(m => (m.a, m.b))
    info(s"trained widths: K=${m64.length} and K=${m1024.length}")
    val corpus = ext.Portable
      .spread(sources.Tables.documents(spark, sf), "doc_id")
      .select(col("doc_id"), ext.Portable.tokens(col("text")).as("sym"))
      .localCheckpoint()
    def enc(merges: Seq[(String, String)], greedy: Boolean): Map[Long, Seq[String]] = {
      val c = if (greedy) graft.functions.ArrayOps.bpeEncodeGreedy(col("sym"), merges)
        else graft.functions.ArrayOps.bpeEncodeAll(col("sym"), merges)
      corpus.select(col("doc_id"), c.as("out")).as[(Long, Seq[String])]
        .collect().toMap
    }
    Seq(m64, m1024).foreach { m =>
      assert(graft.functions.ArrayOps.greedySafe(m))
      val t0 = System.nanoTime()
      val g = enc(m, greedy = true)
      val tg = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      val k = enc(m, greedy = false)
      val tk = (System.nanoTime() - t1) / 1e6
      info(f"K=${m.length}: greedy $tg%.0f ms, K-pass $tk%.0f ms")
      assert(g == k, s"kernels diverged at K=${m.length}: " +
        s"${(g.toSet -- k.toSet).take(2)} vs ${(k.toSet -- g.toSet).take(2)}")
    }
  }

  test("trainer: deterministic merge table, symbol count shrinks by the applied merges") {
    val t1 = Lm.bpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    val t2 = Lm.bpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    assert(t1 == t2, "two training runs disagree")
    assert(t1.length == Lm.BpeRounds)

    val before = graft.ext.Portable
      .spread(graft.sources.Tables.documents(spark, sf), "doc_id")
      .select(explode(split(col("text"), " "))).count()
    var prev = before
    t1.foreach { row =>
      val (cnt, nSyms) = (row(3).asInstanceOf[Long], row(4).asInstanceOf[Long])
      val merged = prev - nSyms
      // each applied merge removes exactly one symbol; greedy overlap
      // can apply fewer merges than the pair count, never more
      assert(merged > 0 && merged <= cnt, s"round ${row(0)}: merged=$merged cnt=$cnt")
      prev = nSyms
    }
  }

  test("checkpoint chain releases each predecessor; the live link stays persisted") {
    import org.apache.spark.storage.StorageLevel
    var df = spark.range(0, 1000).toDF("id").localCheckpoint()
    var links = List(df)
    (1 to 5).foreach { _ =>
      df = Lm.rollCheckpointForTest(df, df.select((col("id") + 1).as("id")))
      links ::= df
    }
    def rddOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.get
    // head = live link: persisted; every predecessor: released
    assert(rddOf(links.head).getStorageLevel != StorageLevel.NONE,
      "live checkpoint must stay persisted")
    links.tail.foreach { d =>
      assert(rddOf(d).getStorageLevel == StorageLevel.NONE,
        "predecessor checkpoint not released")
    }
    // and the chain still computes the right thing after the releases
    assert(df.agg(sum(col("id"))).head().getLong(0) == (5L until 1005L).sum)
  }

  test("K=64 merge rounds: flat per-round cost, monotone symbol shrink (round-11 task 5)") {
    val times = scala.collection.mutable.ArrayBuffer.empty[Long]
    val merges = Lm.bpeTrainLoop(spark, sf, rounds = 64, perRoundMillis = Some(times))
    assert(merges.length == times.length)
    assert(merges.length >= 32,
      s"gate corpus exhausted after only ${merges.length} rounds — grow the fixture")
    // each round: one pair-count pass + 1-row argmax + narrow rewrite on
    // a RELEASED-predecessor checkpoint chain — cost must not grow with
    // the round index (lineage or persisted-copy accumulation would show
    // as a ramp). Median of the last quarter vs median of the first
    // quarter (after the 4-round JIT/codegen warmup), generous 4x slack
    // for GC noise on a shared box.
    def median(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(s.length / 2)
    }
    val q = times.length / 4
    val early = median(times.slice(4, 4 + q).toSeq)
    val late = median(times.takeRight(q).toSeq)
    assert(late <= early * 4,
      s"per-round cost ramps: early median ${early}ms, late median ${late}ms " +
        s"(all: ${times.mkString(",")})")
    // the trained table is a real prefix-consistent extension: rounds
    // 1..BpeRounds equal the K=5 production table (same argmax path)
    val k5 = Lm.bpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    assert(merges.take(Lm.BpeRounds).map(m =>
      Seq(m.round, m.a, m.b, m.cnt, m.n_syms)) == k5)
    // symbol count strictly shrinks every round
    merges.sliding(2).foreach {
      case Seq(x, y) => assert(y.n_syms < x.n_syms)
      case _ => ()
    }
  }

  test("merge artifact: persisted table serves a fresh JVM without retraining (round-12 task 2)") {
    // start clean: no memo, no committed artifact
    val p = new org.apache.hadoop.fs.Path(Lm.mergesPath(spark, sf))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    Lm.clearMergeMemo()
    val runs0 = Lm.trainLoopRuns.get()

    // first touch trains once and COMMITS the artifact
    val fresh = Lm.bpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    assert(Lm.trainLoopRuns.get() == runs0 + 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      "training did not commit the merge artifact")

    // simulated fresh JVM (memo dropped): encode/train serve FROM THE
    // FILE — artifact rows ≡ freshly trained merges, zero extra training
    Lm.clearMergeMemo()
    val served = Lm.bpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    assert(served == fresh, "artifact-served merges diverge from training")
    assert(Lm.trainLoopRuns.get() == runs0 + 1,
      "artifact hit must not retrain")

    // a gapped artifact fails loudly, never silently skews the encode
    Lm.clearMergeMemo()
    val spark2 = spark
    import spark2.implicits._
    spark.read.parquet(p.toString).where(col("round") =!= 2L)
      .write.mode("overwrite").parquet(p.toString + "_gap")
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(p.toString + "_gap"), p)
    val e = intercept[IllegalArgumentException](Lm.bpeTrain(spark, sf).collect())
    assert(e.getMessage.contains("round gap"))
    // restore a clean state for any later suite touching the memo
    fs.delete(p, true)
    Lm.clearMergeMemo()
  }
}
