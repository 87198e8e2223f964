package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Gen.Parameters
import org.scalacheck.rng.Seed

/** Randomized equivalence properties: each distributed operator equals
  * its brute-force per-row definition on arbitrary inputs. (scalacheck
  * Gen driven manually — scalatestplus isn't in the offline cache.)
  */
class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Parameters.default, Seed(seed)).get

  private val keyGen = Gen.oneOf("A", "B", "C")
  private case class L(k: String, t: Long, id: Int)
  private case class R(k: String, t: Long, v: Double)

  private def dataset(seed: Long): (Seq[L], Seq[R]) = {
    val lg = Gen.listOfN(40, for {
      k <- keyGen; t <- Gen.chooseNum(0L, 500L)
    } yield (k, t))
    val rg = Gen.listOfN(25, for {
      k <- keyGen; t <- Gen.chooseNum(0L, 500L); v <- Gen.chooseNum(-50, 50)
    } yield (k, t, v.toDouble))
    val ls = sample(lg, seed).zipWithIndex.map { case ((k, t), i) => L(k, t, i) }
    // unique right (key, t): the as-of contract requires a deterministic
    // latest row per timestamp
    val rs = sample(rg, seed + 1).groupBy(r => (r._1, r._2)).map(_._2.head)
      .map { case (k, t, v) => R(k, t, v) }.toSeq
    (ls, rs)
  }

  test("asofJoin equals the brute-force latest-at-or-before definition (random data)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 5L) {
      val (ls, rs) = dataset(seed * 7919)
      val left = ls.map(l => (l.k, l.t, l.id)).toDF("k", "lt", "id")
      val right = rs.map(r => (r.k, r.t, r.v)).toDF("k", "rt", "v")
      val got = graft.ops.AsOf.asofJoin(left, right, "k", "lt", "rt", Seq("rt", "v"))
        .select("id", "rt", "v").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      val want = (for {
        l <- ls
        cand = rs.filter(r => r.k == l.k && r.t <= l.t)
        if cand.nonEmpty
        best = cand.maxBy(_.t)
      } yield (l.id, best.t, best.v)).toSet
      assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
    }
  }

  test("rangeJoin equals the brute-force interval filter (random data)") {
    val s = spark
    import s.implicits._
    val width = 60L
    for (seed <- 1L to 5L) {
      val (ls, rs) = dataset(seed * 104729)
      val left = ls.map(l => (l.k, new java.sql.Timestamp(l.t * 1000), l.id))
        .toDF("k", "lt", "id")
      val right = rs.map(r => (r.k, new java.sql.Timestamp(r.t * 1000), r.v))
        .toDF("k", "rt", "v")
      val got = graft.ops.AsOf.rangeJoin(left, right, "k", "lt", "rt", width)
        .select("id", "rt", "v").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).getTime / 1000, r.getDouble(2))).toSet
      val want = (for {
        l <- ls; r <- rs
        if r.k == l.k && r.t >= l.t && r.t < l.t + width
      } yield (l.id, r.t, r.v)).toSet
      assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
    }
  }

  test("labelPropagate equals union-find on adversarial graphs (chain/star/clique/random)") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n.toLong.toInt)(i => i)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min vertex id per component, only for vertices touching an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      touched.map(v => v -> {
        var r = v.toInt; while (parent(r) != r) r = parent(r); r.toLong
      }).toMap
    }
    def check(name: String, n: Int, undirected: Seq[(Long, Long)]): Unit = {
      val edges = (undirected ++ undirected.map(_.swap))
        .toDF("u", "v")
      val got = ext.Dedup.labelPropagate(edges)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, undirected)
      assert(got == want, s"$name: got=$got want=$want")
    }
    // a 120-vertex chain: diameter 119 — plain propagation inside
    // CcMaxIters=15 rounds would be wrong; pointer jumping must not be
    check("chain", 120, (0L until 119L).map(i => (i, i + 1)))
    check("star", 50, (1L until 50L).map(i => (0L, i)))
    check("clique", 12,
      (for (a <- 0L until 12L; b <- a + 1 until 12L) yield (a, b)))
    // random sparse graph + isolated-pair islands
    val rnd = new scala.util.Random(42)
    val rand = (0 until 80).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    check("random", 60, rand)
  }

  test("Q.r6 equals C++-style round(x*1e6)/1e6 (random + boundary doubles)") {
    val s = spark
    import s.implicits._
    def cppRound(x: Double): Double = {
      if (x.isNaN || x.isInfinite) return x
      val p = x * 1e6
      val r = if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)
      r / 1e6
    }
    val doubles = sample(Gen.listOfN(500,
      Gen.chooseNum(-1e6, 1e6).map(v => v * 1.0000001)), 42L) ++
      Seq(32.8309375, 38.274570312499996, -32.8309375, 0.0000005, -0.0000005,
        2.5e-6, 1.0000005, 0.0, -1.25e-6)
    val got = doubles.toDF("x").select(Q.r6(col("x")).as("r")).collect()
      .map(_.getDouble(0))
    doubles.zip(got).foreach { case (x, g) =>
      assert(g == cppRound(x), s"r6($x) = $g, want ${cppRound(x)}")
    }
  }
}
