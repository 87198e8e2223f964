package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over `embeddings`
  * (64-dim float vectors) — the north-star similarity extension.
  *
  * Three tiers, mirroring how an ANN pipeline scales:
  *   - e2_knn_brute: exact top-k for a small query set. Per-pair cosine is
  *     a sequential fold (codegen'd Column algebra, no UDF); the query
  *     side is tiny so Catalyst broadcasts it — cost O(|Q| * n), one scan.
  *   - e1_cosine_neardup: all-pairs >= threshold. Corpus-size-adaptive:
  *     exact grid-blocked all-pairs to E1ExactMaxN vectors (the
  *     verification tier), SRP band ladder beyond — same join shape as
  *     Dedup.d2, bucketed instead of pairwise; the gates are evaluated
  *     identically inside the oracle SQL.
  *   - e3_knn_ivf: IVF-style cluster pruning. Centroids derived
  *     deterministically from the data (min vec_id per label), vectors
  *     assigned to nearest centroid, queries probe ONLY their own cluster:
  *     the partition-pruning pattern that makes ANN tractable at scale
  *     (search cost drops from O(n) to O(n / n_clusters) per query).
  *
  * All cosine math is the portable sequential fold ([[Portable.dot]]) so
  * rankings are bit-identical to the DuckDB oracle — no tolerance games.
  */
object Similarity {
  import Portable._

  val K = 3                  // neighbors per query
  val NQueries = 5           // queries = vec_id < 5
  val NearDupThreshold = 0.45
  val NProbe = 2             // clusters probed per query in e5
  /** Probe width of the IVF-PQ SERVE path (e11/e13). Separate from
    * [[NProbe]] (e5/e14b keep their original geometry): the round-13
    * exact re-rank left e11/e13 recall nprobe-bound at 0.800 with 2 of
    * 10 lists probed — RecallSpec measures the recall-vs-nprobe curve
    * and pins >= 0.85 at this default. Serve cost scales linearly in
    * the probe width (candidates ~ nprobe/k of the corpus per query). */
  val NProbeServe = 4
  val RangeRadius = 0.3      // e14 radius-search cosine threshold

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Portable.spread(Tables.embeddings(spark, dir), "vec_id")

  private val cosAB = sqlCosine("q.embedding", "c.embedding")

  /** Grid blocks for the exact near-dup join (e1). B(B+1)/2 = 36 block
    * pairs ≈ one task per local[32] slot; a cluster run sizes B so that
    * B(B+1)/2 ~ a few × total cores and 2n/B vectors fit one task's
    * memory.
    */
  val GridB = 8

  /** e1 implementation: exact blocked all-pairs cosine (see the query
    * doc above for the plan shape). Produces bit-identical rows to the
    * brute `a.vec_id < b.vec_id` theta-join: the same pairs are compared
    * (each unordered pair lands in exactly one block pair), norms are
    * per-vector `sqrt(dot(e,e))` (same IEEE value), and `dot(ea,eb)`
    * accumulates in ascending index order on operands whose product
    * commutes exactly.
    */
  def gridNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .where(col("nrm") > 0.0) // zero-norm rows have cos NULL in the oracle
      .withColumn("g", pmod(col("vec_id"), lit(GridB)).cast("int"))
    val blockPairs = (for { i <- 0 until GridB; j <- i until GridB } yield (i, j))
      .toDF("bi", "bj")
    val aSide = e.select(col("vec_id").as("ida"), col("embedding").as("ea"),
        col("nrm").as("na"), col("g"))
      .join(broadcast(blockPairs), col("g") === col("bi")).drop("g")
    val bSide = e.select(col("vec_id").as("idb"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("g"))
      .join(broadcast(blockPairs), col("g") === col("bj")).drop("g")
    // shuffle-hash: (bi,bj) keys are few and duplicate-heavy by design —
    // build one block as a hash map per task, stream the other through it
    aSide.join(bSide.hint("shuffle_hash"),
        Seq("bi", "bj"))
      // diagonal blocks would emit each pair twice (and self-pairs once)
      // without the id order filter; off-diagonal pairs meet exactly once
      .where(col("bi") < col("bj") || col("ida") < col("idb"))
      .select(
        least(col("ida"), col("idb")).as("vec_a"),
        greatest(col("ida"), col("idb")).as("vec_b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= NearDupThreshold)
      .select(col("vec_a"), col("vec_b"), graft.Q.r6(col("cos")).as("cos"))
      .transform(d => graft.Q.sorted(d, "vec_a", "vec_b"))
  }

  // --- SRP-LSH (e4): sign-random-projection hyperplanes, ±1 Rademacher
  // coefficients derived deterministically from sha256 so the SAME
  // constant matrix is embedded in the Spark plan and the oracle SQL.
  val SrpBits = 24
  val SrpBands = 4
  val SrpRows = 4

  /** Corpus-size switches for e4's band geometry. SRP candidate count is
    * Θ(n²/2^r) per band, so holding per-bucket occupancy constant needs
    * r ≈ log₂(n/occupancy): the (4,4) recall-sized dial saturates its 16
    * buckets/band once n outgrows a few thousand vectors and goes
    * quadratic (round-5 sf1: 33.6 s vs 1.6 s for (8,2) on 20k vectors),
    * and the (8,2) dial saturates its 256 buckets/band the same way one
    * decade later (round-6 sf10: 48 s on 200k vectors — ~780 vectors per
    * bucket — vs seconds for (12,2)'s 4096 buckets/band). The headline
    * e4 therefore climbs a geometry LADDER with the corpus: (4,4) to
    * 4k vectors, (8,2) to 40k, (12,2) beyond — each step holding
    * per-bucket occupancy around or below ~50. The same integer
    * thresholds are evaluated inside the oracle SQL, so both engines
    * always pick the same geometry at every SF.
    */
  val SrpSmallCorpusMaxN = 4000L
  val SrpMediumCorpusMaxN = 40000L

  /** Largest corpus e1 surveys with the EXACT grid-blocked all-pairs
    * join. n² at 4000 vectors is 8M comparisons — trivially affordable
    * and the tier that adjudicates the banded arms' recall; beyond it
    * the headline climbs onto the SRP ladder (round-7 verdict task 3:
    * the exact tier is the oracle tier, not the scale path).
    */
  val E1ExactMaxN = 4000L
  lazy val planes: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until SrpBits).map { j =>
      (0 until 64).map { d =>
        val h = md.digest(s"srp-$j-$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  def queries: Seq[Q] = Seq(

    // e2: exact brute-force top-k cosine for queries vec_id < 5.
    Q("e2_knn_brute",
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $NQueries),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |                  $cosAB AS cos
         |           FROM q JOIN embeddings c ON c.vec_id != q.vec_id),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, neighbor_id, rk, round(cos, 6) AS cos
         |FROM ranked WHERE rk <= $K ORDER BY query_id, rk""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.where(col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        // corpus STREAMS, tiny query set is the broadcast build side: a
        // BroadcastNestedLoopJoin that builds the corpus would OOM the
        // moment the corpus outgrows one executor (round-1 review #5)
        val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("embedding")).as("cos"))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= K)
          .select(col("query_id"), col("neighbor_id"), col("rk"),
            graft.Q.r6(col("cos")).as("cos"))
          .transform(d => graft.Q.sorted(d, "query_id", "rk"))
      }
    },

    // e14: RADIUS search — the other ANN serving API (all neighbors
    // within a similarity bound, not a fixed k). Same streaming-corpus /
    // broadcast-query join as e2, but the bound is a plain pushable
    // filter: no per-query window, no sort exchange, output size set by
    // the data — the shape a filtered vector-store `range_search` call
    // compiles to. At 100 TB the corpus side still streams one scan.
    Q("e14_range_search",
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $NQueries),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |                  $cosAB AS cos
         |           FROM q JOIN embeddings c ON c.vec_id != q.vec_id)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cos
         |FROM scored WHERE cos >= $RangeRadius
         |ORDER BY query_id, neighbor_id""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.where(col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("embedding")).as("cos"))
          .where(col("cos") >= RangeRadius)
          .select(col("query_id"), col("neighbor_id"), graft.Q.r6(col("cos")).as("cos"))
          .transform(d => graft.Q.sorted(d, "query_id", "neighbor_id"))
      }
    },

    // e1: the HEADLINE near-dup survey — corpus-size-adaptive (round-7
    // verdict: the Θ(n²) exact tier must not be the headline at scale).
    // Below E1ExactMaxN vectors it runs the exact grid-blocked all-pairs
    // join ([[gridNearDup]] — B(B+1)/2 bounded-memory block tasks, the
    // distributed all-pairs layout); above it, it climbs onto e4's SRP
    // band ladder ((8,2) to SrpMediumCorpusMaxN, (12,2) beyond), whose
    // cost tracks bucket collisions instead of n². The oracle SQL
    // evaluates the SAME integer corpus-count gates, so both engines
    // pick the same tier at every SF: the driver gate (sf0.01) and
    // sf0.1 adjudicate the exact arm bit-for-bit, sf1/sf10 run the
    // bucketed arm on both sides.
    //
    // Why the small-corpus tier is exact rather than (4,4) banding: this
    // dataset's qualifying pairs sit at cos 0.45-0.60 (63-72 deg) where
    // SRP bit-agreement is only ~0.65 and the corpus has no angular
    // cluster structure — no sub-quadratic method reaches recall 1
    // there, so exact IS the verification tier, kept exactly to the
    // corpus sizes where n² is trivially affordable. RecallSpec pins the
    // banded tiers' recall against it at gate scale.
    Q("e1_cosine_neardup", e1AdaptiveOracleSql) {
      (s, dir) => nearDupAdaptive(s, dir)
    },

    // e3: IVF cluster pruning. Centroid c_l = embedding of min vec_id per
    // label; every vector assigned to argmax-cosine centroid; queries
    // search only their own cluster.
    Q("e3_knn_ivf",
      s"""WITH cent AS (
         |  SELECT label AS cl, embedding FROM (
         |    SELECT label, embedding,
         |           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assign AS (
         |  SELECT vec_id, cl, embedding FROM (
         |    SELECT e.vec_id, cent.cl, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${sqlCosine("e.embedding", "cent.embedding")} DESC, cent.cl) AS rn
         |    FROM embeddings e CROSS JOIN cent) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, cl, embedding AS qe
         |      FROM assign WHERE vec_id < $NQueries),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |                  ${sqlCosine("q.qe", "c.embedding")} AS cos
         |           FROM q JOIN assign c ON c.cl = q.cl AND c.vec_id != q.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, neighbor_id, rk, round(cos, 6) AS cos
         |FROM ranked WHERE rk <= $K ORDER BY query_id, rk""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val cent = e.withColumn("rn",
            row_number().over(Window.partitionBy("label").orderBy("vec_id")))
          .where(col("rn") === 1)
          .select(col("label").as("cl"), col("embedding").as("ce"))
        // cached: the crossJoin + per-row argmax-cosine assignment feeds
        // both sides of the probe join below (same recompute d2 documents)
        val assign = e.crossJoin(broadcast(cent))
          .withColumn("ccos", cosine(col("embedding"), col("ce")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cl"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("cl"), col("embedding"))
          .cache()
        val q = assign.where(col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("cl"), col("embedding").as("qe"))
        val scored = q.join(assign.as("c"),
            col("c.cl") === q("cl") && col("c.vec_id") =!= col("query_id"))
          .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
            cosine(col("qe"), col("c.embedding")).as("cos"))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= K)
          .select(col("query_id"), col("neighbor_id"), col("rk"),
            graft.Q.r6(col("cos")).as("cos"))
          .transform(d => graft.Q.sorted(d, "query_id", "rk"))
      }
    },

    // e5: IVF with multi-probe (nprobe=2) — the recall knob every IVF
    // deployment turns. Data vectors stay assigned to ONE cluster;
    // each query probes its 2 nearest centroids, so a true neighbor
    // sitting just across a Voronoi boundary (the classic IVF recall
    // failure) is searched. Cost: O(nprobe * n / n_clusters) per query,
    // still a cluster-pruned join, never a full scan.
    Q("e5_knn_ivf_nprobe2",
      s"""WITH cent AS (
         |  SELECT label AS cl, embedding FROM (
         |    SELECT label, embedding,
         |           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1),
         |assign AS (
         |  SELECT vec_id, cl, embedding FROM (
         |    SELECT e.vec_id, cent.cl, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${sqlCosine("e.embedding", "cent.embedding")} DESC, cent.cl) AS rn
         |    FROM embeddings e CROSS JOIN cent) WHERE rn = 1),
         |qprobe AS (
         |  SELECT vec_id AS query_id, cl, embedding AS qe FROM (
         |    SELECT e.vec_id, cent.cl, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${sqlCosine("e.embedding", "cent.embedding")} DESC, cent.cl) AS rn
         |    FROM embeddings e CROSS JOIN cent
         |    WHERE e.vec_id < $NQueries) WHERE rn <= $NProbe),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |                  ${sqlCosine("q.qe", "c.embedding")} AS cos
         |           FROM qprobe q JOIN assign c
         |             ON c.cl = q.cl AND c.vec_id != q.query_id),
         |ranked AS (SELECT *, row_number() OVER
         |             (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, neighbor_id, rk, round(cos, 6) AS cos
         |FROM ranked WHERE rk <= $K ORDER BY query_id, rk""".stripMargin) {
      (s, dir) => {
        val e = emb(s, dir)
        val cent = e.withColumn("rn",
            row_number().over(Window.partitionBy("label").orderBy("vec_id")))
          .where(col("rn") === 1)
          .select(col("label").as("cl"), col("embedding").as("ce"))
        val assign = e.crossJoin(broadcast(cent))
          .withColumn("ccos", cosine(col("embedding"), col("ce")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cl"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("cl"), col("embedding"))
        // only the 5 queries fan out x NProbe — the corpus assignment
        // stays single-cluster, so the probe join reads nprobe clusters
        val qprobe = e.where(col("vec_id") < NQueries)
          .crossJoin(broadcast(cent))
          .withColumn("ccos", cosine(col("embedding"), col("ce")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cl"))))
          .where(col("rn") <= NProbe)
          .select(col("vec_id").as("query_id"), col("cl"), col("embedding").as("qe"))
        val scored = qprobe.join(assign.as("c"),
            col("c.cl") === qprobe("cl") && col("c.vec_id") =!= col("query_id"))
          .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
            cosine(col("qe"), col("c.embedding")).as("cos"))
        val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rk", row_number().over(w).cast("long")).where(col("rk") <= K)
          .select(col("query_id"), col("neighbor_id"), col("rk"),
            graft.Q.r6(col("cos")).as("cos"))
          .transform(d => graft.Q.sorted(d, "query_id", "rk"))
      }
    },

    // e4: SRP-LSH bucketed near-dup — the scale path for e1. Signature
    // bit j = [dot(v, h_j) >= 0] over the ±1 hyperplanes; candidates
    // collide in >= 1 band; verified with exact cosine. At 100 TB this
    // replaces e1's all-pairs join with a bucket join whose cost tracks
    // the collision rate, not n^2. The band geometry is SIZED TO THE
    // CORPUS (rows ≈ log₂(n/occupancy), quantized to the in-repo
    // ladder): (4,4) recall-sized to SrpSmallCorpusMaxN vectors, (8,2)
    // to SrpMediumCorpusMaxN, (12,2) beyond — so the headline
    // configuration never runs a saturated geometry at any scale. The
    // oracle SQL evaluates the same integer count thresholds, keeping
    // both engines on the identical geometry at every SF.
    Q("e4_srp_lsh", srpAdaptiveOracleSql) {
      (s, dir) => srpNearDupAdaptive(s, dir)
    },

    // e4w: the same SRP banding with the width dial turned for scale —
    // 8-bit bands (256 buckets/band) instead of 4-bit (16). Candidate
    // count is Theta(n^2 / 2^rows) per band, so holding per-bucket
    // occupancy constant as n grows requires rows ~ log2(n): at sf1 the
    // 4-bit e4 saturates its 16 buckets/band and goes quadratic
    // (SCALING.md: 23.5 s at sf1 vs 1.5 s for this geometry), while
    // this variant's candidate set collapses ~16x per band. The price is
    // recall at the survey's low 0.45 threshold (SRP bit-agreement
    // ~0.65 there, so a 8-bit band collides at ~0.65^8) — the
    // documented width-vs-recall trade every production LSH deployment
    // tunes; precision stays 1 (exact cosine verify). This geometry is
    // the PRIMARY production configuration (rows ≈ log2(n/occupancy));
    // e4's (4,4) is the recall-sized small-n dial. Both are
    // oracle-checked against the same parameterized DuckDB twin;
    // RecallSpec/Ext4Spec additionally pin subset-of-e1 precision.
    Q("e4w_srp_wide", srpOracleSql(bandRows = 8, nBands = 2)) {
      (s, dir) => srpNearDup(s, dir, bandRows = 8, nBands = 2)
    })

  /** DuckDB twin of [[srpNearDup]] for any band geometry: same SHA-256
    * hyperplanes inlined as literals, band keys from sign bits, DISTINCT
    * candidate pairs (the oracle's stand-in for the plan's
    * first-matching-band filter), exact-cosine verify.
    */
  def srpOracleSql(bandRows: Int, nBands: Int): String =
    srpOracleSqlFor(Seq((bandRows, nBands, "")))

  /** Oracle twin of [[srpNearDupAdaptive]]: both geometries' band arms,
    * each gated on the SAME integer corpus-count threshold the Spark
    * side switches on — one static SQL string valid at every SF.
    */
  def srpAdaptiveOracleSql: String = srpOracleSqlFor(Seq(
    (SrpRows, SrpBands, s" WHERE (SELECT cnt FROM nn) <= $SrpSmallCorpusMaxN"),
    (8, 2, s" WHERE (SELECT cnt FROM nn) > $SrpSmallCorpusMaxN" +
      s" AND (SELECT cnt FROM nn) <= $SrpMediumCorpusMaxN"),
    (12, 2, s" WHERE (SELECT cnt FROM nn) > $SrpMediumCorpusMaxN")))

  /** Oracle twin of [[nearDupAdaptive]] (the e1 headline): an exact
    * all-pairs candidate arm gated to corpora <= [[E1ExactMaxN]], plus
    * the two wide SRP band arms above it — every arm gated on the same
    * integer corpus count the Spark side switches on, one static SQL
    * string valid at every SF.
    */
  def e1AdaptiveOracleSql: String = srpOracleSqlFor(
    Seq(
      (8, 2, s" WHERE (SELECT cnt FROM nn) > $E1ExactMaxN" +
        s" AND (SELECT cnt FROM nn) <= $SrpMediumCorpusMaxN"),
      (12, 2, s" WHERE (SELECT cnt FROM nn) > $SrpMediumCorpusMaxN")),
    exactGate = s" WHERE (SELECT cnt FROM nn) <= $E1ExactMaxN")

  private def srpOracleSqlFor(geoms: Seq[(Int, Int, String)],
      exactGate: String = ""): String = {
    val nBits = geoms.map { case (r, b, _) => r * b }.max
    def dotSql(j: Int): String =
      sqlDot("embedding", planes(j).map(v => s"$v.0").mkString("[", ",", "]"))
    val bitsSql = (0 until nBits)
      .map(j => s"CASE WHEN ${dotSql(j)} >= 0 THEN 1 ELSE 0 END AS b$j")
      .mkString(",\n       ")
    val bandSql = geoms.flatMap { case (bandRows, nBands, gate) =>
      (0 until nBands).map { b =>
        val key = (0 until bandRows).map(r => s"b${b * bandRows + r} * ${1 << r}").mkString(" + ")
        s"SELECT vec_id, embedding, $b AS band, $key AS bkey FROM sig$gate"
      }
    }.mkString("\nUNION ALL ")
    // the optional exact arm (e1's small-corpus tier): all ordered pairs,
    // gated on the corpus count — disjoint from the band arms' gates, so
    // the UNION ALL never double-emits a candidate. The gate sits on the
    // SCAN of each join side (exact_src), not after the theta join, so
    // on a large corpus both sides are empty and the n² join never
    // enumerates — the same push-down shape the band arms use.
    val exactSrc =
      if (exactGate.isEmpty) ""
      else s"""
         |exact_src AS (SELECT vec_id FROM embeddings$exactGate),""".stripMargin
    val exactArm =
      if (exactGate.isEmpty) ""
      else """
         |         UNION ALL
         |         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |         FROM exact_src a JOIN exact_src b
         |           ON a.vec_id < b.vec_id""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS cnt FROM embeddings),$exactSrc
       |sig AS (
       |  SELECT vec_id, embedding,
       |       $bitsSql
       |  FROM embeddings),
       |bands AS ($bandSql),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id$exactArm),
       |n AS (SELECT vec_id, sqrt(${sqlDot("embedding", "embedding")}) AS nrm,
       |             embedding FROM embeddings),
       |v AS (SELECT vec_a, vec_b,
       |             CASE WHEN na.nrm = 0.0 OR nb.nrm = 0.0 THEN NULL
       |                  ELSE ${sqlDot("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm)
       |             END AS cos
       |      FROM cand JOIN n na ON na.vec_id = cand.vec_a
       |                JOIN n nb ON nb.vec_id = cand.vec_b)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos
       |FROM v WHERE cos >= $NearDupThreshold ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Corpus-sized SRP geometry (the e4 headline): (4,4) recall-sized
    * below [[SrpSmallCorpusMaxN]] vectors, wide (8,2) above. The single
    * count() here is geometry SIZING, not data movement — a zero-column
    * count job whose scan prunes every column (the vectorized parquet
    * reader serves it from row-group row counts, so it costs seconds,
    * not a data pass, even at 100 TB; a catalog with table statistics
    * would replace the job with a metadata lookup).
    */
  def srpNearDupAdaptive(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    if (n <= SrpSmallCorpusMaxN) srpNearDup(s, dir, SrpRows, SrpBands)
    else if (n <= SrpMediumCorpusMaxN) srpNearDup(s, dir, 8, 2)
    else srpNearDup(s, dir, 12, 2)
  }

  /** The e1 headline dispatch: exact grid-blocked all-pairs to
    * [[E1ExactMaxN]] vectors, SRP band ladder beyond ((8,2) then
    * (12,2)). Same zero-column count sizing job as
    * [[srpNearDupAdaptive]].
    */
  def nearDupAdaptive(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    if (n <= E1ExactMaxN) gridNearDup(s, dir)
    else if (n <= SrpMediumCorpusMaxN) srpNearDup(s, dir, 8, 2)
    else srpNearDup(s, dir, 12, 2)
  }

  /** The SRP-LSH banded near-dup plan with parameterized band geometry
    * (`rows` bits per band, `bands` bands, using the first rows*bands of
    * the 16 deterministic hyperplanes). e4 sizes the geometry to the
    * corpus ([[srpNearDupAdaptive]]); e4w pins the wide (8, 2) dial.
    */
  def srpNearDup(s: SparkSession, dir: String, bandRows: Int, nBands: Int): DataFrame = {
    require(bandRows * nBands <= SrpBits, "not enough hyperplanes")
    val e = emb(s, dir)
    // one projection computes all band keys as an array, then
    // posexplode — one scan, one signature evaluation per row (a
    // per-band union would re-run the SRP dot products once per band)
    val bitCols = (0 until bandRows * nBands).map { j =>
      val h = typedLit(planes(j).map(_.toFloat))
      when(dot(col("embedding"), h) >= 0, 1).otherwise(0).as(s"b$j")
    }
    val sig = e.select(Seq(col("vec_id"), col("embedding")) ++ bitCols: _*)
    val bandKeyArr = array((0 until nBands).map { b =>
      (0 until bandRows)
        .map(r => col(s"b${b * bandRows + r}") * (1 << r))
        .reduce(_ + _)
    }: _*)
        // carry embedding + norm + the full key array through the band
        // join: a pair colliding in several bands is emitted ONLY from
        // its first matching band (no-earlier-match filter), which
        // replaces the oracle's DISTINCT — a full shuffle of the
        // candidate set — with a per-row predicate, and the carried
        // vectors let the exact-cosine verify run inside the join task
        // instead of via two more candidate-sized joins. Shuffle volume
        // is bands×n wide rows per side (vectors), independent of the
        // candidate count — the quantity that explodes when buckets
        // clump.
        val withKeys = sig.select(col("vec_id"), col("embedding"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nrm"),
          bandKeyArr.as("keys"))
        val bands = withKeys.select(col("vec_id"), col("embedding"), col("nrm"),
          col("keys"), posexplode(col("keys")).as(Seq("band", "bkey")))
        val aSide = bands.select(col("band"), col("bkey"), col("vec_id").as("ida"),
          col("embedding").as("ea"), col("nrm").as("na"), col("keys").as("ka"))
        val bSide = bands.select(col("band"), col("bkey"), col("vec_id").as("idb"),
          col("embedding").as("eb"), col("nrm").as("nb"), col("keys").as("kb"))
        // no-earlier-match as PLAIN boolean algebra, not a HOF: nBands
        // is a plan-time literal, so "some band j < band has ka[j] ==
        // kb[j]" unrolls to (nBands-1) codegen'd comparisons. The HOF
        // form (exists over zip_with of two slices) is interpreted and
        // ran once per CANDIDATE row — the same per-element-lambda class
        // the round-15 winnow kill measured (band keys are non-null
        // ints, so equality never returns null and the disjunction is
        // exact). Output is set-identical either way: the oracle's
        // DISTINCT and this predicate both keep one copy per pair.
        val earlierMatch = (0 until nBands - 1)
          .map(j => col("band") > j &&
            element_at(col("ka"), j + 1) === element_at(col("kb"), j + 1))
          .reduceOption(_ || _).getOrElse(lit(false))
        aSide.join(bSide.hint("shuffle_hash"), Seq("band", "bkey"))
          .where(col("ida") < col("idb") && !earlierMatch)
          .select(col("ida").as("vec_a"), col("idb").as("vec_b"),
            when(col("na") === 0.0 || col("nb") === 0.0, lit(null))
              .otherwise(dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
          .where(col("cos") >= NearDupThreshold)
          .select(col("vec_a"), col("vec_b"), graft.Q.r6(col("cos")).as("cos"))
          .transform(d => graft.Q.sorted(d, "vec_a", "vec_b"))
  }
}
