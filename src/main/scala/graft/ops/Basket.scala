package graft.ops

import graft.Q
import graft.sources.{Layout, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket analytics and graph closure over the order/part
  * co-purchase structure — the recommender-adjacent warehouse ops
  * (pair affinity, association lift, triangle counting) that stress the
  * self-join family at scale. (Beyond-reference surface: the reference
  * stops at per-symbol aggregates; these are the canonical "items bought
  * together" queries of a 100 TB retail fact table.)
  *
  * Scale design, both queries:
  *   - The pair generator is a self-join ON the order key, so fan-out is
  *     bounded by basket size (max 11 parts/order here, C(11,2) pairs) —
  *     never all-pairs over the catalog.
  *   - Everything downstream groups on pair/vertex keys with map-side
  *     partial aggregation; the item-support side of lift is
  *     part-cardinality (tiny vs the fact table) and broadcasts.
  *   - Triangle counting orients each edge low-degree -> high-degree
  *     (ties by id), the classic bound that caps wedge fan-out at
  *     O(sqrt m) per vertex and makes the two-hop join linear-ish in
  *     practice; the closing edge is verified with a semi-join against
  *     the oriented edge set.
  */
/** The co-purchase graph as a build-once artifact family (round-10
  * verdict task 1). Every graph query over the order/part structure —
  * x_copurchase, x_triangles, x_pagerank_step, x_pagerank3,
  * x_pagerank_full, x_kcore — consumes the SAME Σ|basket|² self-join
  * edge list; before this object each of them (×3 bench iterations)
  * re-ran that build from `lineitem`, 8 independent derivations of one
  * 119.6M-edge artifact at sf10. Now the first consumer builds it and
  * persists it bucketed via [[graft.sources.Layout.ensureBucketedArtifact]];
  * everyone else (this session or a later JVM over the same fingerprinted
  * testdata) scans the bucketed files.
  *
  * Three artifacts, one per reuse grain:
  *   - [[basket]] — distinct (ok, pk), bucketed by ok: the pair build's
  *     self-join runs exchange-free on the bucket key, and n_orders
  *     (distinct-ok count) partial-aggregates in place.
  *   - [[pairs]] — (u, v, supp) with u < v: support-thresholded views
  *     (lift edges at MinSupport, triangle/kcore graph at TriSupport,
  *     the undirected PageRank graph at supp >= 1) are all filters over
  *     this ONE table, so the threshold is a scan predicate, not a
  *     rebuild.
  *   - [[symEdges]] — the symmetric directed closure, bucketed by u:
  *     out-degree aggregation and the PageRank superstep's edges⋈deg
  *     join run with zero exchange on the bucket key.
  *
  * Oracle alignment: the artifacts hold exactly the rows of the oracle
  * CTEs (`basket` = SELECT DISTINCT, `pairs` = the GROUP BY a.pk, b.pk
  * pair count) — integer-only, so persistence introduces no cross-engine
  * drift; the DuckDB side keeps deriving from `lineitem` and adjudicates
  * the artifact content on every query.
  */
object CoPurchase {
  /** Bucket count for the graph artifacts, derived from the SOURCE
    * bytes at build time (round-11 sf100 finding: a CONSTANT width
    * means per-bucket payload grows linearly with the corpus — at 1.2B
    * edges each of 32 buckets carried ~100× the sf10 slice and the
    * exchange-free joins' per-task working sets crossed the
    * memory→disk boundary). One bucket per ~32 MB of lineitem parquet,
    * floored at the bench-scale 32 (gate/sf1/sf10 artifact identities —
    * and their on-disk layouts — are unchanged), capped at 1024. The
    * bucket spec is part of the artifact NAME (Layout's contract), so a
    * resize is a rebuild under a new identity, never a mixed layout. */
  def buckets(s: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    math.max(32L, math.min(1024L, bytes / (32L << 20) + 1)).toInt
  }

  private def fp(s: SparkSession, dir: String): String =
    Layout.sourceFingerprint(s, s"$dir/lineitem.parquet")

  /** Distinct (ok, pk) basket rows, bucketed by order key. */
  def basket(s: SparkSession, dir: String): DataFrame =
    Layout.ensureBucketedArtifact(s, s"graft_basket_${fp(s, dir)}", "ok",
        buckets(s, dir)) {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
    }

  /** The pair-support edge list (u, v, supp), u < v — THE Σ|basket|²
    * self-join, paid once per corpus instead of once per graph query. */
  def pairs(s: SparkSession, dir: String): DataFrame =
    Layout.ensureBucketedArtifact(s, s"graft_cop_pairs_${fp(s, dir)}", "u",
        buckets(s, dir)) {
      val b = basket(s, dir)
      b.as("a")
        .join(b.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("supp"))
    }

  /** Symmetric directed closure of [[pairs]] (every co-purchase pair in
    * both directions), bucketed by source vertex. */
  def symEdges(s: SparkSession, dir: String): DataFrame =
    Layout.ensureBucketedArtifact(s, s"graft_cop_sym_${fp(s, dir)}", "u",
        buckets(s, dir)) {
      val p = pairs(s, dir).select(col("u"), col("v"))
      p.unionAll(p.select(col("v").as("u"), col("u").as("v")))
    }

  /** The vertex set (every part that appears in any basket — including
    * isolated vertices no pair reaches), derived from the bucketed
    * basket scan. Node-cardinality; not worth its own artifact. */
  def nodes(s: SparkSession, dir: String): DataFrame =
    basket(s, dir).select(col("pk")).distinct()

  /** Out-degree artifact per edge-set flavor ("sym" = the symmetric
    * closure the step/3 queries walk; "dir" = the directed u < v pairs
    * the full solver walks). Node-cardinality, bucketed by u like the
    * edge artifacts, so every superstep's edges⋈deg join is
    * bucket-local with zero exchange.
    *
    * Round-16 scratch lesson: the superstep loops used to persist the
    * |E|-sized edges⋈deg frame DISK_ONLY per run — at sf100 that spill
    * plus the per-round contribution shuffles overran the 36 GB local
    * scratch and x_pagerank3 died ENOSPC even solo after a sweep. The
    * loop-invariant side the warehouse should hold is the TINY one
    * (degrees, |V| rows); the edge list is already a persisted bucketed
    * artifact whose per-round re-scan is page-cache-warm. */
  def outDeg(s: SparkSession, dir: String, flavor: String): DataFrame = {
    require(flavor == "sym" || flavor == "dir", s"unknown flavor $flavor")
    Layout.ensureBucketedArtifact(s, s"graft_cop_deg${flavor}_${fp(s, dir)}",
        "u", buckets(s, dir)) {
      val e = if (flavor == "sym") symEdges(s, dir)
              else pairs(s, dir).select(col("u"), col("v"))
      e.groupBy("u").agg(count(lit(1)).as("d"))
    }
  }
}

object Basket {

  /** Minimum pair support for the affinity/lift edge set: thins the
    * near-complete small-scale graph and is the knob a 100 TB run sizes
    * down to keep the edge list sparse.
    */
  val MinSupport = 3

  /** Triangle-query support. Lower than MinSupport on purpose: at the
    * sf0.01 correctness gate the support-3 graph has 63 edges and ZERO
    * triangles, which made the oracle row a vacuous 0-vs-0 comparison
    * (round-6 verdict). Support 2 keeps 3445 edges / 61 triangles at the
    * gate so the orientation + wedge-closure logic is actually
    * adjudicated; a 100 TB run raises this back up — the threshold is
    * the sparsity knob, not part of the operator's semantics.
    */
  val TriSupport = 2

  def queries: Seq[Q] = Seq(

    // Pair affinity with association lift. supp_ab in orders; lift =
    // n_orders * supp_ab / (supp_a * supp_b); integer-exact except the
    // final lift ratio (6-dp rounded on both engines).
    Q("x_copurchase",
      s"""WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM basket),
        |item AS (SELECT pk, count(*) AS supp FROM basket GROUP BY pk),
        |pair AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS supp_ab
        |  FROM basket a JOIN basket b
        |    ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk)
        |SELECT part_a, part_b, supp_ab,
        |       round(CAST(n.n_orders * supp_ab AS DOUBLE)
        |             / (ia.supp * ib.supp), 6) AS lift
        |FROM pair CROSS JOIN n
        |JOIN item ia ON ia.pk = part_a
        |JOIN item ib ON ib.pk = part_b
        |WHERE supp_ab >= $MinSupport
        |ORDER BY part_a, part_b""".stripMargin) {
      (s, dir) => {
        // shared artifacts: basket is bucketed by ok (the distinct-ok
        // count partial-aggregates in place), and the support filter is
        // a scan predicate over the persisted pair list — no self-join
        // in this query's plan at all
        val basket = CoPurchase.basket(s, dir)
        val nOrders = basket.select(countDistinct("ok").as("n_orders"))
        val item = basket.groupBy("pk").agg(count(lit(1)).as("supp"))
        val pair = CoPurchase.pairs(s, dir)
          .where(col("supp") >= MinSupport)
          .select(col("u").as("part_a"), col("v").as("part_b"),
            col("supp").as("supp_ab"))
        pair
          .crossJoin(broadcast(nOrders))
          .join(broadcast(item.select(col("pk"), col("supp").as("supp_a"))),
            col("part_a") === col("pk")).drop("pk")
          .join(broadcast(item.select(col("pk"), col("supp").as("supp_b"))),
            col("part_b") === col("pk")).drop("pk")
          .select(col("part_a"), col("part_b"), col("supp_ab"),
            graft.Q.r6((col("n_orders") * col("supp_ab")).cast("double")
              / (col("supp_a") * col("supp_b"))).as("lift"))
          .transform(d => graft.Q.sorted(d, "part_a", "part_b"))
      }
    },

    // Per-vertex triangle participation in the thresholded co-purchase
    // graph. Degree-oriented wedge join: every triangle is generated
    // exactly once from its lowest-ranked vertex. Every vertex of the
    // edge set is emitted (zero counts included) so the gated comparison
    // is never 0-rows-vs-0-rows.
    Q("x_triangles",
      s"""WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= $TriSupport),
        |deg AS (
        |  SELECT pk, count(*) AS d FROM (
        |    SELECT u AS pk FROM e0 UNION ALL SELECT v AS pk FROM e0)
        |  GROUP BY pk),
        |-- orient: lower (degree, id) -> higher (degree, id)
        |e AS (
        |  SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS src,
        |         CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS dst
        |  FROM e0 JOIN deg du ON du.pk = u JOIN deg dv ON dv.pk = v),
        |-- the rank orientation is acyclic, so each triangle has exactly
        |-- one directed path through its middle-rank vertex — no dedup
        |-- predicate needed (an id-order filter here would WRONGLY drop
        |-- triangles whose degree-rank disagrees with id order)
        |tri AS (
        |  SELECT w1.src AS x, w1.dst AS y, w2.dst AS z
        |  FROM e w1 JOIN e w2 ON w1.dst = w2.src
        |  JOIN e c ON c.src = w1.src AND c.dst = w2.dst),
        |tcount AS (
        |  SELECT pk, count(*) AS n FROM (
        |    SELECT x AS pk FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |  GROUP BY pk)
        |SELECT deg.pk AS part, CAST(coalesce(tcount.n, 0) AS BIGINT) AS n_triangles
        |FROM deg LEFT JOIN tcount ON tcount.pk = deg.pk
        |ORDER BY part""".stripMargin) {
      (s, dir) => {
        // the triangle graph is a support filter over the shared pair
        // artifact (see CoPurchase) — the Σ|basket|² build is gone
        val e0 = CoPurchase.pairs(s, dir)
          .where(col("supp") >= TriSupport)
          .select("u", "v")
        val deg = e0.select(col("u").as("pk"))
          .unionAll(e0.select(col("v").as("pk")))
          .groupBy("pk").agg(count(lit(1)).as("d"))
        // degree-rank orientation (broadcast the part-cardinality degree map)
        val lowFirst = col("du.d") < col("dv.d") ||
          (col("du.d") === col("dv.d") && col("u") < col("v"))
        val e = e0
          .join(broadcast(deg.as("du")), col("du.pk") === col("u"))
          .join(broadcast(deg.as("dv")), col("dv.pk") === col("v"))
          .select(when(lowFirst, col("u")).otherwise(col("v")).as("src"),
            when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
        // directed path through the middle-rank vertex, closed by the
        // src->dst edge; the acyclic rank orientation already makes this
        // path unique per triangle, so no dedup predicate is needed
        val tri = e.as("w1")
          .join(e.as("w2"), col("w1.dst") === col("w2.src"))
          .join(e.as("c"),
            col("c.src") === col("w1.src") && col("c.dst") === col("w2.dst"))
          .select(col("w1.src").as("x"), col("w1.dst").as("y"), col("w2.dst").as("z"))
        val tcount = tri.select(col("x").as("part"))
          .unionAll(tri.select(col("y").as("part")))
          .unionAll(tri.select(col("z").as("part")))
          .groupBy("part").agg(count(lit(1)).as("n"))
        // left-join back onto the vertex set so zero-triangle vertices
        // egress too — deg is part-cardinality, so it broadcasts and the
        // join adds no shuffle beyond the counts aggregation itself
        deg.select(col("pk").as("part"))
          .join(tcount, Seq("part"), "left")
          .select(col("part"),
            coalesce(col("n"), lit(0L)).cast("long").as("n_triangles"))
          .transform(d => graft.Q.sorted(d, "part"))
      }
    },

    // One exact PageRank power iteration over the co-purchase graph —
    // the per-superstep building block of iterative graph analytics
    // (full PageRank = this step under a driver loop, exactly like the
    // d7 connected-components rounds). All arithmetic is scaled-integer
    // (1e12 units) with floor division in BOTH engines, so the iteration
    // is bit-reproducible: r1(v) = 0.15/n + 0.85 * Σ_{u→v} r0(u)/deg(u)
    // becomes  (15·S div 100n) + (85·Σ((S div n) div d_u)) div 100.
    // Dangling mass (deg-0 nodes) is dropped, the classic simplification;
    // a full solver redistributes it — irrelevant to the step shape.
    //
    // Scale shape: edges build once (basket self-join bounded by basket
    // size), degrees aggregate on u, contributions shuffle once on v —
    // each superstep is two key-hash aggregates over the edge list, the
    // same cost model Pregel charges. Node count broadcasts as a 1-row
    // bound (no driver collect).
    Q("x_pagerank_step",
      """WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk <> b.pk),
        |nodes AS (SELECT DISTINCT pk FROM basket),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |contrib AS (
        |  SELECT e.v AS pk,
        |         CAST(sum((1000000000000 // nn.n) // deg.d) AS BIGINT) AS incoming
        |  FROM edges e JOIN deg ON e.u = deg.u CROSS JOIN nn
        |  GROUP BY e.v)
        |SELECT nodes.pk,
        |       CAST(coalesce(deg.d, 0) AS BIGINT) AS deg,
        |       CAST((15 * 1000000000000 // (100 * nn.n))
        |            + (85 * coalesce(contrib.incoming, 0)) // 100 AS BIGINT)
        |         AS rank_units
        |FROM nodes CROSS JOIN nn
        |LEFT JOIN deg ON nodes.pk = deg.u
        |LEFT JOIN contrib ON nodes.pk = contrib.pk
        |ORDER BY nodes.pk""".stripMargin) {
      (s, dir) => {
        // the directed edge set is the persisted symmetric closure of
        // the shared pair artifact; the plan's three references to it
        // (deg, contrib, final deg left join) are three bucketed scans —
        // the former .cache() of a per-query self-join is gone, and the
        // deg aggregation is exchange-free on the bucket key
        val edges = CoPurchase.symEdges(s, dir)
        val nodes = CoPurchase.nodes(s, dir)
        val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
        val deg = CoPurchase.outDeg(s, dir, "sym")
        val contrib = edges.join(deg, "u").crossJoin(nn)
          .groupBy(col("v").as("pk"))
          .agg(sum(expr("(1000000000000 div n) div d")).as("incoming"))
        nodes.crossJoin(nn)
          .join(deg, col("pk") === col("u"), "left")
          .join(contrib, Seq("pk"), "left")
          .select(col("pk"),
            coalesce(col("d"), lit(0L)).as("deg"),
            (expr("15 * 1000000000000 div (100 * n)")
              + expr("(85 * coalesce(incoming, 0)) div 100")).as("rank_units"))
          .transform(d => graft.Q.sorted(d, "pk"))
      }
    },

    // Three PageRank supersteps — the iterated form of x_pagerank_step,
    // composed as a driver loop over the same exact-integer recurrence
    // (the oracle chains the identical CTE three times; every
    // intermediate is floor-division integer math, so iteration count
    // compounds no rounding drift between engines). Spark side: edges
    // and degrees build ONCE and every round reuses them — each
    // iteration adds one join + one v-keyed aggregate, the Pregel
    // superstep cost; identical subtrees dedupe via ReusedExchange. A
    // production solver swaps the fixed count for a convergence probe
    // exactly like ext/Dedup's CC loop (localCheckpoint per round,
    // O(1)-row driver check).
    Q("x_pagerank3",
      """WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |          FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk <> b.pk),
        |nodes AS (SELECT DISTINCT pk FROM basket),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
        |r0 AS (SELECT pk, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.v AS pk, sum(r0.r // deg.d) AS s
        |       FROM edges e JOIN deg ON e.u = deg.u JOIN r0 ON e.u = r0.pk GROUP BY e.v),
        |r1 AS (SELECT nodes.pk,
        |              (15 * 1000000000000 // (100 * nn.n)) + (85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.pk = c1.pk),
        |c2 AS (SELECT e.v AS pk, sum(r1.r // deg.d) AS s
        |       FROM edges e JOIN deg ON e.u = deg.u JOIN r1 ON e.u = r1.pk GROUP BY e.v),
        |r2 AS (SELECT nodes.pk,
        |              (15 * 1000000000000 // (100 * nn.n)) + (85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.pk = c2.pk),
        |c3 AS (SELECT e.v AS pk, sum(r2.r // deg.d) AS s
        |       FROM edges e JOIN deg ON e.u = deg.u JOIN r2 ON e.u = r2.pk GROUP BY e.v),
        |r3 AS (SELECT nodes.pk,
        |              (15 * 1000000000000 // (100 * nn.n)) + (85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.pk = c3.pk)
        |SELECT pk, CAST(r AS BIGINT) AS rank_units FROM r3 ORDER BY pk""".stripMargin) {
      (s, dir) => {
        // edges come from the persisted symmetric artifact (see
        // CoPurchase) — no per-query self-join, and deg aggregates
        // exchange-free on the bucket key
        val edges = CoPurchase.symEdges(s, dir)
        val nodes = CoPurchase.nodes(s, dir).localCheckpoint()
        // round 16: n as a driver literal (one count job) instead of a
        // 1-row broadcast frame — drops two crossJoin broadcast builds
        // per superstep plan; identical floor-division arithmetic
        val n = nodes.count()
        // loop-invariant sides SERVED, not spilled (round 16): degrees
        // come from the node-cardinality bucketed artifact, and the
        // edges⋈deg join is bucket-local on u (both artifacts share the
        // bucket spec) — re-planned per round from page-cache-warm
        // scans. The former DISK_ONLY persist of this |E|-sized frame
        // was exactly the scratch that ENOSPC'd the sf100 solo run
        // (218 s in, 36 GB free, post-sweep): at 1.2B edges the spill
        // plus one round's contribution shuffle exceeds local scratch,
        // while on a real cluster per-executor scratch scales out —
        // the artifact route removes the single-node cliff entirely.
        // (pagerankConverged's degree-folded frontier was A/B'd here
        // too and measured SLOWER — this loop has no convergence probe,
        // so the fold's per-round win doesn't exist and its init
        // nodes⋈deg checkpoint is pure addition: 2.5→3.2 s at sf0.1.)
        val deg = CoPurchase.outDeg(s, dir, "sym")
        val contribBase = edges.join(deg, "u")
        val base = 15L * 1000000000000L / (100L * n)
        var rank = nodes.select(col("pk"), lit(1000000000000L / n).as("r"))
        for (_ <- 1 to 3) {
          val contrib = contribBase
            .join(rank.withColumnRenamed("pk", "u"), "u")
            .groupBy(col("v").as("pk"))
            .agg(sum(expr("r div d")).as("s"))
          // materialize the (node-cardinality) frontier and cut its
          // lineage each round — same as ext/Dedup's CC loop; without
          // this, round N's plan nests rounds 1..N-1 and AQE re-plans
          // the whole chain
          rank = nodes
            .join(contrib, Seq("pk"), "left")
            .select(col("pk"),
              expr(s"$base + (85 * coalesce(s, 0)) div 100").as("r"))
            .localCheckpoint()
          // ContextCleaner is GC-driven: without a nudge, the previous
          // round's dead superstep shuffle files survive to the end of
          // the query and the rounds' footprints ADD on local scratch.
          // Scale-conditional since round 16 — pure pause tax at gate
          // SFs (see pagerankConverged).
          if (bigCorpus(s, dir)) System.gc()
        }
        rank.select(col("pk"), col("r").as("rank_units"))
          .transform(d => graft.Q.sorted(d, "pk"))
      }
    },

    // The FULL PageRank solver (round-7 verdict task 4): the superstep
    // shape x_pagerank3 proved flat at sf10, under a convergence-probe
    // driver loop with DANGLING-MASS REDISTRIBUTION — the two semantics
    // the step/3 queries deliberately simplified away. The graph here is
    // the DIRECTED co-purchase graph (u -> v iff co-purchased and
    // u < v), which guarantees sink vertices (every component's max
    // part id has out-degree 0), so the redistribution term is
    // non-vacuous at every SF — the lesson of round 6's vacuous
    // triangle oracle. Mass is conserved: Σr stays within n floor-units
    // of the 1e12 total each round (Ext8Spec pins this), where the
    // step/3 recurrences silently leak the dangling share.
    //
    // Convergence: the loop exits when the L1 delta between rounds is
    // EXACTLY ZERO in scaled-integer units — an integer fixpoint, after
    // which every further round reproduces the same vector, so the
    // early exit is bit-safe against the fixed-$PrFullIters-round
    // oracle chain at any SF (an eps > 0 exit would not be). The probe
    // is an O(1)-row driver read per round, same as ext/Dedup's CC
    // loop; graphs that hit the fixpoint early (regular graphs do at
    // round 1) stop paying supersteps immediately.
    Q("x_pagerank_full", pagerankFullOracleSql) {
      (s, dir) => {
        // undirected edge set = the shared pair artifact at supp >= 1;
        // degrees ride their own node-cardinality artifact (round 16)
        val edges = CoPurchase.pairs(s, dir).select(col("u"), col("v"))
        val nodes = CoPurchase.nodes(s, dir)
        val (rank, _) = pagerankConverged(edges, nodes, PrFullIters,
          degIn = Some(CoPurchase.outDeg(s, dir, "dir")),
          gcPerRound = bigCorpus(s, dir))
        rank.select(col("pk"), col("r").as("rank_units"))
          .transform(d => graft.Q.sorted(d, "pk"))
      }
    },

    // k-core decomposition of the support-thresholded co-purchase graph
    // — the third iterative-solver completion (CC: d7, PageRank:
    // x_pagerank_full, degeneracy pruning: here). Each round drops every
    // vertex whose degree fell below K and the edges touching it; the
    // cascade is the whole point (removing a weak vertex weakens its
    // neighbors). Dense k-cores are the "pathological near-dup cluster"
    // detector of a dedup graph — a core that survives high K is a
    // template-spam family, not organic duplication.
    //
    // Semantics: bounded-round pruning — EXACTLY KcoreMaxRounds rounds
    // with an early exit on the edge-count fixpoint (pruning is
    // monotone, so equal count ⟹ identical edge set ⟹ every further
    // round is a no-op; the engine and the fixed-round oracle agree
    // wherever convergence lands, the x_pagerank_full contract). At the
    // gate SF the graph converges in 11 rounds < KcoreMaxRounds, so the
    // output IS the true 3-core (935 vertices of 1880 — non-vacuous);
    // all arithmetic is integer, no cross-engine float anywhere.
    //
    // Scale shape: per round, one degree aggregation + two semi joins
    // over the |E|-sized frame, ONE |E| checkpoint replacing the
    // previous (the x_pagerank3 single-artifact lesson), and an
    // O(1)-row count probe. The co-purchase graph is support-thresholded
    // (supp >= TriSupport), orders of magnitude below corpus size.
    Q("x_kcore", kcoreOracleSql) {
      (s, dir) => {
        // same TriSupport filter over the shared pair artifact as
        // x_triangles — the threshold is a scan predicate, not a rebuild
        val e0 = CoPurchase.pairs(s, dir)
          .where(col("supp") >= TriSupport)
          .select("u", "v")
        val (core, _, _) = kcoreConverged(
          e0.select(col("u"), col("v"))
            .unionAll(e0.select(col("v").as("u"), col("u").as("v"))),
          KcoreK, KcoreMaxRounds)
        core.groupBy(col("u").as("part"))
          .agg(count(lit(1)).as("core_deg"))
          .transform(d => graft.Q.sorted(d, "part"))
      }
    })

  /** Corpus-size tier for scale-conditional hygiene (the per-round
    * System.gc() that keeps sf100 scratch alive is a pure pause tax at
    * gate SFs). Same 512 MB line Bench.LargeSfBytes draws. */
  private val GcTierBytes = 512L << 20
  private def bigCorpus(s: SparkSession, dir: String): Boolean =
    try graft.sources.Layout.sourceBytes(s, s"$dir/lineitem.parquet") > GcTierBytes
    catch { case _: Throwable => false }

  /** Core threshold for x_kcore (median gate-graph degree is 3, so the
    * 3-core prunes roughly half the vertices through a deep cascade). */
  val KcoreK = 3

  /** Fixed oracle round count. The gate graph converges in 11; larger
    * organic graphs may exit via the cap, leaving a partially-pruned
    * (still cross-engine-identical) graph — raise for a production
    * degeneracy run, semantics unchanged. */
  val KcoreMaxRounds = 12

  /** Iterative k-core pruning under an edge-count fixpoint probe.
    * `edgesIn` must contain BOTH directions of every undirected edge.
    * Returns (surviving directed edge frame, rounds executed,
    * converged?). */
  def kcoreConverged(edgesIn: org.apache.spark.sql.DataFrame, k: Int,
      maxRounds: Int): (org.apache.spark.sql.DataFrame, Int, Boolean) = {
    var g = edgesIn.localCheckpoint()
    var n = g.count()
    var iters = 0
    var converged = false
    while (!converged && iters < maxRounds) {
      val keep = g.groupBy("u").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("u")
      val g2 = g.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      val n2 = g2.count()
      converged = n2 == n
      g = g2
      n = n2
      iters += 1
    }
    (g, iters, converged)
  }

  /** Oracle twin of x_kcore: the identical pruning round unrolled
    * [[KcoreMaxRounds]] times. Every g$k is referenced three times by
    * round k+1 (degree count + both endpoint filters) — MATERIALIZED,
    * or DuckDB's default CTE inlining re-evaluates the chain
    * exponentially (the x_pagerank_full lesson). */
  private def kcoreOracleSql: String = {
    val rounds = (1 to KcoreMaxRounds).map { k =>
      val prev = s"g${k - 1}"
      s"""k$k AS (SELECT u FROM $prev GROUP BY u HAVING count(*) >= $KcoreK),
         |g$k AS MATERIALIZED (SELECT g.u, g.v FROM $prev g
         |       JOIN k$k a ON g.u = a.u JOIN k$k b ON g.v = b.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e0 AS (SELECT a.pk AS u, b.pk AS v
       |       FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
       |       GROUP BY a.pk, b.pk HAVING count(*) >= $TriSupport),
       |g0 AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
       |$rounds
       |SELECT u AS part, CAST(count(*) AS BIGINT) AS core_deg
       |FROM g$KcoreMaxRounds GROUP BY u ORDER BY part""".stripMargin
  }

  /** Fixed oracle round count for x_pagerank_full. The engine loop may
    * exit earlier ONLY on an exact integer fixpoint, which subsequent
    * rounds reproduce verbatim — so engine and oracle agree at every SF
    * regardless of where convergence lands. 5 rounds keeps the oracle
    * CTE chain and the gate-scale superstep cost bounded; a production
    * run raises it with epsilon semantics unchanged.
    */
  val PrFullIters = 5

  /** PageRank with dangling-mass redistribution under a convergence
    * probe:
    *
    *   r_{k+1}(v) = 15·S div (100n)
    *              + (85 · (Σ_{u→v} (r_k(u) div d_u)  +  D_k div n)) div 100
    *
    * where S = 1e12 scaled-integer units, d_u = out-degree, and
    * D_k = Σ r_k(u) over u with no outgoing edge (the dangling mass,
    * redistributed uniformly). All arithmetic is long floor division —
    * bit-reproducible against the DuckDB twin.
    *
    * Scale shape (same as x_pagerank3, verified flat sf1→sf10): the
    * loop-invariant edges⋈deg artifact materializes once via
    * localCheckpoint and keeps its hash(u) partitioning, so each round
    * shuffles only the node-cardinality rank frontier; the dangling
    * aggregate is a 1-row broadcast (anti-join of the frontier against
    * the degree keys); the delta probe reads ONE row on the driver.
    * Returns (final rank frame (pk, r), rounds executed).
    */
  def pagerankConverged(edgesIn: org.apache.spark.sql.DataFrame,
      nodesIn: org.apache.spark.sql.DataFrame,
      maxIters: Int,
      degIn: Option[org.apache.spark.sql.DataFrame] = None,
      gcPerRound: Boolean = false):
      (org.apache.spark.sql.DataFrame, Int) = {
    // round-16 scratch fix (the x_pagerank3 sf100 ENOSPC lesson, see
    // CoPurchase.outDeg): no |E|-sized persist at all. Degrees ride the
    // caller-provided node-cardinality artifact (or a one-pass
    // aggregate for ad-hoc graphs, e.g. Ext8Spec's), the edge list
    // re-plans per round from the bucketed artifact's page-cache-warm
    // scan, and each round ends with a GC nudge so ContextCleaner
    // reclaims the previous round's dead shuffle files instead of
    // letting the rounds' scratch footprints add up. The earlier
    // DISK_ONLY persist traded recompute for spill — the right trade at
    // sf10, a cliff at sf100 where the spill alone approached the free
    // scratch.
    val deg = degIn.getOrElse(
      edgesIn.groupBy("u").agg(count(lit(1)).as("d")).localCheckpoint())
    // Round-16 degree folding (guide §2.4 — remove per-round work that
    // is loop-invariant): the frontier row carries (pk, d, r), with d
    // the out-degree or NULL for dangling nodes, joined ONCE here. Each
    // superstep's contribution join then takes d straight from the
    // frontier (the old per-round edges⋈deg re-join is gone), and the
    // dangling test is `d IS NULL` on the already-checkpointed frontier
    // — the old per-round probe joins against rank and deg are gone
    // too. The frontier stays node-cardinality; d adds 8 bytes/row.
    val keyed = nodesIn
      .join(deg.withColumnRenamed("u", "pk"), Seq("pk"), "left")
      .localCheckpoint()
    // Round-16 (guide §1.2/§5 — fewer actions per round): n and the
    // dangling-node count are ONE head() for the whole solve; driver
    // literals instead of 1-row broadcast frames remove a broadcast-
    // exchange build from every round's plan. O(1) driver state, same
    // floor-division arithmetic. Round 1's dangling mass needs no data
    // pass: r0 is uniform, so dm0 = (#dangling nodes) · r0.
    val init = keyed.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("d").isNull, 1L)), lit(0L)).as("dangling")).head()
    val n = init.getLong(0)
    val r0 = 1000000000000L / n // positive longs: / == SQL div
    var rank = keyed.select(col("pk"), col("d"), lit(r0).as("r"))
    var dm = init.getLong(1) * r0
    val base = 15L * 1000000000000L / (100L * n)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val dmn = dm / n
      val contrib = edgesIn
        .join(rank.select(col("pk").as("u"), col("d"), col("r")), "u")
        .groupBy(col("v").as("pk"))
        .agg(sum(expr("r div d")).as("s"))
      val next = rank
        .select(col("pk"), col("d"), col("r").as("rp"))
        .join(contrib, Seq("pk"), "left")
        .select(col("pk"), col("d"),
          expr(s"$base + (85 * (coalesce(s, 0) + $dmn)) div 100").as("r"),
          col("rp"))
        .localCheckpoint()
      // the probe is a plain aggregate over the checkpointed frontier —
      // delta AND next round's dangling mass in one O(1)-row action,
      // zero joins (rp and d ride the frontier row)
      val probe = next
        .agg(sum(abs(col("r") - col("rp"))).as("delta"),
          coalesce(sum(when(col("d").isNull, col("r"))), lit(0L)).as("dm"))
        .head()
      converged = probe.getLong(0) == 0L
      dm = probe.getLong(1)
      rank = next.select(col("pk"), col("d"), col("r"))
      iters += 1
      // reclaim the previous round's dead shuffle files promptly —
      // ContextCleaner only acts when the dropped dependencies are
      // actually garbage-collected. Scale-conditional (round 16): the
      // full-GC pause is pure tax at gate SFs where the per-round
      // shuffle footprint is KBs; callers pass gcPerRound=true above
      // the large-corpus tier where scratch reclamation is what kept
      // the sf100 solo run alive.
      if (gcPerRound) System.gc()
    }
    (rank.select(col("pk"), col("r")), iters)
  }

  /** Oracle twin of x_pagerank_full: the identical integer recurrence
    * chained for exactly [[PrFullIters]] rounds, each round's dangling
    * mass computed by the same anti-join shape (LEFT JOIN deg … WHERE
    * deg.u IS NULL).
    *
    * The rank CTEs (and the loop-invariant edges/deg) are declared
    * `AS MATERIALIZED`: each r_{k-1} is referenced TWICE per round
    * (contribution sum + dangling mass), and DuckDB 1.0 inlines CTEs by
    * default, so without the hint the chain re-evaluates the full
    * upstream pipeline 2^k times — measured 65 GB of temp spill at sf1
    * before materialization pinned each round to one evaluation.
    */
  private def pagerankFullOracleSql: String = {
    val rounds = (1 to PrFullIters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS (SELECT e.v AS pk, sum($prev.r // deg.d) AS s
         |       FROM edges e JOIN deg ON e.u = deg.u JOIN $prev ON e.u = $prev.pk GROUP BY e.v),
         |d$k AS (SELECT coalesce(sum($prev.r), 0) AS dm
         |       FROM $prev LEFT JOIN deg ON $prev.pk = deg.u WHERE deg.u IS NULL),
         |r$k AS MATERIALIZED (SELECT nodes.pk,
         |              (15 * 1000000000000 // (100 * nn.n))
         |              + (85 * (coalesce(c$k.s, 0) + (d$k.dm // nn.n))) // 100 AS r
         |       FROM nodes CROSS JOIN nn CROSS JOIN d$k LEFT JOIN c$k ON nodes.pk = c$k.pk)""".stripMargin
    }.mkString(",\n")
    s"""WITH basket AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
       |          FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk),
       |nodes AS MATERIALIZED (SELECT DISTINCT pk FROM basket),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
       |r0 AS MATERIALIZED (SELECT pk, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT pk, CAST(r AS BIGINT) AS rank_units FROM r$PrFullIters ORDER BY pk""".stripMargin
  }
}
