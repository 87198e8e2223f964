package graft

/** Pins the physical-plan shapes that carry the 100 TB scale arguments —
  * a regression here means a scale property silently broke even though
  * results stay correct at test size.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(name: String): String = {
    // other suites may have cached subtrees (e.g. OpsSpec caches bars);
    // the CacheManager would substitute InMemoryRelations whose stored
    // plans print their own exchanges — snapshot the pristine plan
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("dashboard_cascade: one agg shuffle + one symbol shuffle, 4 fused Window ops") {
    val p = plan("dashboard_cascade")
    // exchanges: bars (symbol,minute) agg, windows' (symbol), final
    // single-partition determinism sort — adding an indicator column
    // must NOT add an exchange
    assert(count(p, "Exchange") <= 3, s"exchange count grew:\n$p")
    // every same-depth window expression fused into one Window op per
    // dependency layer (withColumn chains would produce ~20)
    assert(count(p, "Window ") + count(p, "Window\n") <= 5, s"window ops not fused:\n$p")
  }

  test("d4 inverted index: the shingle self-join is shuffle-hash, never broadcast") {
    val p = plan("d4_ngram_jaccard")
    // the O(sum df^2) join on the exploded index key g — the one join
    // here that CANNOT broadcast at scale. (The per-doc size lookups
    // broadcast at test size by Catalyst's stats; AQE demotes those
    // automatically when the corpus outgrows the threshold.)
    val gJoin = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("[g#"))
    assert(gJoin.forall(_.contains("ShuffledHashJoin")),
      s"index self-join not shuffle-hash:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"no shuffled-hash join found:\n$p")
  }

  test("j1 star join: every dimension broadcast, fact side streams") {
    val p = plan("j1_star_broadcast")
    assert(count(p, "BroadcastHashJoin") == 3, s"expected 3 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side must not shuffle for dims:\n$p")
  }

  test("j2 big-big join: sort-merge, not broadcast") {
    val p = plan("j2_bigjoin_smj")
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
  }

  test("j2b: co-bucketed join — both scans bucketed, zero exchange below the join") {
    // build the artifacts, then snapshot the plan
    val df = SparkEntry.queries("j2b_bigjoin_bucketed")(spark, sf)
    assert(df.collect().nonEmpty)
    spark.catalog.clearCache()
    val qe = SparkEntry.queries("j2b_bigjoin_bucketed")(spark, sf).queryExecution
    val p = qe.executedPlan.toString
    assert(count(p, "Bucketed: true") >= 2,
      s"both sides must read their bucketed layout:\n$p")
    // the join consumes the bucketing as its distribution: no shuffle
    // may sit between either scan and the join (the agg above it still
    // exchanges on `priority` — that one is fine and expected). In the
    // printed tree the join's SUBTREE is everything from the join line
    // on (children print after their parent), so "no Exchange below the
    // join" is "no Exchange in that suffix".
    val ji = p.indexOf("SortMergeJoin")
    assert(ji >= 0, s"expected a sort-merge join operator:\n$p")
    val below = p.substring(ji)
    assert(!below.contains("Exchange"),
      s"bucketed join must not re-shuffle its children:\n$p")
    assert(count(below, "Bucketed: true") >= 2,
      s"both join children must be the bucketed scans:\n$p")
  }

  test("j8b: partkey-bucketed fact — stats agg and probe join both exchange-free") {
    val df = SparkEntry.queries("j8b_tpch_q17_bucketed")(spark, sf)
    assert(df.collect().nonEmpty)
    spark.catalog.clearCache()
    val p = plan("j8b_tpch_q17_bucketed")
    val ji = p.indexOf("SortMergeJoin")
    assert(ji >= 0, s"expected the probe SMJ:\n$p")
    // the SMJ subtree (printed suffix) holds both bucketed scans AND the
    // per-part stats aggregation — none of them may shuffle; the part
    // dimension's BroadcastExchange is expected and fine
    val below = p.substring(ji)
    assert(!below.contains("Exchange hashpartitioning"),
      s"bucketed fact must feed the agg and the join without a shuffle:\n$p")
    assert(count(below, "Bucketed: true") >= 2,
      s"both fact consumers must read the bucketed artifact:\n$p")
    assert(below.contains("HashAggregate"),
      s"the stats agg must sit below the join, over the bucketed scan:\n$p")
  }

  test("j3: planner uses semi/anti joins, not row-widening inner joins") {
    val p = plan("j3_semi_anti")
    assert(p.contains("LeftSemi"), s"expected LeftSemi:\n$p")
    assert(p.contains("LeftAnti"), s"expected LeftAnti:\n$p")
  }

  test("a20c: co-bucketed as-of — zero Exchange AND zero Sort below the exec") {
    // build the artifacts, then snapshot the pristine plan (j2b pattern)
    val df = SparkEntry.queries("a20c_asof_bucketed")(spark, sf)
    assert(df.collect().nonEmpty)
    spark.catalog.clearCache()
    val p = plan("a20c_asof_bucketed")
    val ji = p.indexOf("AsOfJoin")
    assert(ji >= 0, s"expected the native AsOfJoin operator:\n$p")
    // children print after their parent: the exec's subtree is the
    // suffix. The (symbol, ts)-sorted bucket files satisfy BOTH the
    // clustering and the ordering requirement — no exchange, no sort,
    // the shape that deletes a20b's sf100 exchange+disk-sort cost.
    val below = p.substring(ji)
    assert(!below.contains("Exchange"),
      s"bucketed as-of must not re-shuffle its children:\n$p")
    assert(!below.contains("Sort "),
      s"(key, ts)-sorted buckets must feed the exec without a re-sort:\n$p")
    assert(count(below, "Bucketed: true") >= 2,
      s"both children must be the bucketed scans:\n$p")
  }

  test("a8 as-of join: single shuffle+sort per side, no nested-loop join") {
    val p = plan("a8_asof_join")
    assert(!p.contains("NestedLoop"), s"as-of must not plan a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"as-of must not plan a cartesian:\n$p")
  }

  test("a11 range join: equi-join on buckets, no nested-loop join") {
    val p = plan("a11_range_join")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"bucketized range join must stay an equi-join:\n$p")
  }

  test("j4 salted join: salt is in the join partitioning key, build side not broadcast") {
    val p = plan("j4_salted_skew")
    val saltPart = p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("event_type#") && l.contains("salt#"))
    assert(saltPart, s"join not partitioned by (event_type, salt):\n$p")
    val typeJoin = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("event_type#"))
    assert(typeJoin.nonEmpty && typeJoin.forall(!_.contains("Broadcast")),
      s"salted join must not broadcast (the whole point is big-big):\n$p")
  }

  test("j5 top-k: TakeOrderedAndProject, never a global sort of the aggregate") {
    val p = plan("j5_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"expected per-partition top-k:\n$p")
    // the only full Sort allowed is the final single-partition output
    // determinism sort; the top-10 cut itself must not global-sort
    assert(count(p, "Sort ") <= 1, s"unexpected extra Sort:\n$p")
  }

  test("j7: fact scan is dynamically partition-pruned by the dim filter") {
    val p = plan("j7_dpp")
    // the fact side carries NO static nationkey predicate — pruning must
    // come from the runtime DPP subquery fed by the broadcast dim
    assert(p.contains("dynamicpruning"),
      s"no DynamicPruningExpression in the fact scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim side must broadcast:\n$p")
    // and the pruning must actually bite: ASIA selects 5 of 25 nationkey
    // partition directories. Execute THROUGH the df's own queryExecution
    // (collect) so the DPP subquery resolves, then read the partition
    // count off the final adaptive plan's fact scan metrics.
    val fact = graft.sources.Layout.readClustered(spark,
      ops.Joins.dppCustomerPath(spark, sf))
    val total = fact.select("c_nationkey").distinct().count()
    val pruned = ops.Joins.dppQuery(spark, sf)
    assert(pruned.collect().nonEmpty)
    val finalPlan = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // materialized AQE stages are leaf wrappers — recurse through them
    def scans(pl: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      pl.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      }.flatten
    val factScan = scans(finalPlan).filter(_.output.exists(_.name == "c_acctbal"))
    assert(factScan.nonEmpty, s"no FileSourceScanExec for the fact:\n$finalPlan")
    val sel = factScan.head.metrics.get("numPartitions").map(_.value)
    assert(sel.exists(n => n > 0 && n < total),
      s"DPP did not reduce partitions: selected=$sel of $total")
  }

  /** The serve-scan bucket-pruning pin (e13/e14b): some scan in the plan
    * must report `SelectedBucketsCount: X out of N` with X < N — the
    * probed-cluster isin() actually skipped unprobed buckets. */
  private def assertBucketPruned(p: String, buckets: Int): Unit = {
    val sel = raw"SelectedBucketsCount: (\d+) out of (\d+)".r
      .findAllMatchIn(p).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(sel.exists { case (x, n) => n == buckets && x > 0 && x < n },
      s"no scan pruned the $buckets-bucket index (found: $sel):\n$p")
  }

  test("e13: the serve plan reads the persisted index, never the corpus") {
    val p = plan("e13_index_serve")
    assert(p.contains("graft_ivfpq_codes_"),
      s"serve plan does not scan the persisted codes table:\n$p")
    assert(p.contains("graft_ivfpq_cent_"),
      s"serve plan does not scan the persisted centroids:\n$p")
    // the exact re-rank (round-13) fetches ONLY from the stored
    // IVF-Flat lists — still an index table, still not the corpus
    assert(p.contains("graft_ivfflat_"),
      s"re-rank does not fetch from the persisted IVF-Flat lists:\n$p")
    assert(!p.contains("embeddings"),
      s"serve plan still references the raw corpus table:\n$p")
    assertBucketPruned(p, ext.Embeddings.IndexBuckets)
    // and e13 answers exactly what e11 answers (same oracle; this pins
    // the engine sides against EACH OTHER, independent of DuckDB)
    val served = SparkEntry.queries("e13_index_serve")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val fresh = SparkEntry.queries("e11_ivf_adc")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == fresh, "persisted-index answers diverge from e11")
    assert(served.nonEmpty)
  }

  test("e14b: range search served from the index tables, never the corpus — and exact") {
    val p = plan("e14b_range_index")
    assert(p.contains("graft_ivfflat_"),
      s"serve plan does not scan the persisted IVF-Flat lists:\n$p")
    assert(p.contains("graft_ivfpq_cent_"),
      s"serve plan does not scan the persisted centroids:\n$p")
    assert(!p.contains("embeddings"),
      s"serve plan still references the raw corpus table:\n$p")
    // the probed-cluster isin PRUNES BUCKETS on the IVF-Flat scan:
    // unprobed inverted lists are never read (<=10 clusters at the gate
    // corpus can touch at most 10 of the 16 buckets, so `< 16` cannot
    // flap). Without the isin the join reads all 16 and discards.
    assertBucketPruned(p, ext.Embeddings.IndexBuckets)
    // precision is EXACT: every served (query, neighbor, cos) row is a
    // row of the brute-force e14 (the probe bound can only DROP rows,
    // never change one) — pins the engine sides against each other
    val served = SparkEntry.queries("e14b_range_index")(spark, sf)
      .collect().map(_.toSeq).toSet
    val brute = SparkEntry.queries("e14_range_search")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(served.nonEmpty, "no rows inside the radius at gate scale")
    assert(served.subsetOf(brute),
      s"index-served rows not a subset of brute force: ${served -- brute}")
  }

  /** Non-adaptive snapshot (the Explain audit convention): exchange
    * REUSE only materializes in AQE's final plan, so pins that assert
    * it read the static plan instead of the pre-execution adaptive
    * skeleton. */
  private def staticPlan(name: String): String = {
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("x_ngram_novelty: shingle projection reused, per-doc agg adds no exchange") {
    val p = staticPlan("x_ngram_novelty")
    // the df side re-derives the exploded shingles from the SAME spread
    // exchange (one scan pipeline, not two)
    assert(p.contains("ReusedExchange"), s"shingle projection not reused:\n$p")
    // shuffles: spread(doc_id), df groupBy(g), final determinism sort —
    // the per-doc aggregation must reuse the spread partitioning.
    // Line-based count: a ReusedExchange node PRINTS its referent's
    // "Exchange hashpartitioning(...)" description on its own line, and
    // BroadcastExchange is not a shuffle — substring counting over the
    // tree miscounts both
    val shuffles = p.linesIterator.count(l =>
      (l.contains("+- Exchange ") || l.trim.startsWith("Exchange ")) &&
        !l.contains("ReusedExchange"))
    assert(shuffles <= 3, s"per-doc agg grew an exchange ($shuffles):\n$p")
  }

  test("w16 pair corr: window partitioned by the DATA-DERIVED pair key") {
    val p = staticPlan("w16_pair_corr")
    // the rolling-corr window fans pairs out as independent partitions;
    // a literal pair id constant-folds OUT of the partitioning and
    // serializes the whole window on one task (caught here in round 10)
    assert(p.contains("hashpartitioning(pair"),
      s"window not hash-partitioned by pair:\n$p")
    assert(!p.contains("No Partition Defined"), s"unpartitioned window:\n$p")
  }

  test("w16r restricted pair universe: leg + pair filters sit below the window and the bar agg") {
    val p = staticPlan("w16r_pair_corr_sel")
    // still the data-derived pair partitioning
    assert(p.contains("hashpartitioning(pair"),
      s"window not hash-partitioned by pair:\n$p")
    val lines = p.linesIterator.toVector
    // the pair predicate (single-element isin folds to an equality, and
    // Catalyst folds THAT into the join condition itself) must print
    // BELOW the Window operator — the window never sees unselected pairs
    val winIdx = lines.indexWhere(_.contains("Window "))
    val pairIdx = lines.indexWhere(_.contains("AAPL|MSFT"))
    assert(winIdx >= 0 && pairIdx > winIdx,
      s"pair predicate not below the window (win=$winIdx pair=$pairIdx):\n$p")
    // the leg predicate is on the bar GROUP KEY, so PushDownPredicates
    // sinks it under the re-bar aggregation onto the raw event rows: the
    // pushed form is rewritten in terms of user_id (symbolFor's input),
    // a column that EXISTS only below the aggregation — so a Filter line
    // mentioning both is proof of placement. (Don't key on the scan's
    // DataFilters text: that line truncates at a width the suite's
    // longer expression ids overflow, which flapped this pin once.)
    assert(lines.exists(l => l.contains("Filter") &&
        l.contains("IN (AAPL,MSFT)") && l.contains("user_id")),
      s"leg predicate not pushed below the bar aggregation:\n$p")
    // and the restriction is semantically real: only the selected pair
    val pairsOut = SparkEntry.queries("w16r_pair_corr_sel")(spark, sf)
      .select("pair").distinct().collect().map(_.getString(0)).toSet
    assert(pairsOut == Set("AAPL|MSFT"), s"unexpected pairs: $pairsOut")
  }

  test("t6r restricted pairs strategy: inherits w16r's predicate placement") {
    val p = staticPlan("t6r_pairs_zscore_sel")
    assert(p.contains("hashpartitioning(pair"),
      s"window not hash-partitioned by pair:\n$p")
    val lines = p.linesIterator.toVector
    // pair predicate below the Window (see the w16r pin for why the
    // folded literal is the robust anchor)
    val winIdx = lines.indexWhere(_.contains("Window "))
    val pairIdx = lines.indexWhere(_.contains("AAPL|MSFT"))
    assert(winIdx >= 0 && pairIdx > winIdx,
      s"pair predicate not below the window (win=$winIdx pair=$pairIdx):\n$p")
    // leg predicate pushed below the bar aggregation to the event rows
    assert(lines.exists(l => l.contains("Filter") &&
        l.contains("IN (AAPL,MSFT)") && l.contains("user_id")),
      s"leg predicate not pushed below the bar aggregation:\n$p")
    val pairsOut = SparkEntry.queries("t6r_pairs_zscore_sel")(spark, sf)
      .select("pair").distinct().collect().map(_.getString(0)).toSet
    assert(pairsOut == Set("AAPL|MSFT"), s"unexpected pairs: $pairsOut")
  }
}
