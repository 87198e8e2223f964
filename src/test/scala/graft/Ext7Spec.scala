package graft

import org.apache.spark.sql.functions._

/** Round-5 third wave: CDC merge, attribution, cumulative uniques,
  * BPE pair counts, bigram-df scoring, histogram stats. Each test pins a
  * property the DuckDB hash oracle can't see (cross-row invariants,
  * independent recomputation), not cell values.
  */
class Ext7Spec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("x_cdc_merge: all four MERGE branches resolve correctly") {
    val out = run("x_cdc_merge").cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    val spend = orders.where(col("o_custkey") % 5 =!= 2)
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .cache()
    // D: no customer whose key is in the delete set survives
    val deleted = spend.where(col("key") % 7 === 0)
    assert(out.join(deleted, "key").count() == 0)
    // U: every updated balance equals the independently recomputed spend
    val updated = out.where(col("src") === "updated")
    assert(updated.join(spend, "key")
      .where(col("bal_cents") =!= col("cents")).count() == 0)
    // I: inserts are exactly the mirrored %11 update keys (negative, so
    // disjoint from real custkeys at any scale), named NEW#key
    val expIns = spend.where(col("key") % 7 =!= 0 && col("key") % 11 === 0)
    assert(out.where(col("src") === "inserted").count() == expIns.count())
    assert(out.where(col("src") === "inserted" &&
      (col("key") >= 0L ||
        col("name") =!= concat(lit("NEW#"), col("key").cast("string"))))
      .count() == 0)
    // kept: untouched customers keep their base balance
    val base = graft.sources.Tables.customer(spark, sf).select(
      col("c_custkey").as("key"),
      round(col("c_acctbal") * 100, 0).cast("long").as("base_cents"))
    assert(out.where(col("src") === "kept").join(base, "key")
      .where(col("bal_cents") =!= col("base_cents")).count() == 0)
    spend.unpersist(); out.unpersist()
  }

  test("a17_attribution: the credited touch is the latest at-or-before touch") {
    val out = run("a17_attribution").cache()
    val ev = graft.sources.Tables.events(spark, sf).cache()
    // one row per purchase
    assert(out.count() == ev.where(col("event_type") === "purchase").count())
    val touches = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("t_id"), col("ts").as("t_ts"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("p_ts"), col("user_id"))
    val joined = out.join(purch, Seq("event_id", "user_id")).cache()
    // the credited touch exists, belongs to the user, and is not after
    // the purchase (ties on ts resolve toward the touch)
    val credited = joined.where(col("touch_id") =!= -1)
      .join(touches, Seq("user_id")).where(col("touch_id") === col("t_id"))
    assert(credited.count() == joined.where(col("touch_id") =!= -1).count())
    assert(credited.where(col("t_ts") > col("p_ts")).count() == 0)
    // latest-touch property: recheck via max over eligible touches per
    // purchase ((ts, event_id) lexicographic, at-or-before the purchase);
    // 'direct' (touch_id = -1) must mean no eligible touch at all
    val best = joined.join(touches, Seq("user_id"))
      .where(col("t_ts") < col("p_ts") ||
        (col("t_ts") === col("p_ts") && col("t_id") <= col("event_id")))
      .groupBy("event_id").agg(max(struct(col("t_ts"), col("t_id"))).as("m"))
      .select(col("event_id"), col("m.t_id").as("best_id"))
    assert(joined.join(best, Seq("event_id"), "left")
      .where(coalesce(col("best_id"), lit(-1L)) =!= col("touch_id"))
      .count() == 0)
    joined.unpersist(); ev.unpersist(); out.unpersist()
  }

  test("a18_cum_uniques: running sum reconciles with global distincts") {
    val out = run("a18_cum_uniques").cache()
    val ev = graft.sources.Tables.events(spark, sf).cache()
    assert(out.agg(sum("n_events")).head().getLong(0) == ev.count())
    val users = ev.select("user_id").distinct().count()
    assert(out.agg(sum("n_new")).head().getLong(0) == users)
    assert(out.agg(max("cum_users")).head().getLong(0) == users)
    // cum is the prefix sum of n_new and never decreases
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    assert(out.withColumn("chk", sum("n_new").over(w))
      .where(col("chk") =!= col("cum_users")).count() == 0)
    assert(out.where(col("n_active") > col("n_events") ||
      col("n_new") > col("n_active")).count() == 0)
    ev.unpersist(); out.unpersist()
  }

  test("x_bpe_pairs: top pair agrees with an independent full count") {
    val out = run("x_bpe_pairs").cache()
    assert(out.count() == 20)
    // counts are non-increasing in output order (top-k of a total order)
    val rows = out.collect()
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // independent recount of the reported top pair via SQL explode
    val docs = graft.sources.Tables.documents(spark, sf)
    val top = rows.head
    val recount = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(posexplode(col("toks")).as(Seq("i", "tok")), col("doc_id"), col("toks"))
      .where(col("i") < size(col("toks")) - 1)
      .where(col("tok") === top.getAs[String]("a") &&
        element_at(col("toks"), col("i") + 2) === top.getAs[String]("b"))
      .count()
    assert(recount == top.getAs[Long]("cnt"), s"top pair recount $recount vs $top")
    out.unpersist()
  }

  test("x_lm_df: totals reconcile and df bounds hold") {
    val out = run("x_lm_df").cache()
    val docs = graft.sources.Tables.documents(spark, sf).cache()
    assert(out.count() == docs.count())
    // every doc's bigram count is n_tokens - 1
    val nt = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) - 1).cast("long").as("exp_bigrams"))
    assert(out.join(nt, "doc_id")
      .where(col("n_bigrams") =!= col("exp_bigrams")).count() == 0)
    // mean df per-mille is within [1000, 1000 * n_docs]; novelty bounded
    val nd = docs.count()
    assert(out.where(col("milli_mean_df") < 1000 ||
      col("milli_mean_df") > lit(1000L) * nd).count() == 0)
    assert(out.where(col("n_novel_bigrams") > col("n_bigrams")).count() == 0)
    // sum_df consistency: milli_mean_df = sum_df*1000 div n_bigrams
    assert(out.where(expr("(sum_df * 1000) div n_bigrams") =!= col("milli_mean_df"))
      .count() == 0)
    docs.unpersist(); out.unpersist()
  }

  test("j8_tpch_q17: brand totals equal an independent window-based plan") {
    val out = run("j8_tpch_q17").cache()
    import org.apache.spark.sql.expressions.Window
    val li = graft.sources.Tables.lineitem(spark, sf).select(
      col("l_partkey"),
      round(col("l_quantity"), 0).cast("long").as("qty"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val w = Window.partitionBy("l_partkey")
    val small = li
      .withColumn("sum_qty", sum("qty").over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .where(lit(5) * col("qty") * col("cnt") < col("sum_qty"))
    val expN = small.count()
    assert(out.agg(sum("n_small")).head().getLong(0) == expN)
    val expRev = small.agg(sum("cents")).head().getLong(0)
    assert(out.agg(sum("revenue_cents")).head().getLong(0) == expRev)
    out.unpersist()
  }

  test("a19_rank_family: rank functions agree with their definitions") {
    val out = run("a19_rank_family").cache()
    // quartile sizes within each priority differ by at most 1
    val qs = out.groupBy("o_orderpriority", "quartile").count()
      .groupBy("o_orderpriority")
      .agg((max("count") - min("count")).as("spread"))
    assert(qs.where(col("spread") > 1).count() == 0)
    // percent_rank == (rank-1)/(n-1), cume_dist == rows_at_or_before/n,
    // third_cents == the 3rd row's cents — all recomputed from the
    // output itself using different window functions
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    val chk = out
      .withColumn("rk", rank().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      .withColumn("exp_pct", graft.Q.r6((col("rk") - 1).cast("double") / (col("n") - 1)))
      .withColumn("exp_cd", graft.Q.r6(col("rk").cast("double") / col("n")))
      .withColumn("exp_prev", coalesce(lag("cents", 1).over(w), lit(-1L)))
      .withColumn("rn", row_number().over(w))
    assert(chk.where(col("pct_rank") =!= col("exp_pct")).count() == 0)
    assert(chk.where(col("cdist") =!= col("exp_cd")).count() == 0)
    assert(chk.where(col("prev_cents") =!= col("exp_prev")).count() == 0)
    val thirds = chk.where(col("rn") === 3)
      .select(col("o_orderpriority").as("p"), col("cents").as("exp_third"))
    assert(chk.join(thirds, col("o_orderpriority") === col("p"))
      .where(col("third_cents") =!= col("exp_third")).count() == 0)
    out.unpersist()
  }

  test("x_pagerank_step: equals a driver-side exact integer recompute") {
    val out = run("x_pagerank_step").cache()
    val S = 1000000000000L
    val basket = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = basket.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val edges = byOrder.values.flatMap(ps =>
      for (u <- ps; v <- ps if u != v) yield (u, v)).toSet
    val nodes = basket.map(_._2).toSet
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val incoming = edges.toSeq.groupBy(_._2).view
      .mapValues(_.map { case (u, _) => (S / n) / deg(u) }.sum).toMap
    val expected = nodes.map(p => (p, deg.getOrElse(p, 0L),
      15 * S / (100 * n) + 85 * incoming.getOrElse(p, 0L) / 100)).toSeq.sorted
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expected)
    out.unpersist()
  }

  test("x_pagerank3: equals three driver-side exact iterations") {
    val out = run("x_pagerank3").cache()
    val S = 1000000000000L
    val basket = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = basket.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val edges = byOrder.values.flatMap(ps =>
      for (u <- ps; v <- ps if u != v) yield (u, v)).toSet
    val nodes = basket.map(_._2).toSet
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(p => p -> S / n).toMap
    for (_ <- 1 to 3) {
      val incoming = edges.toSeq.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => rank(u) / deg(u) }.sum).toMap
      rank = nodes.map(p =>
        p -> (15 * S / (100 * n) + 85 * incoming.getOrElse(p, 0L) / 100)).toMap
    }
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == rank)
    out.unpersist()
  }

  test("x_vocab_unk: coverage reconciles with corpus token counts") {
    val out = run("x_vocab_unk").cache()
    val docs = graft.sources.Tables.documents(spark, sf).cache()
    assert(out.count() == docs.count())
    val tok = docs.select(explode(split(col("text"), " ")).as("tok")).cache()
    assert(out.agg(sum("n_tokens")).head().getLong(0) == tok.count())
    // total in-vocab occurrences == sum of the top-20 tokens' counts
    val top20 = tok.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(20)
      .agg(sum("count")).head().getLong(0)
    assert(out.agg(sum("n_in_vocab")).head().getLong(0) == top20)
    assert(out.where(col("n_in_vocab") > col("n_tokens")).count() == 0)
    assert(out.where(
      expr("((n_tokens - n_in_vocab) * 1000) div n_tokens") =!= col("pm_unk"))
      .count() == 0)
    tok.unpersist(); docs.unpersist(); out.unpersist()
  }

  test("j9/j10: semi+anti shapes plan as such and satisfy their predicates") {
    val q21 = SparkEntry.queries("j9_tpch_q21")(spark, sf)
    val p21 = q21.queryExecution.executedPlan.toString
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"), p21)
    val rows = q21.collect()
    val ws = rows.map(_.getAs[Long]("numwait"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // j10: every reported nation's customers truly have no recent order
    val q22 = SparkEntry.queries("j10_tpch_q22")(spark, sf)
    val o = graft.sources.Tables.orders(spark, sf)
    val mx = o.agg(max("o_orderdate").as("m"))
    val recent = o.crossJoin(broadcast(mx))
      .where(col("o_orderdate") > col("m") - expr("INTERVAL 365 DAYS"))
      .select("o_custkey").distinct()
    val cust = graft.sources.Tables.customer(spark, sf)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey").count()
    // no nation can report more churned customers than it has
    // non-recent customers in total
    val total = graft.sources.Tables.customer(spark, sf)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_all"))
    val bad = q22.join(total, "c_nationkey")
      .join(cust.withColumnRenamed("count", "n_recent"), Seq("c_nationkey"), "left")
      .where(col("numcust") > col("n_all") - coalesce(col("n_recent"), lit(0L)))
    assert(bad.count() == 0)
  }

  test("a21/a22/a23: journey, hopping-window, and group-top-k invariants") {
    val ev = graft.sources.Tables.events(spark, sf).cache()
    // a21: every path has <=5 steps; the top path's count matches an
    // independent window-ranked recount
    val paths = run("a21_paths").cache()
    assert(paths.where(size(split(col("path"), ">")) > 5).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val indep = ev.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("rn"), col("event_type")))),
        e => e.getField("event_type")), ">").as("path"))
      .groupBy("path").count()
    val top = paths.orderBy(col("n_users").desc, col("path")).head()
    val chk = indep.where(col("path") === top.getAs[String]("path"))
      .head().getAs[Long]("count")
    assert(chk == top.getAs[Long]("n_users"))
    // a22: every event lands in exactly 5 sliding windows
    val hop = run("a22_hopping")
    assert(hop.agg(sum("n_events")).head().getLong(0) == 5 * ev.count())
    // a23: the plan uses WindowGroupLimit (per-task k-row heaps before
    // the exchange), and ranks are 1..3 per priority
    val topk = SparkEntry.queries("a23_topk_group")(spark, sf)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    val per = topk.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), min("rn").as("lo"), max("rn").as("hi"))
    assert(per.where(col("n") =!= 3 || col("lo") =!= 1 || col("hi") =!= 3)
      .count() == 0)
    paths.unpersist(); ev.unpersist()
  }

  test("x_chunk_text: chunks tile every document with the declared overlap") {
    val out = run("x_chunk_text").cache()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val per = out.groupBy("doc_id").agg(
      min("start_tok").as("s0"), max("end_tok").as("eN"),
      count(lit(1)).as("k"), max("chunk_id").as("kid"),
      max("n_tokens").as("maxlen"))
    val j = per.join(docs, "doc_id")
    // first chunk starts at 1, last ends at n, ids are 1..k, len <= 64
    assert(j.where(col("s0") =!= 1 || col("eN") =!= col("n") ||
      col("kid") =!= col("k") || col("maxlen") > 64).count() == 0)
    // consecutive chunks start exactly 48 apart (fixed stride)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("chunk_id")
    assert(out.withColumn("prev", lag("start_tok", 1).over(w))
      .where(col("prev").isNotNull && col("start_tok") - col("prev") =!= 48)
      .count() == 0)
    // boundary tokens really are the tokens at those offsets
    val docsT = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    assert(out.join(docsT, "doc_id")
      .where(element_at(col("toks"), col("start_tok").cast("int")) =!= col("first_tok") ||
        element_at(col("toks"), col("end_tok").cast("int")) =!= col("last_tok"))
      .count() == 0)
    out.unpersist()
  }

  test("a24/a25: RFM scores and gap-reset segments satisfy their definitions") {
    // a24: every score in 1..4; the max-monetary customer scores m=4;
    // per-customer metrics reconcile with a direct aggregate
    val rfm = run("a24_rfm").cache()
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(rfm.where(col(c) < 1 || col(c) > 4).count() == 0) }
    val top = rfm.orderBy(col("m_cents").desc).head()
    assert(top.getAs[Long]("m_score") == 4)
    val direct = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("f2"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("m2"))
    assert(rfm.join(direct, "o_custkey")
      .where(col("f_cnt") =!= col("f2") || col("m_cents") =!= col("m2"))
      .count() == 0)
    // a25: within a (user, segment) the running sum ends at the segment
    // total, and a new segment starts exactly at >1h gaps
    val rc = run("a25_reset_cumsum").cache()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val j = rc.join(ev, "event_id")
    val segTotal = j.groupBy("user_id", "seg_id")
      .agg(sum("cents").as("tot"), max("run_cents").as("mx"))
    assert(segTotal.where(col("tot") =!= col("mx")).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = j
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_seg", col("seg_id") =!= lag("seg_id", 1).over(w))
    assert(gaps.where(col("gap_us").isNotNull &&
      (col("new_seg") =!= (col("gap_us") > 3600000000L))).count() == 0)
    rfm.unpersist(); rc.unpersist()
  }

  test("w11_bollinger_outlier: flag and z-squared scale agree") {
    val out = run("w11_bollinger_outlier").cache()
    // warmup rows (n<20) never flag and carry the -1 sentinel
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("symbol").orderBy("datetime")
    val rn = out.withColumn("rn", row_number().over(w))
    assert(rn.where(col("rn") < 20 &&
      (col("outlier") =!= 0 || col("milli_z2") =!= -1)).count() == 0)
    // flag boundary is exactly z^2 > 9: milli_z2 floor >= 9000 iff flagged
    assert(out.where(col("outlier") === 1 && col("milli_z2") < 9000).count() == 0)
    assert(out.where(col("outlier") === 0 && col("milli_z2") > 9000).count() == 0)
    // some outliers exist at this sf (data sanity, not a tautology)
    assert(out.where(col("outlier") === 1).count() > 0)
    out.unpersist()
  }

  test("a26/x_profile: mode is the true argmax; profile matches direct stats") {
    val ev = graft.sources.Tables.events(spark, sf).cache()
    val mode = run("a26_mode").cache()
    assert(mode.count() == ev.select("user_id").distinct().count())
    // the reported count is the max per-user type count
    val mx = ev.groupBy("user_id", "event_type").count()
      .groupBy("user_id").agg(max("count").as("mx"))
    assert(mode.join(mx, "user_id").where(col("cnt") =!= col("mx")).count() == 0)
    // profile reconciles with direct aggregates
    val prof = run("x_profile").collect()
      .map(r => r.getAs[String]("col") -> r).toMap
    val li = graft.sources.Tables.lineitem(spark, sf).cache()
    assert(prof("l_returnflag").getAs[Long]("n") == li.count())
    assert(prof("l_returnflag").getAs[Long]("n_distinct") ==
      li.select("l_returnflag").distinct().count())
    assert(prof("l_quantity").getAs[String]("min_v").toLong ==
      li.agg(min(round(col("l_quantity"), 0).cast("long"))).head().getLong(0))
    li.unpersist(); mode.unpersist(); ev.unpersist()
  }

  test("x_histogram: buckets partition the column exactly") {
    val out = run("x_histogram").cache()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .cache()
    assert(out.agg(sum("n")).head().getLong(0) == li.count())
    assert(out.agg(sum("sum_cents")).head().getLong(0) ==
      li.agg(sum("cents")).head().getLong(0))
    assert(out.where(col("bucket") < 0 || col("bucket") > 15).count() == 0)
    // bucket occupancy ranges are disjoint and ordered
    val rows = out.orderBy("bucket").collect()
    rows.foreach(r => assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents")))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("max_cents") < b.getAs[Long]("min_cents")) }
    // global extrema land in the edge buckets
    val (lo, hi) = (li.agg(min("cents")).head().getLong(0),
      li.agg(max("cents")).head().getLong(0))
    assert(rows.head.getAs[Long]("min_cents") == lo)
    assert(rows.last.getAs[Long]("max_cents") == hi)
    li.unpersist(); out.unpersist()
  }
}
