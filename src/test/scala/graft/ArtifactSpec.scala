package graft

import graft.ops.CoPurchase
import graft.sources.{Layout, Tables}
import org.apache.spark.sql.functions._

/** Build-once persisted graph artifacts (CoPurchase + the Dedup pair
  * graph): content equals the direct derivation, the catalog hit makes
  * repeat calls metadata-only, the cross-JVM re-register path rebuilds a
  * working bucketed table from bare files, and the bucket layout
  * actually deletes the exchange on bucket-key aggregation.
  */
class ArtifactSpec extends SparkTestBase {

  test("pairs artifact content == direct Σ|basket|² derivation") {
    val direct = {
      val basket = Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      basket.as("a")
        .join(basket.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("supp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val artifact = CoPurchase.pairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(artifact === direct)
    assert(direct.nonEmpty, "vacuous gate: no co-purchase pairs at test SF")
  }

  test("symEdges is the exact symmetric closure of pairs") {
    val p = CoPurchase.pairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sym = CoPurchase.symEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sym === (p ++ p.map(_.swap)))
  }

  test("bucket-key aggregation over the artifact plans with zero exchange") {
    val deg = CoPurchase.symEdges(spark, sf)
      .groupBy("u").agg(count(lit(1)).as("d"))
    val plan = deg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"degree aggregation on the bucket key still shuffles:\n$plan")
  }

  test("second call is a catalog hit (plan scans the artifact table, not lineitem)") {
    val plan = CoPurchase.pairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cop_pairs_"),
      s"expected a bucketed table scan:\n$plan")
    assert(!plan.toLowerCase.contains("lineitem"),
      s"artifact read still references the source table:\n$plan")
  }

  test("re-register path: bare files from a 'prior JVM' come back bucketed") {
    // simulate a fresh session over existing artifact files by dropping
    // only the catalog entry (files survive: external table semantics)
    val fp = Layout.sourceFingerprint(spark, s"$sf/lineitem.parquet")
    val tbl = s"graft_cop_sym_${fp}_u_b${graft.ops.CoPurchase.buckets(spark, sf)}"
    val before = CoPurchase.symEdges(spark, sf).count()
    spark.sql(s"DROP TABLE $tbl")
    assert(!spark.catalog.tableExists(tbl))
    val again = CoPurchase.symEdges(spark, sf)
    assert(again.count() === before)
    val plan = again.groupBy("u").agg(count(lit(1))).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"re-registered table lost its bucket spec:\n$plan")
  }

  test("fingerprint: same source stable, different source differs") {
    val a = Layout.sourceFingerprint(spark, s"$sf/lineitem.parquet")
    val b = Layout.sourceFingerprint(spark, s"$sf/lineitem.parquet")
    val c = Layout.sourceFingerprint(spark, s"$sf/orders.parquet")
    assert(a === b)
    assert(a !== c)
  }
}
