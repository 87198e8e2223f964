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
}
