package graft

import graft.core.Sessions
import graft.functions.FixedLog
import graft.operators.text.{Curation, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tf-idf keywords and the split-leakage report: hand-computed nano
  * pins, stopword suppression, the k-cut, leakage composition
  * correctness, and partition invariance.
  */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "tfidf-test")

  private def tfidf(docs: org.apache.spark.sql.DataFrame, k: Int = 5)
      : Seq[(Long, String, Long, Long, Int)] =
    TextOps.tfidfTopTerms(docs, col("text"), col("doc_id"), k)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("score_nano"), r.getAs[Int]("rank")))
      .toSeq.sortBy(t => (t._1, t._5))

  test("hand corpus: scores equal the lnNanoRef decomposition and " +
      "a universal stopword scores zero") {
    import spark.implicits._
    // 'the' is in all 3 docs -> idf = ln(3/3) = 0 exactly;
    // 'rare' is in 1 -> idf = ln(3) - ln(1)
    val docs = Seq(
      (0L, "the rare rare word"),
      (1L, "the common word"),
      (2L, "the common thing")).toDF("doc_id", "text")
    val got = tfidf(docs, 10)
    def ln(m: Long) = FixedLog.lnNanoRef(m)
    val d0 = got.filter(_._1 == 0L)
    assert(d0.head._2 == "rare" &&
      d0.head._4 == 2 * (ln(3) - ln(1)) && d0.head._3 == 2L)
    // 'the' scores exactly 0 in every doc (still listed, ranked last)
    assert(got.filter(_._2 == "the").forall(_._4 == 0L))
    // 'word' in 2 of 3 docs
    assert(got.find(t => t._1 == 1L && t._2 == "word").get._4 ==
      ln(3) - ln(2))
  }

  test("k-cut and deterministic tie-break by term") {
    import spark.implicits._
    val docs = Seq(
      (0L, "zz aa bb cc"),
      (1L, "other words entirely")).toDF("doc_id", "text")
    val got = tfidf(docs, 2).filter(_._1 == 0L)
    // all four terms tie on tf=1, df=1 -> rank by term ascending
    assert(got.map(_._2) == Seq("aa", "bb"))
  }

  test("splitLeakPairs: cross-split near-dups surface, within-split " +
      "pairs do not") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy sleeping dog"
    // find ids that land in different splits under the real hash
    val probe = Curation.splitAssign(
      (0L until 40L).toDF("doc_id"), col("doc_id"),
      Seq(("train", 0.5), ("test", 0.5)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    val tr = probe.collect { case (i, "train") => i }.toSeq.sorted
    val te = probe.collect { case (i, "test") => i }.toSeq.sorted
    assert(tr.size >= 2 && te.size >= 2)
    // dup pair across splits, dup pair within train, and a unique doc
    val docs = Seq(
      (tr(0), t1), (te(0), t1), // leaks
      (tr(1), "totally different words about spark joins here okay"),
      (te(1), "yet another unique document body with fresh words"))
      .toDF("doc_id", "text")
    val got = Curation.splitLeakPairs(docs, col("text"), col("doc_id"),
      Seq(("train", 0.5), ("test", 0.5)), 0.3)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[String]("split_a"), r.getAs[String]("split_b")))
    assert(got.length == 1)
    val p = got.head
    assert(Set(p._1, p._2) == Set(tr(0), te(0)) && p._3 != p._4)
    // the same dup pair WITHIN one split does not surface
    val within = Seq((tr(0), t1), (tr(1), t1)).toDF("doc_id", "text")
    assert(Curation.splitLeakPairs(within, col("text"), col("doc_id"),
      Seq(("train", 0.5), ("test", 0.5)), 0.3).isEmpty)
  }

  test("partition-count-invariant") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val a = tfidf(docs.repartition(2), 3)
    val b = tfidf(docs.repartition(16), 3)
    assert(a == b && a.nonEmpty)
  }
}
