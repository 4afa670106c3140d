package graft

import graft.core.Sessions
import graft.operators.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Same-source common-prefix boilerplate strip: exact banner removal,
  * singleton protection, ragged-length limiting, the all-dup
  * degenerate, and partition invariance.
  */
class PrefixStripSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "prefixstrip-test")

  private def run(docs: org.apache.spark.sql.DataFrame, minDocs: Int = 2,
      maxPrefix: Int = 64): Map[Long, (Int, Int, String)] =
    TextOps.commonPrefixStrip(docs, col("text"), col("doc_id"),
      col("source"), minDocs, maxPrefix)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("prefix_len"), r.getAs[Int]("n_tok"),
          r.getAs[String]("text_strip")))).toMap

  test("shared banner strips exactly; body survives verbatim") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s1", "home about contact unique words for document zero"),
      (1L, "s1", "home about contact totally different body one"),
      (2L, "s1", "home about contact yet another body two"))
      .toDF("doc_id", "source", "text")
    val got = run(docs)
    assert(got(0L) == ((3, 8, "unique words for document zero")))
    assert(got(1L) == ((3, 7, "totally different body one")))
    assert(got(2L) == ((3, 7, "yet another body two")))
  }

  test("singleton sources are never stripped") {
    import spark.implicits._
    val docs = Seq((0L, "solo", "every word here would be its own prefix"))
      .toDF("doc_id", "source", "text")
    val got = run(docs)
    assert(got(0L)._1 == 0 &&
      got(0L)._3 == "every word here would be its own prefix")
  }

  test("a short doc limits the prefix to its own length") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s1", "home about"),
      (1L, "s1", "home about contact body text here"))
      .toDF("doc_id", "source", "text")
    val got = run(docs)
    // position 3 is absent from doc 0, so the vote stops at 2
    assert(got(0L) == ((2, 2, "")))
    assert(got(1L)._1 == 2 && got(1L)._3 == "contact body text here")
  }

  test("exact-dup source strips to empty (documented degenerate)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s1", "same text twice"),
      (1L, "s1", "same text twice")).toDF("doc_id", "source", "text")
    val got = run(docs)
    assert(got.values.forall(v => v._1 == 3 && v._3 == ""))
  }

  test("maxPrefix caps the probe region") {
    import spark.implicits._
    val docs = Seq(
      (0L, "s1", "a b c d e f tail0"),
      (1L, "s1", "a b c d e f tail1")).toDF("doc_id", "source", "text")
    val got = run(docs, maxPrefix = 4)
    assert(got.values.forall(_._1 == 4))
    assert(got(0L)._3 == "e f tail0")
  }

  test("partition-count-invariant on the bannered corpus") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .withColumn("text", concat(lit("nav menu "), col("source"),
        lit(" "), col("text")))
    val a = run(docs.repartition(2))
    val b = run(docs.repartition(16))
    assert(a == b && a.values.forall(_._1 == 3))
  }
}
