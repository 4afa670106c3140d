package graft

import graft.core.Sessions
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash block-blocking pairs: the 4-block pigeonhole recall
  * guarantee proved against brute force, identical-doc zero distance,
  * the radius gate, and partition invariance.
  */
class SimhashPairsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "simhashpairs-test")

  private def run(docs: org.apache.spark.sql.DataFrame, h: Int)
      : Set[(Long, Long, Int)] =
    Dedup.simhashDupPairs(docs, col("text"), col("doc_id"), h)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("hamming"))).toSet

  test("identical docs pair at hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "utterly disjoint vocabulary set here")).toDF("doc_id", "text")
    val got = run(docs, 0)
    assert(got.contains((0L, 1L, 0)))
    assert(got.forall(_._3 == 0))
  }

  test("recall equals brute force at radius <= 3 (the pigeonhole " +
      "guarantee) on the corpus") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val fps = Dedup.withSimhash32(docs, col("text"), "fp")
      .select("doc_id", "fp").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if h <= 3
    } yield (a, b, h)).toSet
    assert(run(docs, 3) == brute && brute.nonEmpty)
  }

  test("the radius gate is monotone") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val h0 = run(docs, 0); val h3 = run(docs, 3)
    assert(h0.subsetOf(h3))
    assert(h3.forall(_._3 <= 3) && h0.forall(_._3 == 0))
  }

  test("partition-count-invariant") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
    assert(run(docs.repartition(2), 2) == run(docs.repartition(16), 2))
  }
}
