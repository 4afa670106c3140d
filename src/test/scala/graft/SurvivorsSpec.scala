package graft

import graft.core.Sessions
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality-aware near-dup survivor selection: highest quality wins the
  * cluster, singletons survive, ties break to the smaller id, exactly
  * one survivor per cluster, partition-invariant.
  */
class SurvivorsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "survivors-test")

  private val t1 = "the quick brown fox jumps over the lazy sleeping dog"
  private val t2 = "completely different words about spark shuffles and joins here"

  private def run(docs: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Boolean)] =
    Dedup.nearDupSurvivors(docs, col("text"), col("doc_id"),
      col("q"), 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("quality"),
          r.getAs[Boolean]("keep")))).toMap

  test("highest quality survives; keep-min would pick the wrong doc") {
    import spark.implicits._
    // docs 0,1,2 identical text; doc 1 has the best quality.
    // doc 9 is a singleton.
    val docs = Seq(
      (0L, t1, 10L), (1L, t1, 99L), (2L, t1, 50L), (9L, t2, 1L))
      .toDF("doc_id", "text", "q")
    val got = run(docs)
    assert(got(0L) == ((0L, 10L, false)))
    assert(got(1L) == ((0L, 99L, true))) // not doc 0, despite min id
    assert(got(2L) == ((0L, 50L, false)))
    assert(got(9L) == ((9L, 1L, true))) // singleton survives
  }

  test("quality ties break to the smaller id") {
    import spark.implicits._
    val docs = Seq((5L, t1, 7L), (3L, t1, 7L)).toDF("doc_id", "text", "q")
    val got = run(docs)
    assert(got(3L)._3 && !got(5L)._3)
  }

  test("exactly one survivor per cluster on the corpus") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .withColumn("q", col("n_chars"))
    val got = run(docs)
    val perCluster = got.values.groupBy(_._1)
      .view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1))
    assert(got.size == docs.count())
  }

  test("partition-count-invariant") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .withColumn("q", col("n_chars"))
    val a = run(docs.repartition(2))
    val b = run(docs.repartition(16))
    assert(a == b)
  }
}
