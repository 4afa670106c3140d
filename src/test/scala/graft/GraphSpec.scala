package graft

import graft.core.Sessions
import graft.operators.graph.GraphOps
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: the O(log n)-round,
  * skew-proof CC — pinned equal to min-label propagation where both
  * converge, and convergent where label propagation's O(diameter)
  * round count is the failure mode (long chains).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "graph-test")

  private def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("component")).toMap

  test("ccStars: hand graph — two components, min-rooted") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("ccStars: long chain converges where label propagation's " +
      "O(diameter) budget would not") {
    import spark.implicits._
    // a 120-edge path: diameter 120 — min-label propagation needs ~120
    // rounds; the star rounds contract it in O(log n)
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got.size == 121 && got.values.forall(_ == 0L))
  }

  test("ccStars: star graph (max skew) — single component at the hub") {
    import spark.implicits._
    val pairs = (1L to 500L).map(i => (0L, i)).toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got.size == 501 && got.values.forall(_ == 0L))
  }

  test("ccStars: equals min-label propagation on near-dup pairs") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.nearDupPairs(docs, col("text"), col("doc_id"), 0.3)
      .select(col("a"), col("b")).localCheckpoint()
    val viaStars = comps(GraphOps.connectedComponentsStars(pairs))
    val viaProp = comps(Dedup.connectedComponents(pairs))
    assert(viaStars == viaProp)
  }

  test("ccStars: partition-count-invariant") {
    import spark.implicits._
    val pairs = (0L until 200L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("a", "b")
    val a = comps(GraphOps.connectedComponentsStars(pairs.repartition(2)))
    val b = comps(GraphOps.connectedComponentsStars(pairs.repartition(16)))
    assert(a == b)
  }
}
