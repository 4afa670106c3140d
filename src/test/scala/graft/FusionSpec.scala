package graft

import graft.core.Sessions
import graft.operators.vector.Fusion
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion: hand-computed nano pins, missing-from-one-
  * list behavior, tie-break determinism, and partition invariance.
  */
class FusionSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "fusion-test")

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("id"),
      r.getAs[Long]("rrf_nano"), r.getAs[Long]("n_lists"),
      r.getAs[Int]("rnk"))).toSeq
      .sortBy(t => (t._1, t._5))

  private def n(r: Long, c: Int = 60) = Fusion.Nano / (c + r)

  test("hand lists: exact nano sums, both-lists beats single-list") {
    import spark.implicits._
    // q 0: list A ranks (7,8,9), list B ranks (8,9,5) — 8 and 9 appear
    // in both, 8 with the better combined ranks
    val a = Seq((0L, 7L, 1L), (0L, 8L, 2L), (0L, 9L, 3L))
      .toDF("q_id", "id", "rnk")
    val b = Seq((0L, 8L, 1L), (0L, 9L, 2L), (0L, 5L, 3L))
      .toDF("q_id", "id", "rnk")
    val got = rows(Fusion.rrfFuse(Seq(a, b), 60, 10))
    val expect = Seq(
      (0L, 8L, n(2) + n(1), 2L, 1),
      (0L, 9L, n(3) + n(2), 2L, 2),
      (0L, 7L, n(1), 1L, 3),
      (0L, 5L, n(3), 1L, 4))
    assert(got == expect)
  }

  test("k-cut and per-query independence") {
    import spark.implicits._
    val a = (1L to 8L).map(i => (0L, i, i)).toDF("q_id", "id", "rnk")
    val b = (1L to 8L).map(i => (1L, 100 + i, i)).toDF("q_id", "id", "rnk")
    val got = rows(Fusion.rrfFuse(Seq(a, b), 60, 3))
    assert(got.count(_._1 == 0L) == 3 && got.count(_._1 == 1L) == 3)
    assert(got.filter(_._1 == 0L).map(_._2) == Seq(1L, 2L, 3L))
  }

  test("equal scores break by id ascending") {
    import spark.implicits._
    // two ids with identical single-list rank 1 from different lists
    val a = Seq((0L, 9L, 1L)).toDF("q_id", "id", "rnk")
    val b = Seq((0L, 3L, 1L)).toDF("q_id", "id", "rnk")
    val got = rows(Fusion.rrfFuse(Seq(a, b), 60, 10))
    assert(got.map(_._2) == Seq(3L, 9L) &&
      got.forall(_._3 == n(1)))
  }

  test("partition-count-invariant") {
    import spark.implicits._
    val a = (0L until 200L).map(i => (i % 5, i, i % 17 + 1))
      .toDF("q_id", "id", "rnk")
    val b = (0L until 200L).map(i => (i % 5, (i * 7) % 200, i % 13 + 1))
      .toDF("q_id", "id", "rnk")
    val x = rows(Fusion.rrfFuse(Seq(a.repartition(2), b.repartition(3)),
      60, 5))
    val y = rows(Fusion.rrfFuse(Seq(a.repartition(16), b.repartition(8)),
      60, 5))
    assert(x == y && x.nonEmpty)
  }
}
