package graft

import graft.core.Sessions
import graft.operators.vector.VectorCuration
import org.scalatest.funsuite.AnyFunSuite

/** Greedy k-center (Gonzalez farthest-point) selection: hand-traced
  * traversal, tie rules (argmax to lower id, assignment to the
  * earlier-selected center), k=1, the duplicate-vector degenerate, and
  * partition invariance.
  */
class KcenterSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "kcenter-test")

  private def asg(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Int, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Int]("center_rank"), r.getAs[Long]("center_id"),
        r.getAs[Long]("d_micro")))).toMap

  test("hand-traced traversal on a 1-D line") {
    import spark.implicits._
    // points 0, 1, 10, 4 on a line (ids 0..3): c0 = id0 (min id),
    // farthest from {0} is id2 (d=100), then min-dists are
    // id1: min(1, 81)=1, id3: min(16, 36)=16 -> c2 = id3
    val df = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(10f, 0f)), (3L, Seq(4f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = VectorCuration.kcenterTrain(df, "vec_id", "embedding", 3)
    assert(cents.map(_._1) == Seq(0L, 2L, 3L))
    val got = asg(VectorCuration.kcenterAssign(
      df, "vec_id", "embedding", cents))
    assert(got(0L) == ((0, 0L, 0L)))
    assert(got(1L) == ((0, 0L, 1000000L))) // d=1 to c0
    assert(got(2L) == ((1, 2L, 0L)))
    assert(got(3L) == ((2, 3L, 0L)))
  }

  test("empty input fails loudly, not with an index error") {
    import spark.implicits._
    val df = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorCuration.kcenterTrain(df, "vec_id", "embedding", 2)
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("argmax tie goes to the lower id") {
    import spark.implicits._
    // ids 0 (origin), 1 and 2 both at distance 2: pick id1
    val df = Seq(
      (0L, Seq(0f)), (1L, Seq(2f)), (2L, Seq(-2f))
    ).toDF("vec_id", "embedding")
    val cents = VectorCuration.kcenterTrain(df, "vec_id", "embedding", 2)
    assert(cents.map(_._1) == Seq(0L, 1L))
  }

  test("assignment tie goes to the earlier-selected center") {
    import spark.implicits._
    // centers land on ids 0 ([0]) and 1 ([2]); id2 at [1] is d=1 to
    // both -> earlier-selected rank 0
    val df = Seq(
      (0L, Seq(0f)), (1L, Seq(2f)), (2L, Seq(1f))
    ).toDF("vec_id", "embedding")
    val cents = VectorCuration.kcenterTrain(df, "vec_id", "embedding", 2)
    assert(cents.map(_._1) == Seq(0L, 1L))
    val got = asg(VectorCuration.kcenterAssign(
      df, "vec_id", "embedding", cents))
    assert(got(2L) == ((0, 0L, 1000000L)))
  }

  test("k=1: everything assigned to the min-id row") {
    import spark.implicits._
    val df = Seq(
      (5L, Seq(1f, 1f)), (7L, Seq(3f, 1f)), (9L, Seq(0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = asg(VectorCuration.kcenter(df, "vec_id", "embedding", 1))
    assert(got.values.forall { case (r, c, _) => r == 0 && c == 5L })
    assert(got(7L)._3 == 4000000L) // (3-1)^2 = 4
  }

  test("duplicate-vector degenerate: re-selects, never crashes") {
    import spark.implicits._
    // only two distinct vectors, k=3: third pick has all-zero residual
    // distances and re-selects the min-id row (documented rule)
    val df = Seq(
      (0L, Seq(0f)), (1L, Seq(0f)), (2L, Seq(5f))
    ).toDF("vec_id", "embedding")
    val cents = VectorCuration.kcenterTrain(df, "vec_id", "embedding", 3)
    assert(cents.map(_._1) == Seq(0L, 2L, 0L))
    val got = asg(VectorCuration.kcenterAssign(
      df, "vec_id", "embedding", cents))
    // ties to the earlier-selected center: rank 0, never the rank-2 dup
    assert(got(0L) == ((0, 0L, 0L)) && got(1L) == ((0, 0L, 0L)))
  }

  test("partition invariance") {
    import spark.implicits._
    val df = (0L until 40L)
      .map(i => (i, Seq(((i * 37 + 11) % 23).toFloat,
        ((i * 13 + 5) % 17).toFloat)))
      .toDF("vec_id", "embedding")
    val a = VectorCuration.kcenter(df, "vec_id", "embedding", 4)
      .collect().map(_.toString).sorted.toSeq
    val b = VectorCuration.kcenter(df.repartition(7), "vec_id",
      "embedding", 4).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
