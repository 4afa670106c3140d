package graft

import graft.core.Sessions
import graft.operators.graph.Triangles
import org.scalatest.funsuite.AnyFunSuite

/** Degree-oriented triangle counting: hand-graph pins, a brute-force
  * equivalence on a pseudo-random graph, input normalization, and
  * partition invariance.
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "triangles-test")

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
        r.getAs[Long]("lcc_nano")))).toMap

  test("K4: every node in 3 triangles, lcc exactly 1.0") {
    import spark.implicits._
    val pairs = (for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)).toDF("a", "b")
    val got = rows(Triangles.triangleCounts(pairs))
    assert(got.size == 4)
    got.values.foreach { case (d, t, l) =>
      assert(d == 3L && t == 3L && l == 1000000000L)
    }
  }

  test("star graph: zero triangles, zero lcc, skew-safe") {
    import spark.implicits._
    val pairs = (1L to 300L).map(i => (0L, i)).toDF("a", "b")
    val got = rows(Triangles.triangleCounts(pairs))
    assert(got(0L) == ((300L, 0L, 0L)))
    assert((1L to 300L).forall(got(_) == ((1L, 0L, 0L))))
  }

  test("triangle plus pendant: lcc is the truncating nano division") {
    import spark.implicits._
    // 0-1-2 triangle, plus 0-3 pendant: node 0 has d=3, T=1,
    // lcc = 2/(3·2) = 1/3 -> 333333333 nano (truncating)
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val got = rows(Triangles.triangleCounts(pairs))
    assert(got(0L) == ((3L, 1L, 333333333L)))
    assert(got(1L) == ((2L, 1L, 1000000000L)))
    assert(got(2L) == ((2L, 1L, 1000000000L)))
    assert(got(3L) == ((1L, 0L, 0L)))
  }

  test("normalization: loops, duplicates, reversed edges collapse") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (1L, 0L), (0L, 0L), (1L, 2L), (2L, 1L),
      (0L, 2L)).toDF("a", "b")
    val got = rows(Triangles.triangleCounts(pairs))
    assert(got.values.forall { case (d, t, _) => d == 2L && t == 1L })
  }

  test("matches brute force on a pseudo-random graph") {
    import spark.implicits._
    val n = 60L
    val raw = (0L until 400L)
      .map(i => ((i * 37 + 11) % n, (i * 53 + 29) % n))
    val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = und.toSet
    def has(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expect = nodes.map { v =>
      val nbrs = nodes.filter(u => u != v && has(u, v))
      val t = (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if has(nbrs(i), nbrs(j))
      } yield 1).size.toLong
      v -> ((nbrs.size.toLong, t))
    }.toMap
    val got = rows(Triangles.triangleCounts(raw.toDF("a", "b")))
    assert(got.size == expect.size)
    expect.foreach { case (v, (d, t)) =>
      assert(got(v)._1 == d && got(v)._2 == t, s"node $v")
    }
  }

  test("partition-count-invariant") {
    import spark.implicits._
    val pairs = (0L until 300L)
      .map(i => (i % 41, (i * 31 + 7) % 41)).toDF("a", "b")
    val a = rows(Triangles.triangleCounts(pairs.repartition(2)))
    val b = rows(Triangles.triangleCounts(pairs.repartition(16)))
    assert(a == b)
  }
}
