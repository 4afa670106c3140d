package graft

import graft.core.Sessions
import graft.functions.FixedLog
import graft.operators.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zipf fit: plain-Scala lnNanoRef replay of the whole least-squares
  * chain, tie ordering, degenerate guards, and partition invariance.
  */
class ZipfSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "zipf-test")

  /** Reference fit over (rank, count) pairs — the identical milli-log
    * + trunc-division arithmetic in plain Scala.
    */
  private def refFit(counts: Seq[Long]): (Long, Long, Long) = {
    val pts = counts.zipWithIndex.map { case (c, i) =>
      (FixedLog.lnNanoRef(i + 1L) / 1000000L,
        FixedLog.lnNanoRef(c) / 1000000L)
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx)
    val icept = (sy - slope * sx / 1000000L) / n
    (n, slope, icept)
  }

  private def corpus(tokCounts: Seq[(String, Int)]) = {
    import spark.implicits._
    // one doc holding every occurrence — counts are what matter
    Seq(tokCounts.flatMap { case (t, c) => Seq.fill(c)(t) }
      .mkString(" ")).toDF("text")
  }

  test("fit equals the plain-Scala lnNanoRef replay") {
    // counts 40, 20, 10, 5, 2 with distinct tokens
    val got = TextOps.zipfFit(
        corpus(Seq("a" -> 40, "b" -> 20, "c" -> 10, "d" -> 5, "e" -> 2)),
        col("text"), 64)
      .collect()(0)
    val (n, s, i) = refFit(Seq(40L, 20L, 10L, 5L, 2L))
    assert(got.getAs[Long]("n_terms") == n)
    assert(got.getAs[Long]("slope_micro") == s)
    assert(got.getAs[Long]("intercept_milli") == i)
    // a decaying vocabulary must fit a negative slope
    assert(s < 0)
  }

  test("count ties rank by token ascending") {
    // b and a tied at 3: rank order must be (a, b) — swapping rank
    // assignment would change nothing only if slope ignored order,
    // which it does not when a third point breaks symmetry
    val got = TextOps.zipfFit(
        corpus(Seq("b" -> 3, "a" -> 3, "z" -> 9)), col("text"), 64)
      .collect()(0)
    val (_, s, i) = refFit(Seq(9L, 3L, 3L)) // z, a, b by (cnt desc, tok)
    assert(got.getAs[Long]("slope_micro") == s)
    assert(got.getAs[Long]("intercept_milli") == i)
  }

  test("topN caps the fit window") {
    val full = Seq("a" -> 40, "b" -> 20, "c" -> 10, "d" -> 5)
    val got = TextOps.zipfFit(corpus(full), col("text"), 2).collect()(0)
    val (n, s, _) = refFit(Seq(40L, 20L))
    assert(got.getAs[Long]("n_terms") == n)
    assert(got.getAs[Long]("slope_micro") == s)
  }

  test("topN bounds enforced") {
    intercept[IllegalArgumentException] {
      TextOps.zipfFit(corpus(Seq("a" -> 1)), col("text"), 1)
    }
    intercept[IllegalArgumentException] {
      TextOps.zipfFit(corpus(Seq("a" -> 1)), col("text"), 129)
    }
  }

  test("partition invariance") {
    import spark.implicits._
    val docs = (0 until 60).map(i =>
        (0 to (i % 7)).map(j => s"t${(i * j) % 11}").mkString(" "))
      .toDF("text")
    val a = TextOps.zipfFit(docs, col("text"), 64).collect()(0)
    val b = TextOps.zipfFit(docs.repartition(7), col("text"), 64)
      .collect()(0)
    assert(a.toString == b.toString)
  }
}
