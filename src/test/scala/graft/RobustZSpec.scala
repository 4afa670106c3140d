package graft

import graft.core.Sessions
import graft.operators.text.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Robust (median/MAD) per-group outlier flag: gross-outlier
  * detection, the MAD-0 degenerate, heavy-tail immunity vs the mean,
  * and partition invariance.
  */
class RobustZSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "robustz-test")

  private def run(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Option[Long], Boolean)] =
    Sketches.robustZOutliers(df, col("v"), col("doc_id"),
      Seq("g" -> col("g")))
      .collect().map { r =>
        val az = if (r.isNullAt(r.fieldIndex("absz_micro"))) None
          else Some(r.getAs[Long]("absz_micro"))
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("mad_micro"), az,
            r.getAs[Boolean]("outlier")))
      }.toMap

  test("gross outlier flags; bulk does not") {
    import spark.implicits._
    // 21 docs near 100 (spread so MAD > 0), one at 100000
    val rows = (0L until 21L).map(i => (i, "a", 95.0 + i)) :+
      ((99L, "a", 100000.0))
    val got = run(rows.toDF("doc_id", "g", "v"))
    assert(got(99L)._3, "gross outlier must flag")
    assert((0L until 21L).forall(!got(_)._3), "bulk must not flag")
  }

  test("MAD = 0 degenerate: zero devs, any deviation flags, absz null") {
    import spark.implicits._
    // all-zero values quantize to bucket (0, 0) whose estimate is
    // EXACTLY 0 (no interpolation in a zero-width bucket), so devs are
    // 0, MAD is 0, and the one nonzero doc hits the degenerate clause
    val rows = (0L until 10L).map(i => (i, "a", 0.0)) :+
      ((99L, "a", 51.0))
    val got = run(rows.toDF("doc_id", "g", "v"))
    assert(got.values.forall(_._1 == 0L)) // MAD exactly 0
    assert(got(99L)._3 && got(99L)._2.isEmpty)
    assert((0L until 10L).forall(i => !got(i)._3 && got(i)._2.isEmpty))
  }

  test("identical values flag nobody (dev == MAD ballpark, |z| ~ 0.67)") {
    import spark.implicits._
    // bucket interpolation makes est != value, so every doc carries
    // the SAME nonzero dev; the MAD sketch re-buckets that dev, so
    // |z| lands near (not exactly) 0.674489 — and far under 3.5
    val rows = (0L until 10L).map(i => (i, "a", 50.0))
    val got = run(rows.toDF("doc_id", "g", "v"))
    val zs = got.values.map(_._2.get).toSet
    assert(zs.size == 1, "identical docs must share one |z|")
    assert(zs.head < 1000000L && got.values.forall(!_._3))
  }

  test("heavy tail does not drag the center (vs mean z)") {
    import spark.implicits._
    // one value 10000x the bulk inflates a mean/std z enough to mask
    // smaller outliers; the median/MAD center ignores it entirely
    val rows = (0L until 50L).map(i => (i, "a", 100.0 + (i % 7))) :+
      ((99L, "a", 1000000.0))
    val got = run(rows.toDF("doc_id", "g", "v"))
    assert(got(99L)._3)
    assert((0L until 50L).forall(!got(_)._3))
  }

  test("input past the 2^43-micro bound fails loudly, not silently") {
    import spark.implicits._
    val rows = Seq((0L, "a", 1e9), (1L, "a", 2e9))
    val ex = intercept[Exception] {
      run(rows.toDF("doc_id", "g", "v"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("robustZOutliers")))
  }

  test("groups are independent") {
    import spark.implicits._
    val rows = (0L until 12L).map(i => (i, "a", 90.0 + i)) ++
      (100L until 112L).map(i => (i, "b", 9000.0 + 10 * i))
    val got = run(rows.toDF("doc_id", "g", "v"))
    assert(got.values.forall(!_._3)) // each group is its own center
  }

  test("partition-count-invariant on the corpus") {
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang").as("g"),
        col("n_chars").as("v"))
    val a = run(docs.repartition(2))
    val b = run(docs.repartition(16))
    assert(a == b && a.nonEmpty)
  }
}
