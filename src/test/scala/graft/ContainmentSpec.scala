package graft

import graft.core.Sessions
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Containment near-dup pairs: the asymmetric quote/wrapper case that
  * Jaccard under-scores, exact ppm arithmetic, threshold gating, and
  * partition invariance.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "containment-test")

  private val core = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu"

  private def run(docs: org.apache.spark.sql.DataFrame, thr: Long,
      bands: Int = 4, rowsPerBand: Int = 2)
      : Seq[(Long, Long, Long, Long)] =
    Dedup.containmentPairs(docs, col("text"), col("doc_id"), thr,
      bands, rowsPerBand)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("cont_ab_ppm"), r.getAs[Long]("cont_ba_ppm")))
      .toSeq.sortBy(t => (t._1, t._2))

  test("verbatim quote scores containment 1.0 where Jaccard cannot") {
    import spark.implicits._
    // doc 0 appears verbatim inside doc 1 (plus a suffix): every
    // shingle of 0 is a shingle of 1 -> cont(0->1) = 1e6 exactly,
    // while Jaccard = |A|/|B| < 1 — a 0.9 Jaccard gate would drop it
    val docs = Seq(
      (0L, core),
      (1L, core + " extra trailing words here"),
      (2L, "an entirely different document about other things entirely"))
      .toDF("doc_id", "text")
    // size skew pushes Jaccard to ~0.7 — below the 4x2 banding floor
    // (deterministically missed); 8x1 banding is the documented knob
    val got = run(docs, 900000L, bands = 8, rowsPerBand = 1)
    assert(got.map(t => (t._1, t._2)) == Seq((0L, 1L)))
    assert(got.head._3 == 1000000L) // A fully contained in B
    assert(got.head._4 < 1000000L)  // but B not in A — asymmetric
  }

  test("identical docs score 1.0 both ways") {
    import spark.implicits._
    val docs = Seq((0L, core), (1L, core)).toDF("doc_id", "text")
    val got = run(docs, 1000000L)
    assert(got == Seq((0L, 1L, 1000000L, 1000000L)))
  }

  test("threshold gates on the BEST direction") {
    import spark.implicits._
    val docs = Seq(
      (0L, core),
      (1L, core + " extra trailing words here")).toDF("doc_id", "text")
    // cont(0->1) = 1e6 passes a 0.95 gate even though cont(1->0) < 1
    assert(run(docs, 950000L, bands = 8, rowsPerBand = 1).nonEmpty)
    // an impossible gate (> 1e6 is rejected by require) — use exact 1e6
    // with a pair that is NOT fully contained either way
    val partial = Seq(
      (0L, core + " unique tail zero"),
      (1L, core + " unique tail one")).toDF("doc_id", "text")
    assert(run(partial, 1000000L, bands = 8, rowsPerBand = 1).isEmpty)
  }

  test("partition-count-invariant on the corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = run(docs.repartition(2), 500000L)
    val b = run(docs.repartition(16), 500000L)
    assert(a == b)
  }
}
