package graft

import graft.core.Sessions
import graft.operators.text.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Classifier-eval primitives: exact tie-aware ROC-AUC (Mann–Whitney
  * with midrank ties, all-integer) and the fixed-threshold PR curve.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "eval-test")

  private def auc(rows: Seq[(Long, Boolean)]) = {
    import spark.implicits._
    val r = Curation.rocAuc(rows.toDF("sc", "lab"), col("sc"), col("lab"))
      .collect()(0)
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("u2"),
      Option(r.getAs[java.lang.Long]("auc_ppm")).map(_.toLong))
  }

  test("perfect separation: auc = 1; reversed: auc = 0") {
    val pos = Seq((10L, true), (9L, true))
    val neg = Seq((1L, false), (2L, false))
    assert(auc(pos ++ neg) == ((2L, 2L, 8L, Some(1000000L))))
    val rev = Seq((1L, true), (2L, true), (9L, false), (10L, false))
    assert(auc(rev) == ((2L, 2L, 0L, Some(0L))))
  }

  test("all scores tied: auc exactly 1/2") {
    val rows = Seq((5L, true), (5L, true), (5L, false), (5L, false))
    // 2U = sum np*(2*below+nn) = 2*(0+2) = 4; 2*n+*n- = 8
    assert(auc(rows) == ((2L, 2L, 4L, Some(500000L))))
  }

  test("hand case with a tie: U = 2.5 over 4 pairs -> 625000") {
    // pos {3, 1}, neg {2, 1}: wins 2, tie 0.5 -> 2U = 5
    val rows = Seq((3L, true), (1L, true), (2L, false), (1L, false))
    assert(auc(rows) == ((2L, 2L, 5L, Some(625000L))))
  }

  test("empty class: null auc_ppm") {
    assert(auc(Seq((1L, true), (2L, true))) == ((2L, 0L, 0L, None)))
  }

  test("partition invariance") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => ((i * 37) % 23, i % 3 == 0))
      .toDF("sc", "lab")
    val a = Curation.rocAuc(rows, col("sc"), col("lab")).collect()(0)
    val b = Curation.rocAuc(rows.repartition(7), col("sc"), col("lab"))
      .collect()(0)
    assert(a.toString == b.toString)
  }

  test("ppm scaling survives the long-wrap regime (u2 * 1e6 > Long.Max)") {
    // 8M rows, 4M per class: id % 1000 as score, parity as label.
    // id = 1000k + e keeps id parity == e parity, so every even residue
    // is all-positive (np = 8000) and every odd residue all-negative.
    // 2U = 8000·8000·Σ_{e even} e = 1.5968e13, and 2U·1e6 ≈ 1.6e19
    // overflows a long — the regime the pre-decimal code silently
    // wrapped in. Exact expectation: floor(1.5968e13·1e6 / 3.2e13)
    // = 499000 ppm.
    val rows = spark.range(8000000L)
      .select((col("id") % 1000).as("sc"), (col("id") % 2 === 0).as("lab"))
    val r = Curation.rocAuc(rows, col("sc"), col("lab")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 4000000L)
    assert(r.getAs[Long]("n_neg") == 4000000L)
    assert(r.getAs[Long]("u2") == 15968000000000L)
    assert(r.getAs[Long]("auc_ppm") == 499000L)
  }

  test("DFS pr_curve rejects fractional thresholds instead of truncating") {
    val e = intercept[graft.dfs.Ir.DfsError] {
      graft.dfs.DfsEngine.runSingle(
        """|parquet_read(.table('documents'))
          #|pr_curve(
          #  .score(lambda: "n_chars")
          #  .label(lambda: mod("doc_id", 3) == 0)
          #  .thresholds(0.5))
          #""".stripMargin('#'), spark, "/root/testdata/sf0.001")
    }
    assert(e.getMessage.contains("must be integers"))
  }

  test("pr curve: hand counts and both null-denominator branches") {
    import spark.implicits._
    val rows = Seq((10L, true), (8L, true), (6L, false), (2L, false))
      .toDF("sc", "lab")
    val got = Curation.prCurve(rows, col("sc"), col("lab"),
        Seq(0L, 7L, 100L))
      .collect().map(r => r.getAs[Long]("thr") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          Option(r.getAs[java.lang.Long]("prec_ppm")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("rec_ppm")).map(_.toLong))))
      .toMap
    // thr=0: everything predicted positive
    assert(got(0L) == ((2L, 2L, 0L, Some(500000L), Some(1000000L))))
    // thr=7: both positives above, no negatives
    assert(got(7L) == ((2L, 0L, 0L, Some(1000000L), Some(1000000L))))
    // thr=100: no predictions -> precision null, recall 0
    assert(got(100L) == ((0L, 0L, 2L, None, Some(0L))))
  }

  test("ngramOverlapF1: clipped counts, zero-gram sides, disjoint " +
      "pairs — hand-computed milli values") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c", "a b a d"), // clip: 'a b' counts min(2,1)=1
      (2L, "x", "a b"),             // cand has 0 bigrams
      (3L, "p q", "r s")            // disjoint: overlap 0, rates 0
    ).toDF("pid", "cand", "ref")
    val got = Curation.ngramOverlapF1(df, col("pid"), col("cand"),
        col("ref"), 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(1L) == ((2L, 4L, 3L, 500L, 666L, 571L)))
    assert(got(2L) == ((0L, 0L, 1L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 1L, 1L, 0L, 0L, 0L)))
  }
}
