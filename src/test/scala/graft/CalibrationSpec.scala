package graft

import graft.core.Sessions
import graft.operators.text.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Platt calibration + reliability/ECE: learnability on a separable
  * fixture, monotonicity in the score, determinism, and the all-integer
  * bucket arithmetic.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "calib-test")

  private def platt(rows: Seq[(Long, Long, Boolean)], iters: Int = 15) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "s", "y")
    Curation.plattCalibrate(df, df, col("s"), col("y"), col("doc_id"),
        iters)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("p_milli"), r.getAs[Boolean]("pred")))).toMap
  }

  test("plattCalibrate: driver-histogram fast path == per-step " +
      "aggregate scale path (bit-equal p_milli)") {
    import spark.implicits._
    val rows = (0L until 80L).map(i => (i, 20L + i, i >= 40L))
    val df = rows.toDF("doc_id", "s", "y")
    def run(localHistRows: Long) =
      Curation.plattCalibrate(df, df, col("s"), col("y"), col("doc_id"),
          15, localHistRows = localHistRows)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("p_milli"), r.getAs[Boolean]("pred")))).toMap
    // localHistRows = 0 forces the per-step aggregate loop
    assert(run(1L << 20) == run(0L))
  }

  test("separable scores calibrate: high-score rows end above 1/2, " +
      "low below, monotone in s") {
    // positives at s >= 60, negatives below — clearly learnable
    val rows = (0L until 80L).map(i => (i, 20L + i, i >= 40L))
    val got = platt(rows)
    assert(got(79L)._1 > 500L && got(79L)._2)
    assert(got(0L)._1 < 500L && !got(0L)._2)
    // calibrated probability is monotone in the score (a >= 0)
    val ps = (0L until 80L).map(got(_)._1)
    assert(ps.zip(ps.tail).forall { case (x, y) => x <= y })
  }

  test("all-positive labels push every probability up") {
    val rows = (0L until 40L).map(i => (i, (i % 7) + 10L, true))
    val got = platt(rows)
    assert(got.values.forall(_._1 > 500L))
  }

  test("zero iterations of movement: symmetric labels stay near 1/2") {
    // equal positives and negatives at EVERY score: gradient of b is
    // zero only at p = 500; the fit stays at the uninformative prior
    val rows = (0L until 40L).flatMap(i =>
      Seq((i * 2, (i % 5) + 10L, true), (i * 2 + 1, (i % 5) + 10L, false)))
    val got = platt(rows)
    assert(got.values.forall { case (p, _) => p >= 450L && p <= 550L })
  }

  test("training is deterministic and partition-invariant") {
    import spark.implicits._
    val rows = (0L until 60L).map(i =>
      (i, 10L + (i * 13) % 50, (i * 7) % 10 < 4))
    val df = rows.toDF("doc_id", "s", "y")
    val a = Curation.plattCalibrate(df, df, col("s"), col("y"),
      col("doc_id")).collect().map(_.toString).sorted.toSeq
    val b = Curation.plattCalibrate(df.repartition(7), df, col("s"),
      col("y"), col("doc_id")).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("calibration buckets: hand-computed integer arithmetic + ECE") {
    import spark.implicits._
    // bucket 0 (p in [0, 100]): two rows p=50, one positive ->
    //   conf = 50, acc = 333, gap = 283
    // bucket 9 (p >= 901): one row p=1000, positive ->
    //   conf = 1000, acc = 1000, gap = 0
    val df = Seq((50L, true), (50L, false), (50L, false), (1000L, true))
      .toDF("p", "y")
    val got = Curation.calibrationBuckets(df, col("p"), col("y"), 10)
      .collect().map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("conf_milli"),
          r.getAs[Long]("acc_milli"), r.getAs[Long]("gap_milli"),
          r.getAs[Long]("ece_milli")))).toMap
    assert(got(0L.toInt) == ((3L, 50L, 333L, 283L, 212L)))
    assert(got(9) == ((1L, 1000L, 1000L, 0L, 212L)))
    // ece = (3*283 + 1*0) div 4 = 212 on every row
  }

  test("out-of-range probabilities clamp to the edge buckets") {
    import spark.implicits._
    // a caller bug feeding p = -50 or p = 2000 must land in bucket 0 /
    // bucket 9, not mint a phantom negative-index bucket row
    val df = Seq((-50L, false), (2000L, true), (500L, true))
      .toDF("p", "y")
    val got = Curation.calibrationBuckets(df, col("p"), col("y"), 10)
      .collect().map(r => r.getAs[Int]("bucket")).sorted.toSeq
    assert(got == Seq(0, 4, 9))
  }

  test("perfectly calibrated fixture has small ECE") {
    import spark.implicits._
    // label fires below its own stated probability -> near-calibrated
    val df = (0L until 1000L)
      .map(i => ((i * 37) % 1001, (i * 7919) % 1000 < (i * 37) % 1001))
      .toDF("p", "y")
    val ece = Curation.calibrationBuckets(df, col("p"), col("y"), 10)
      .select(col("ece_milli")).distinct().collect()(0).getLong(0)
    assert(ece < 60L, s"near-calibrated fixture must have low ECE: $ece")
  }
}
