package graft

import graft.core.Sessions
import graft.operators.vector.VectorCuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Margin-criterion pair mining: exact flat-neighborhood identity
  * (all-equal sims ⇒ margin exactly 10⁶), best-match + mutual flags,
  * the threshold gate, the non-positive-denominator drop, and
  * partition invariance.
  */
class MarginSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "margin-test")

  private def mk(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def mine(src: Seq[(Long, Seq[Float])],
      tgt: Seq[(Long, Seq[Float])], k: Int, thr: Long) =
    VectorCuration.marginPairs(mk(src), mk(tgt), "vec_id", "embedding",
        k, thr)
      .collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Long]("margin_ppm"), r.getAs[Boolean]("mutual")))
      .sortBy(_._1)

  test("flat neighborhoods: identical vectors give margin exactly 1e6") {
    // every cosine is the same value c: afn = k·c, abn = k·c, so
    // margin = c·2k·1e6 / (2k·c) = 1e6 exactly (trunc)
    val v = Seq(1f, 2f, 3f)
    val got = mine(Seq((0L, v), (2L, v)), Seq((1L, v), (3L, v)), 2, 0L)
    assert(got.length == 2)
    assert(got.forall(_._3 == 1000000L))
    // best tgt ties to the lower id; mutual because best src ties low too
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L), (2L, 1L)))
    assert(got.forall(p => p._4 == (p._1 == 0L)))
  }

  test("clear best match is found, margin exceeds 1e6, mutual holds") {
    // src 0 aligns with tgt 1; tgt 3 is near-orthogonal noise
    val got = mine(
      Seq((0L, Seq(1f, 0f))),
      Seq((1L, Seq(10f, 1f)), (3L, Seq(1f, 10f))), 2, 0L)
    assert(got.length == 1)
    val (s, t, m, mu) = got(0)
    assert(s == 0L && t == 1L)
    assert(m > 1000000L, s"an above-average match must clear 1e6, got $m")
    assert(mu) // only one src, so tgt 1's best src is 0
  }

  test("threshold gate drops below-threshold pairs") {
    val v = Seq(1f, 2f, 3f)
    assert(mine(Seq((0L, v)), Seq((1L, v)), 1, 1000001L).isEmpty)
    assert(mine(Seq((0L, v)), Seq((1L, v)), 1, 1000000L).length == 1)
  }

  test("non-positive neighborhood denominator drops the pair") {
    // all cosines negative: afn + abn < 0 -> dropped, never a
    // sign-flipped margin
    val got = mine(Seq((0L, Seq(1f, 0f))),
      Seq((1L, Seq(-1f, -0.1f)), (3L, Seq(-1f, 0.1f))), 2, -5000000L)
    assert(got.isEmpty)
  }

  test("partition invariance") {
    val src = (0L until 20L).map(i =>
      (i * 2, Seq(((i * 7) % 5).toFloat + 1f, ((i * 3) % 4).toFloat)))
    val tgt = (0L until 20L).map(i =>
      (i * 2 + 1, Seq(((i * 5) % 6).toFloat + 1f, ((i * 11) % 3).toFloat)))
    val a = mine(src, tgt, 4, 0L)
    val b = VectorCuration.marginPairs(mk(src).repartition(7),
        mk(tgt).repartition(5), "vec_id", "embedding", 4, 0L)
      .collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Long]("margin_ppm"), r.getAs[Boolean]("mutual")))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
