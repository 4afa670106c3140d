package graft

import graft.core.Sessions
import graft.functions.FixedLog
import graft.operators.text.Collocations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PMI collocations: hand-computed nano pins (via the
  * lnNanoRef yardstick), the min-count gate, deterministic ordering,
  * and partition invariance.
  */
class CollocationsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "collocations-test")

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, String, Long, Long)] =
    df.collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
      r.getAs[Long]("n_xy"), r.getAs[Long]("pmi_nano"))).toSeq

  test("hand corpus: pmi_nano equals the lnNanoRef decomposition") {
    import spark.implicits._
    // pairs: (x,y)×2, (z,w)×1, (z,q)×1 — N=4, left x·=2 z·=2,
    // right ·y=2 ·w=1 ·q=1
    val docs = Seq("x y", "x y", "z w", "z q").toDF("text")
    val got = rows(Collocations.pmiTopK(docs, col("text"), 1, 10))
    def ln(m: Long) = FixedLog.lnNanoRef(m)
    val expect = Seq(
      // pmi desc, then x, y — both z-pairs score ln4−ln2−ln0... :
      // pmi(z,w) = ln1 + ln4 − ln2 − ln1 = ln4 − ln2
      ("x", "y", 2L, ln(2) + ln(4) - ln(2) - ln(2)),
      ("z", "q", 1L, ln(1) + ln(4) - ln(2) - ln(1)),
      ("z", "w", 1L, ln(1) + ln(4) - ln(2) - ln(1)))
    // all three share the same nano score ln2 — order is (pmi, x, y)
    assert(got.toSet == expect.toSet)
    assert(got.map(t => (t._4, t._1, t._2)) ==
      got.map(t => (t._4, t._1, t._2)).sortBy(t => (-t._1, t._2, t._3)))
  }

  test("min-count gate drops hapax pairs before scoring") {
    import spark.implicits._
    val docs = Seq("x y", "x y", "z w").toDF("text")
    val got = rows(Collocations.pmiTopK(docs, col("text"), 2, 10))
    assert(got.map(t => (t._1, t._2)) == Seq(("x", "y")))
  }

  test("degenerate top without the gate: hapax-of-hapax hits ln N") {
    import spark.implicits._
    val docs = Seq("a b", "a b", "a b", "u v").toDF("text")
    val got = rows(Collocations.pmiTopK(docs, col("text"), 1, 1))
    // (u,v): ln1 + ln4 − ln1 − ln1 = ln 4 — the max possible
    assert(got.head._1 == "u" && got.head._2 == "v" &&
      got.head._4 == FixedLog.lnNanoRef(4))
  }

  test("multi-token docs produce adjacent pairs only") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text")
    val got = rows(Collocations.pmiTopK(docs, col("text"), 1, 10))
    assert(got.map(t => (t._1, t._2)).toSet == Set(("a", "b"), ("b", "c")))
  }

  test("partition-count-invariant on the sf0.001 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = rows(Collocations.pmiTopK(docs.repartition(2),
      col("text"), 2, 20))
    val b = rows(Collocations.pmiTopK(docs.repartition(16),
      col("text"), 2, 20))
    assert(a == b && a.size == 20)
  }
}
