package graft

import graft.core.Sessions
import graft.operators.graph.GraphOps
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: the O(log n)-round,
  * skew-proof CC — pinned equal to min-label propagation where both
  * converge, and convergent where label propagation's O(diameter)
  * round count is the failure mode (long chains).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "graph-test")

  private def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("component")).toMap

  test("ccStars: hand graph — two components, min-rooted") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("ccStars: long chain converges where label propagation's " +
      "O(diameter) budget would not") {
    import spark.implicits._
    // a 120-edge path: diameter 120 — min-label propagation needs ~120
    // rounds; the star rounds contract it in O(log n)
    val pairs = (0L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got.size == 121 && got.values.forall(_ == 0L))
  }

  test("ccStars: star graph (max skew) — single component at the hub") {
    import spark.implicits._
    val pairs = (1L to 500L).map(i => (0L, i)).toDF("a", "b")
    val got = comps(GraphOps.connectedComponentsStars(pairs))
    assert(got.size == 501 && got.values.forall(_ == 0L))
  }

  test("ccStars: equals min-label propagation on near-dup pairs") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.nearDupPairs(docs, col("text"), col("doc_id"), 0.3)
      .select(col("a"), col("b")).localCheckpoint()
    val viaStars = comps(GraphOps.connectedComponentsStars(pairs))
    val viaProp = comps(Dedup.connectedComponents(pairs))
    assert(viaStars == viaProp)
  }

  test("ccStars: partition-count-invariant") {
    import spark.implicits._
    val pairs = (0L until 200L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("a", "b")
    val a = comps(GraphOps.connectedComponentsStars(pairs.repartition(2)))
    val b = comps(GraphOps.connectedComponentsStars(pairs.repartition(16)))
    assert(a == b)
  }

  test("ccStars: union-find finisher == pure star rounds") {
    import spark.implicits._
    val pairs = (0L until 200L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("a", "b")
    val viaLocal = comps(GraphOps.connectedComponentsStars(pairs))
    val viaStars = comps(GraphOps.connectedComponentsStars(pairs,
      localFinishEdges = 0))
    assert(viaLocal == viaStars && viaLocal.nonEmpty)
  }

  test("ccStars: mid-loop handoff to the finisher (threshold between " +
      "contracted and init edge count)") {
    import spark.implicits._
    // 300-edge path: init is over the 64-edge threshold, so star rounds
    // run until contraction fits, then the finisher labels — must equal
    // the pure star-round fixed point bit-for-bit
    val pairs = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val handoff = comps(GraphOps.connectedComponentsStars(pairs,
      localFinishEdges = 64))
    val pure = comps(GraphOps.connectedComponentsStars(pairs,
      localFinishEdges = 0))
    assert(handoff == pure && handoff.size == 301 &&
      handoff.values.forall(_ == 0L))
  }

  test("ccStars: non-integral ids fall back to star rounds") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y"))
      .toDF("a", "b")
    val got = GraphOps.connectedComponentsStars(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  private def core(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("deg")).toMap

  test("kCore: K4 plus pendant chain — 3-core keeps exactly the clique") {
    import spark.implicits._
    // K4 on {1,2,3,4}; chain 4-5-6-7 hangs off it. Peeling k=3 must
    // CASCADE down the chain: 7 drops (deg 1), then 6, then 5 — three
    // rounds, not one — leaving the clique at degree 3 each.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = core(GraphOps.kCore((k4 ++ chain).toDF("a", "b"), 3, 8))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k=2 keeps cycles, drops pendants; duplicate and " +
      "self edges ignored") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 3-9 + dup/self noise
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 9L),
      (5L, 5L)).toDF("a", "b")
    val got = core(GraphOps.kCore(pairs, 2, 8))
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: whole graph peels away to empty") {
    import spark.implicits._
    val got = core(GraphOps.kCore(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), 3, 8))
    assert(got.isEmpty)
  }

  test("kCore: declared rounds past convergence are identity") {
    import spark.implicits._
    val pairs = (0L until 120L)
      .map(i => (i % 41, (i * 13 + 5) % 41)).toDF("a", "b")
    val a = core(GraphOps.kCore(pairs, 3, 4))
    val b = core(GraphOps.kCore(pairs, 3, 40))
    // only valid if 4 rounds converge on this fixture; if they do,
    // extra rounds must not change anything
    if (a.values.forall(_ >= 3L)) assert(a == b)
  }

  test("kCore: partition-count-invariant") {
    import spark.implicits._
    val pairs = (0L until 200L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("a", "b")
    val a = core(GraphOps.kCore(pairs.repartition(2), 3, 8))
    val b = core(GraphOps.kCore(pairs.repartition(16), 3, 8))
    assert(a == b)
  }

  test("kCore: local peel finisher == distributed peel rounds") {
    import spark.implicits._
    // K4 + cascading pendant chain exercises multi-round peeling in
    // BOTH paths; localFinishEdges = 0 forces the distributed loop
    val pairs = ((0L until 200L).map(i => (i % 67, (i * 31 + 7) % 67)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 103L))).toDF("a", "b")
    val viaLocal = core(GraphOps.kCore(pairs, 2, 8))
    val viaLoop = core(GraphOps.kCore(pairs, 2, 8, localFinishEdges = 0))
    assert(viaLocal == viaLoop && viaLocal.nonEmpty)
  }

  test("kCore: round cap binds identically on both paths") {
    import spark.implicits._
    // chain cascade needs 3 rounds for k=2? use rounds=1 so the cap
    // bites mid-cascade: both paths must stop at the SAME partial state
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val viaLocal = core(GraphOps.kCore(pairs, 3, 1))
    val viaLoop = core(GraphOps.kCore(pairs, 3, 1, localFinishEdges = 0))
    assert(viaLocal == viaLoop)
  }

  private def cness(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getAs[Long]("id") ->
      r.getAs[Int]("coreness")).toMap

  test("coreness: hand graph — K4 coreness 3, triangle 2, chain 1") {
    import spark.implicits._
    // K4 on {1,2,3,4}; chain 4-5-6 hangs off it; separate triangle
    // {10,11,12} with pendant 12-13
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 13L)).toDF("a", "b")
    val got = cness(GraphOps.coreness(pairs, 8, 8))
    assert(got == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3,
      5L -> 1, 6L -> 1, 10L -> 2, 11L -> 2, 12L -> 2, 13L -> 1))
  }

  test("coreness: maxK caps the deep core, matches kCore per level") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val pairs = k4.toDF("a", "b")
    val capped = cness(GraphOps.coreness(pairs, 2, 8))
    assert(capped == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 1))
    // node ∈ k-core(kCore) ⇔ coreness >= k, for every k up to maxK
    val full = cness(GraphOps.coreness(pairs, 8, 8))
    for (k <- 1 to 4) {
      val gate = core(GraphOps.kCore(pairs, k, 8)).keySet
      assert(full.filter(_._2 >= k).keySet == gate, s"k=$k")
    }
  }

  test("coreness: whole graph at coreness 1 when nothing is cyclic") {
    import spark.implicits._
    val got = cness(GraphOps.coreness(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), 8, 8))
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1))
  }

  test("coreness: partition-count-invariant") {
    import spark.implicits._
    val pairs = (0L until 200L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("a", "b")
    val a = cness(GraphOps.coreness(pairs.repartition(2), 6, 8))
    val b = cness(GraphOps.coreness(pairs.repartition(16), 6, 8))
    assert(a == b)
  }

  test("coreness: local h-index finisher == distributed rounds, " +
      "round cap included") {
    import spark.implicits._
    val pairs = ((0L until 200L).map(i => (i % 67, (i * 31 + 7) % 67)) ++
      Seq((100L, 101L), (101L, 102L))).toDF("a", "b")
    for (rounds <- Seq(1, 2, 8)) {
      val viaLocal = cness(GraphOps.coreness(pairs, 6, rounds))
      val viaLoop = cness(GraphOps.coreness(pairs, 6, rounds,
        localFinishEdges = 0))
      assert(viaLocal == viaLoop && viaLocal.nonEmpty, s"rounds=$rounds")
    }
  }

  test("pageRank: local finisher == distributed rounds (rank_nano " +
      "bit-equal)") {
    import spark.implicits._
    val e = (0L until 300L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("src", "dst")
    def ranks(lfe: Long): Map[Long, Long] =
      GraphOps.pageRank(e, 3, localFinishEdges = lfe).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_nano")).toMap
    val viaLocal = ranks(4L * 1024 * 1024)
    val viaLoop = ranks(0)
    assert(viaLocal == viaLoop && viaLocal.nonEmpty)
  }

  private def lpa(df: org.apache.spark.sql.DataFrame,
      rounds: Int): Map[Long, Long] =
    GraphOps.lpaCommunities(df, rounds).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap

  test("lpaCommunities: two triangles over one bridge stay TWO " +
      "communities where CC merges them") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    // hand-traced 4 synchronous rounds (argmax: count desc, label asc)
    assert(lpa(pairs, 4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
    // same graph through CC: ONE component — the contrast LPA exists for
    assert(comps(GraphOps.connectedComponentsStars(pairs))
      .values.toSet.size == 1)
  }

  test("lpaCommunities: local finisher == distributed rounds") {
    import spark.implicits._
    // dense pseudo-random graph exercises real label competition;
    // localFinishEdges = 0 forces the distributed loop
    val pairs = (0L until 300L)
      .map(i => (i % 53, (i * 29 + 11) % 53)).toDF("a", "b")
    val viaLocal = lpa(pairs, 4)
    val viaLoop = GraphOps.lpaCommunities(pairs, 4, localFinishEdges = 0)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(viaLocal == viaLoop && viaLocal.nonEmpty)
  }

  test("modularityReport: hand-computed q_num on two triangles over " +
      "a bridge; terms sum to the textbook Q") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val asg = GraphOps.lpaCommunities(pairs, 4)
    val got = GraphOps.modularityReport(pairs, asg).collect()
      .map(r => r.getAs[Long]("community") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("in_edges"),
          r.getAs[Long]("deg_sum"), r.getAs[Long]("m"),
          r.getAs[Long]("q_num")))).toMap
    // m=7; each triangle: in=3, deg mass 3·2+1(bridge)=7,
    // q_num = 4·7·3 − 7² = 35
    assert(got == Map(
      1L -> ((3L, 3L, 7L, 7L, 35L)),
      3L -> ((3L, 3L, 7L, 7L, 35L))))
    // Σ q_num / 4m² is Newman-Girvan Q: 70/196 ≈ 0.357 — positive,
    // i.e. the LPA split beats chance (a single community scores 0)
    assert(got.values.map(_._5).sum == 70L)
  }

  test("lpaCommunities: self-loops drop, multi-edges dedup, " +
      "partition-count-invariant") {
    import spark.implicits._
    val base = (0L until 300L).map(i => (i % 59, (i * 17 + 5) % 59))
    val noisy = (base ++ base ++ (0L until 59L).map(i => (i, i)))
      .toDF("a", "b")
    val clean = base.toDF("a", "b")
    assert(lpa(noisy.repartition(3), 5) == lpa(clean.repartition(13), 5))
  }

  test("harmonicCentrality: local bitset finisher == distributed pair " +
      "rounds (harm_nano bit-equal), incl. depth caps mid-expansion") {
    import spark.implicits._
    // directed pseudo-random graph with chains, cycles and a self-loop —
    // exercises min-distance dedup across rounds and the u != v rule
    val e = ((0L until 300L).map(i => (i % 67, (i * 31 + 7) % 67)) :+
      ((5L, 5L))).toDF("src", "dst")
    def harms(depth: Int, localNodes: Long): Map[Long, Long] =
      GraphOps.harmonicCentrality(e, depth, localFinishNodes = localNodes)
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("harm_nano")).toMap
    for (depth <- Seq(1, 2, 4)) {
      val viaLocal = harms(depth, 1L << 13)
      val viaLoop = harms(depth, 0) // forces the pair-frontier loop
      assert(viaLocal == viaLoop && viaLocal.nonEmpty, s"depth=$depth")
    }
  }

  test("hyperBall: local register-evolution finisher == distributed " +
      "rounds (every ball estimate AND harm_milli bit-equal)") {
    import spark.implicits._
    val e = (0L until 300L)
      .map(i => (i % 67, (i * 31 + 7) % 67)).toDF("src", "dst")
    def balls(lfe: Long): Map[Long, Seq[Long]] =
      GraphOps.hyperBall(e, 3, 6, localFinishEdges = lfe).collect()
        .map(r => r.getAs[Long]("id") ->
          (1 until r.length).map(r.getLong)).toMap
    val viaLocal = balls(4L * 1024 * 1024)
    val viaLoop = balls(0) // forces the distributed register rounds
    assert(viaLocal == viaLoop && viaLocal.nonEmpty)
  }
}
