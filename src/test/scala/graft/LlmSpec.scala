package graft

import graft.core.{Sessions, Tables}
import graft.operators.text.{Dedup, TextOps}
import graft.operators.vector.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "llm-test")
  val sf = "/root/testdata/sf0.001"

  test("shingles: distinct 3-grams, empty below n tokens") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x x x x x").toDF("text")
    val out = df.select(TextOps.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    assert(out(2) == Seq("x x x")) // distinct collapses repeats
    // native gram builder ≡ HOF spec over the corpus (both variants)
    val toks = Tables.documents(spark, sf)
      .withColumn("_t", TextOps.tokens(col("text")))
    Seq(true, false).foreach { d =>
      val ab = toks.select(
        TextOps.shinglesFromTokens(col("_t"), 3, d).as("nat"),
        TextOps.shinglesFromTokensHof(col("_t"), 3, d).as("hof"))
        .collect()
      assert(ab.nonEmpty)
      ab.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    }
  }

  test("decontaminate: hit counts exact, benchmark and sub-n docs " +
      "excluded, repeats count once") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps", true), // benchmark
      (2L, "a quick brown fox runs", false),   // shares 'quick brown fox'
      (3L, "totally different words here", false),
      (4L, "too short", false),                // < 3 tokens: no grams
      (5L, "quick brown fox quick brown fox x", false) // repeat gram
    ).toDF("doc_id", "text", "bm")
    val out = TextOps.decontaminate(df, col("text"), col("doc_id"),
      col("bm")).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(!out.contains(1L)) // benchmark side never scored
    assert(!out.contains(4L)) // below n tokens: nothing to match on
    assert(out(2L) == ((3, 1, 0.333333))) // 'quick brown fox' hits
    assert(out(3L) == ((2, 0, 0.0)))
    // doc 5: 5 raw grams but 4 DISTINCT ('quick brown fox' repeats);
    // the repeated hit counts once — set semantics
    assert(out(5L) == ((4, 1, 0.25)))
  }

  test("perplexity: constructed LM values; unseen bigram/history fallbacks") {
    import spark.implicits._
    // training corpus: "a b" ×2 and "a c" ×1 → c(a,b)=2 c(a,c)=1 c1(a)=3
    // vocabulary {a,b,c} → v=3
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val lm = TextOps.bigramLm(train, col("text"))
    val lmRows = lm.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(lmRows == Set(("a", "b", 2L, 3L, 3L), ("a", "c", 1L, 3L, 3L)))
    // held-out scoring: seen bigram (2+1)/(3+3), unseen bigram of a SEEN
    // history (0+1)/(3+3), unseen history (0+1)/(0+3)
    val heldOut = Seq((10L, "a b"), (11L, "a z"), (12L, "q r"))
      .toDF("id", "text")
    val pairs = TextOps.bigramPairs(heldOut, col("text"), col("id"))
    val got = TextOps.perplexityFromPairs(pairs, lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def nll(p: Double) =
      BigDecimal(-math.round(math.log(p) * 1e9) / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == nll(3.0 / 6.0))
    assert(got(11L) == nll(1.0 / 6.0))
    assert(got(12L) == nll(1.0 / 3.0))
    // self-scored corpus form: sub-2-token docs are excluded
    val out = TextOps.withPerplexity(
      Seq((1L, "a b a b"), (2L, "x")).toDF("id", "text"),
      col("text"), col("id"))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("HashedWeightSum: native integer fold equals the HOF spec, and " +
      "expNano's Spark-rendered Horner chain equals the Scala ref") {
    // exact longs over the real corpus — any digest divergence in the
    // native path shows up as an integer mismatch here
    val docs = Tables.documents(spark, sf).filter(length(trim(col("text"))) >= 1)
      .withColumn("_t", TextOps.tokens(col("text")))
    val both = docs.select(
      graft.functions.TextExpressions.hashedWeightSum(col("_t")).as("nat"),
      TextOps.lrWeightSumFromTokens(col("_t")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"native ${r.getLong(0)} != hof ${r.getLong(1)}")
    }
    // the fixed-point sigmoid's exp: Spark `div` rendering == Scala ref
    // across the whole admissible domain's edges and a lattice sweep
    import spark.implicits._
    val xs = (0L to 1000000000L by 1234567L) ++ Seq(0L, 1L, 999999999L,
      1000000000L)
    val got = xs.toDF("x")
      .selectExpr(graft.functions.FixedLog.expNanoExpr("x", "div") + " AS e")
      .collect().map(_.getLong(0))
    xs.zip(got).foreach { case (x, g) =>
      assert(g == graft.functions.FixedLog.expNanoRef(x),
        s"expNano chain diverged from ref at x=$x")
    }
    // contract sanity: e^0 = 1e9 exactly; e^1 within 20 nano of e
    assert(graft.functions.FixedLog.expNanoRef(0L) == 1000000000L)
    assert(math.abs(graft.functions.FixedLog.expNanoRef(1000000000L) -
      2718281828L) <= 20L)
  }

  test("MultiSetHits / ZNormDistSq: native forms equal their HOF specs") {
    import spark.implicits._
    // membership counts over the corpus, every language table at once
    val toks = Tables.documents(spark, sf)
      .withColumn("_t", TextOps.tokens(col("text")))
    TextOps.LangStops.foreach { case (_, words) =>
      val ab = toks.select(TextOps.setHits(col("_t"), words).as("nat"),
        TextOps.setHitsHof(col("_t"), words).as("hof")).collect()
      assert(ab.nonEmpty)
      ab.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    }
    // pairwise z-norm distance², incl. the flat-series zero rule
    val pairs = Seq(
      (Seq(1.0, 2.0, 3.0, 4.0), Seq(8.0, 6.0, 4.0, 2.0)),
      (Seq(5.0, 5.0, 5.0, 5.0), Seq(1.0, 2.0, 3.0, 4.0)),
      (Seq(2.0, 4.0, 6.0, 8.0), Seq(1.0, 2.0, 3.0, 4.0))) // same shape
      .toDF("a", "b")
    def hofD2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def stats(x: org.apache.spark.sql.Column) = {
        val m = size(x)
        val mean = aggregate(x, lit(0.0), (acc, v) => acc + v) / m
        (mean, sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v) / m
          - mean * mean))
      }
      val (ma, sa) = stats(a); val (mb, sb) = stats(b)
      aggregate(zip_with(a, b, (x, y) => {
        val za = when(sa === 0, lit(0.0)).otherwise((x - ma) / sa)
        val zb = when(sb === 0, lit(0.0)).otherwise((y - mb) / sb)
        (za - zb) * (za - zb)
      }), lit(0.0), (acc, v) => acc + v)
    }
    val got = pairs.select(
      graft.functions.SeriesExpressions.znormDistSq(col("a"), col("b"))
        .as("nat"),
      hofD2(col("a"), col("b")).as("hof")).collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
    // identical shapes at different scales -> distance exactly 0
    assert(got(2).getDouble(0) == 0.0)
  }

  test("TokenEntropyScaled: native fold equals the HOF spec exactly") {
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) >= 1)
      .withColumn("_t", TextOps.tokens(col("text")))
    val both = docs.select(
      graft.functions.TextExpressions.tokenEntropyScaled(col("_t")).as("nat"),
      TextOps.tokenEntropyScaled(col("_t")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != hof ${r.getLong(1)}"))
  }

  test("dupSpans: maximal shared runs come out with exact token bounds") {
    import spark.implicits._
    // docs 1/2 share the 7-token run "a b c d e f g" (tokens 3..9 in
    // doc 1, 1..7 in doc 2); with n=3 that is gram starts 3..7 / 1..5.
    // doc 3 shares nothing; doc 4 is sub-n.
    val docs = Seq(
      (1L, "x y a b c d e f g z"),
      (2L, "a b c d e f g q r s"),
      (3L, "totally different words entirely here now"),
      (4L, "a b")).toDF("id", "text")
    val got = TextOps.dupSpans(docs, col("text"), col("id"), n = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(got == Set(
      (1L, 3, 9, 7, 5), // gram starts 3..7 -> tokens 3..9, 5 grams
      (2L, 1, 7, 7, 5)))
  }

  test("dsir: target-like docs score above source-like; fallback defined") {
    import spark.implicits._
    // target docs speak {aa bb}, source-only docs speak {zz yy} — a
    // held-out doc of target words must outscore one of source words
    val docs = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "zz yy zz yy", false), (4L, "yy zz yy zz", false))
      .toDF("id", "text", "tgt")
    val (table, totals) = TextOps.dsirTables(docs, col("text"), col("tgt"))
    val heldOut = Seq((10L, "aa bb"), (11L, "zz yy"), (12L, "qq qq"))
      .toDF("id", "text")
    val got = TextOps.dsirScoreWith(heldOut, col("text"), col("id"),
      table, totals)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10L) > 0, s"target-like doc not positive: ${got(10L)}")
    assert(got(11L) < 0, s"source-like doc not negative: ${got(11L)}")
    assert(got(10L) > got(11L))
    // unseen bucket: falls back to the zero-count ratio (defined, and
    // mildly positive because the smoothed target denom is smaller)
    val lt0 = math.log(1.0 / (8 + 4096)) - math.log(1.0 / (16 + 4096))
    val exp12 = BigDecimal(math.round(lt0 * 1e9) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(12L) == exp12)
    // the selection gate keeps the top fraction deterministically
    val kept = TextOps.dsirSample(docs, col("text"), col("id"),
      col("tgt"), 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"gate kept $kept")
  }

  test("minhash signature is permutation-bounded and deterministic") {
    val docs = Tables.documents(spark, sf)
    val sig = Dedup.minhashSignature(docs, col("text"), 8)
    val r1 = sig.select("doc_id", "sig0", "sig7").orderBy("doc_id").head()
    val r2 = sig.select("doc_id", "sig0", "sig7").orderBy("doc_id").head()
    assert(r1 == r2)
    val bad = sig.filter(
      (0 until 8).map(i => col(s"sig$i") < 0 || col(s"sig$i") >= Dedup.P)
        .reduce(_ || _)).count()
    assert(bad == 0)
  }

  test("near-dup pairs all meet the jaccard threshold") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.nearDupPairs(docs, col("text"), col("doc_id"), 0.3)
    assert(pairs.filter(col("jac") < 0.3 || col("a") >= col("b")).count() == 0)
  }

  test("LSH operators leave the session CacheManager empty") {
    // CacheScope contract: the persisted base is released before the
    // operator returns — a long-lived session must not accumulate one
    // pinned cache entry per invocation
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val results = Seq(
      Dedup.nearDupPairs(docs, col("text"), col("doc_id"), 0.3),
      Dedup.nearDupClusterPairs(docs, col("text"), col("doc_id"), 0.3),
      VectorOps.cosineDupPairs(emb, "vec_id", "embedding", 0.35, bands = 2))
    assert(spark.sharedState.cacheManager.isEmpty)
    // the returned frames stay fully usable after the base was released
    results.foreach(r => assert(r.count() >= 0))
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("semanticDecon: a rewrite embedding next to a bench item flags; " +
      "unrelated rows and the bench side itself do not") {
    import spark.implicits._
    val dim = 64
    def v(seed: Int, eps: Float = 0f): Seq[Float] =
      Seq.tabulate(dim)(i =>
        (if (i % (seed + 2) == 0) 1f else -0.1f) + (if (i == 0) eps else 0f))
    // 100 = bench item; 1 = near-copy of it; 2/3 = unrelated
    val df = Seq(
      (100L, v(3)), (1L, v(3, 0.01f)), (2L, v(11)), (3L, v(17))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.semanticDecon(df, "vec_id", "embedding",
        col("vec_id") >= 100L, threshold = 0.9,
        bands = 4, rowsPerBand = 2, dim = dim)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // bench rows never emitted
    assert(got(1L)._2 && got(1L)._1 == 1L)
    assert(!got(2L)._2 && !got(3L)._2)
  }

  test("semanticDecon: partition-count-invariant") {
    val emb = Tables.embeddings(spark, sf)
    def run(d: org.apache.spark.sql.DataFrame) =
      VectorOps.semanticDecon(d, "vec_id", "embedding",
          col("vec_id") % 13 === 0, 0.4)
        .collect().map(_.toString).sorted.toSeq
    assert(run(emb.repartition(3)) == run(emb.repartition(16)))
  }

  test("semanticDeconExact dominates the banded form (hits ⊆ exact) " +
      "and recall is monotone in bands") {
    val emb = Tables.embeddings(spark, sf)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(3))))
        .toMap
    val exact = toMap(VectorOps.semanticDeconExact(emb, "vec_id",
      "embedding", col("vec_id") % 13 === 0, 0.4))
    val banded = toMap(VectorOps.semanticDecon(emb, "vec_id", "embedding",
      col("vec_id") % 13 === 0, 0.4))
    assert(exact.keySet == banded.keySet) // same corpus rows out
    // banded candidates are a subset of all pairs, so per-doc hit counts
    // and the contaminated verdict can only under-report, never invent
    banded.foreach { case (id, (nh, cont)) =>
      assert(nh <= exact(id)._1, s"vec_id=$id banded $nh > exact")
      assert(!cont || exact(id)._2)
    }
    val truePos = exact.count(_._2._2)
    val found = banded.count { case (id, (_, cont)) => cont && exact(id)._2 }
    assert(truePos > 0 && found > 0)
    // recall here is genuinely probabilistic — 1-(1-p^r)^b with
    // p = 1 - θ/π ≈ 0.63 right at sim 0.4, so the 4×4 default measures
    // ~444 milli on this fixture (the whole point of the yardstick;
    // measured table + band guidance in docs/SCALE.md). Candidate sets
    // NEST in bands (band b is the same planes at any band count), so
    // more bands can only add hits:
    val banded8 = toMap(VectorOps.semanticDecon(emb, "vec_id", "embedding",
      col("vec_id") % 13 === 0, 0.4, bands = 8))
    val found8 = banded8.count { case (id, (_, cont)) => cont && exact(id)._2 }
    assert(found8 >= found,
      s"bands=8 recall $found8 regressed below bands=4 $found")
  }

  test("simhash of identical texts is identical") {
    import spark.implicits._
    val df = Seq(("x", "spark window agg join"), ("y", "spark window agg join"))
      .toDF("id", "text")
    val sh = df.select(Dedup.simhash32(col("text")).as("s")).collect()
    assert(sh(0).getLong(0) == sh(1).getLong(0))
    assert(sh(0).getLong(0) >= 0 && sh(0).getLong(0) < (1L << 32))
  }

  test("ann topk recall overlaps brute-force topk") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 50 === 0)
    val brute = VectorOps.bruteTopK(emb, q, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = VectorOps.annTopK(emb, q, "vec_id", "embedding", 3, nPlanes = 2)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2 planes → 4 buckets → ~25% of corpus per bucket; expect real overlap
    assert(ann.nonEmpty)
    assert((ann intersect brute).nonEmpty)
  }

  test("annRecallReport equals the brute/ann membership recomputation, " +
      "with real misses") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 50 === 0)
    val rep = VectorOps
      .annRecallReport(emb, q, "vec_id", "embedding", 3, nPlanes = 4)
      .collect()
      .map(r => (r.getLong(0),
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val brute = VectorOps.bruteTopK(emb, q, "vec_id", "embedding", 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ann = VectorOps.annTopK(emb, q, "vec_id", "embedding", 3, nPlanes = 4)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nExact = brute.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val hits = brute.filter(ann.contains)
      .groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    assert(rep.keySet == nExact.keySet)
    nExact.foreach { case (qid, n) =>
      val h = hits.getOrElse(qid, 0L)
      assert(rep(qid) == ((3, n, h, h * 1000 / n)),
        s"q_id=$qid: got ${rep(qid)}, want (3, $n, $h, ${h * 1000 / n})")
    }
    // 4 planes on this fixture leave real misses — the hits < n_exact
    // (recall < 1000) path actually executes
    assert(rep.exists { case (_, (_, n, h, _)) => h < n })
  }

  test("annRecallReport zero-fills a query whose ANN side is empty") {
    import spark.implicits._
    // basis vectors make plane dots exact: dot(e_i, plane) = plane(i).
    // Find a basis vector whose 4-plane sign bucket differs from e_0's —
    // a corpus of {e_0} and a query of {e_i} then share no LSH bucket,
    // so annTopK returns nothing and the report's left-join zero-fill
    // (hits = 0, recall_milli = 0) is the path under test.
    val ps = VectorOps.planes(4, 64)
    def bucket(i: Int): Long = ps.zipWithIndex.map { case (p, j) =>
      if (p(i) > 0) 1L << j else 0L
    }.sum
    val qi = (1 until 64).find(i => bucket(i) != bucket(0))
      .getOrElse(fail("no basis vector in a different bucket"))
    def e(i: Int) = Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    val corpus = Seq((1L, e(0))).toDF("vec_id", "embedding")
    val queries = Seq((2L, e(qi))).toDF("vec_id", "embedding")
    val rep = VectorOps
      .annRecallReport(corpus, queries, "vec_id", "embedding", 3, nPlanes = 4)
      .collect()
    assert(rep.length == 1)
    val r = rep(0)
    assert((r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 3, 1L, 0L, 0L)))
  }

  test("annRecallReport: partition-count-invariant") {
    val emb = Tables.embeddings(spark, sf)
    def run(d: org.apache.spark.sql.DataFrame) =
      VectorOps.annRecallReport(d, d.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", 3, nPlanes = 4)
        .collect().map(_.toString).sorted.toSeq
    assert(run(emb.repartition(3)) == run(emb.repartition(16)))
  }

  test("codegen FloatDot/FloatSqDist are bit-identical to the HOF fold") {
    // the DuckDB oracle replays the HOF fold order (float multiply,
    // double accumulate, left-to-right); the codegen expression must
    // produce the same BITS, not just close doubles — compare raw
    // Double.doubleToRawLongBits over the whole embeddings fixture
    val emb = Tables.embeddings(spark, sf)
    val self = emb.select(col("vec_id"), col("embedding").as("a"))
      .withColumn("b", reverse(col("a")))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val mism = self.select(
      graft.functions.VectorExpressions.floatDot(col("a"), col("b")).as("cg"),
      hofDot(col("a"), col("b")).as("hof"),
      graft.functions.VectorExpressions.floatSqDist(col("a"), col("b")).as("cgs"),
      hofSq(col("a"), col("b")).as("hofs"))
      .collect()
      .count { r =>
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) !=
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ||
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)) !=
          java.lang.Double.doubleToRawLongBits(r.getDouble(3))
      }
    assert(mism == 0)
    // null propagation matches, and empty arrays fold to exactly 0.0
    import spark.implicits._
    val edge = Seq(
      (Some(Array(1.0f, 2.0f)), None),
      (None, Some(Array(1.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val rows = edge.select(
      graft.functions.VectorExpressions.floatDot(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("FloatDot interpreted eval matches codegen bit-for-bit") {
    // constant folding / codegen fallback route through nullSafeEval —
    // force the interpreted path and compare raw bits against the
    // codegen run on the same fixture
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("a"))
      .withColumn("b", reverse(col("a")))
    def dots() = emb.select(col("vec_id"),
        graft.functions.VectorExpressions.floatDot(col("a"), col("b")).as("d"))
      .collect()
      .map(r => r.getLong(0) -> java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      .toMap
    val codegen = dots()
    // capture-and-restore: hard-coding the restore values would clobber a
    // shared session configured differently (e.g. codegen disabled)
    val savedWhole = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    def restore(key: String, v: Option[String]): Unit = v match {
      case Some(s) => spark.conf.set(key, s)
      case None => spark.conf.unset(key)
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = dots()
      assert(interpreted == codegen)
    } finally {
      restore("spark.sql.codegen.wholeStage", savedWhole)
      restore("spark.sql.codegen.factoryMode", savedFactory)
    }
  }

  test("float_dot/float_sq_dist reach SQL text via extension registration") {
    // the extensions class drives injectFunction without throwing (the
    // spark.sql.extensions config path), and the live-session register
    // makes the functions resolvable from SQL on the running session
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_dot(a, b) AS d, float_sq_dist(a, b) AS s
        |FROM VALUES (array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |             array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS t(a, b)
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.5 * 4.0 + -2.0 * 0.5)
    assert(r.getDouble(1) == 2.5 * 2.5 + 2.5 * 2.5)
    val bad = intercept[Exception] {
      spark.sql("SELECT float_dot(array(CAST(1.0 AS FLOAT)))").head()
    }
    assert(bad.getMessage.contains("2 arguments"))
    // the subsequence scan resolves from SQL too: a perfect ramp match
    // at offset 1 -> [1.0, ~0.0]
    val bm = spark.sql(
      """SELECT znorm_best_match(
        |  array(1.0D, 2.0D, 3.0D, 4.0D),
        |  array(-1.3416407864998738D, -0.4472135954999579D,
        |        0.4472135954999579D, 1.3416407864998738D)) AS r
        |""".stripMargin).head().getSeq[Double](0)
    assert(bm(0) == 1.0 && bm(1) < 1e-12, s"got $bm")
  }

  test("cosine near-dup: banded pairs are a subset of exact; recall monotone in bands") {
    val emb = Tables.embeddings(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      VectorOps.cosineDupPairsExact(emb, "vec_id", "embedding", 0.35))
    val b2 = pairSet(
      VectorOps.cosineDupPairs(emb, "vec_id", "embedding", 0.35, bands = 2))
    val b4 = pairSet(
      VectorOps.cosineDupPairs(emb, "vec_id", "embedding", 0.35, bands = 4))
    assert(exact.nonEmpty)
    // precision is exact: the verify step recomputes true cosine
    assert(b2.subsetOf(exact) && b4.subsetOf(exact))
    // plane j is shared across runs, so candidate sets nest with bands
    assert(b2.subsetOf(b4))
    assert(b4.nonEmpty)
  }

  test("cosineDupPairsAuto sizes signature bits by the occupancy law") {
    // the sf1 scale run (BENCH_NOTES_r9 §3) measured candidates growing
    // ~n²/2^r at fixed width; autoBits applies docs/SCALE.md's rule
    assert(VectorOps.autoBits(2000, 128) == 4)     // 16 buckets
    assert(VectorOps.autoBits(20000, 128) == 8)    // 10x corpus -> +4 bits
    assert(VectorOps.autoBits(1L << 40, 128) == 24) // clamped high
    assert(VectorOps.autoBits(1, 128) == 4)         // clamped low
    // the wrapper is exactly the fixed-parameter form at the chosen r
    val emb = Tables.embeddings(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    val auto = pairSet(
      VectorOps.cosineDupPairsAuto(emb, "vec_id", "embedding", 0.35))
    val fixed = pairSet(VectorOps.cosineDupPairs(emb, "vec_id", "embedding",
      0.35, rowsPerBand = VectorOps.autoBits(n, 128)))
    assert(auto == fixed && auto.nonEmpty)
    // the dedup_cosine_auto ORACLE hard-codes 4-bit bands, valid only
    // while autoBits(n)==4, i.e. every oracle corpus stays <= 2048
    // embeddings — pin that precondition so a corpus growth fails HERE
    // with a message, not as a silent driver hash mismatch
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { dir =>
      val cnt = Tables.embeddings(spark, dir).count()
      assert(cnt <= 2048,
        s"$dir has $cnt embeddings: autoBits != 4, regenerate " +
          "dedup_cosine_auto's oracle (LlmPack.cosinePairsOracle)")
    }
  }

  test("semanticDeconAuto is exactly the fixed-width form at the " +
      "occupancy-law width") {
    val emb = Tables.embeddings(spark, sf)
    def rep(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val n = emb.count()
    val auto = rep(VectorOps.semanticDeconAuto(emb, "vec_id", "embedding",
      col("vec_id") % 13 === 0, 0.4))
    val fixed = rep(VectorOps.semanticDecon(emb, "vec_id", "embedding",
      col("vec_id") % 13 === 0, 0.4,
      rowsPerBand = VectorOps.autoBits(n, 128)))
    assert(auto == fixed && auto.nonEmpty)
    // emb_semantic_decon_auto shares semanticDeconSql (4-bit bands) —
    // the <= 2048-embeddings precondition is pinned by the
    // cosineDupPairsAuto test above for every oracle corpus
  }

  test("annVsIndex: full probe equals the all-pairs threshold answer; " +
      "partial probes nest") {
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val arr = emb.filter(col("vec_id") % 7 === 0)
    val cents = VectorOps.ivfCentroids(idx, "vec_id", "embedding", 4)
    val index = VectorOps.vectorIndex(idx, "vec_id", "embedding", cents)
    def run(p: Int) = VectorOps
      .annVsIndex(arr, index, "vec_id", "embedding", cents, 0.2, p)
      .select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = run(4)
    // independent all-pairs recompute (same dot/norm columns, no cells)
    def dotC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.floatDot(a, b)
    val exact = arr.select(col("vec_id").as("q_id"),
        col("embedding").as("qv"))
      .crossJoin(idx.select(col("vec_id").as("id"),
        col("embedding").as("iv")))
      .withColumn("sim", round(dotC(col("qv"), col("iv")) /
        (sqrt(dotC(col("qv"), col("qv"))) *
          sqrt(dotC(col("iv"), col("iv")))), 6))
      .filter(col("sim") >= 0.2)
      .select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact && full.nonEmpty)
    // candidates nest in nProbe, so the emitted set is monotone
    val p1 = run(1)
    val p2 = run(2)
    assert(p1.subsetOf(p2) && p2.subsetOf(full))
  }

  test("emb_vs_vector_index_partial is genuinely PARTIAL on the oracle " +
      "corpus: the registered nProbe=2 serve emits a strict subset of " +
      "the full probe (the recall knob bites, so the oracle row can't " +
      "silently sit at the all-pairs-equivalence point)") {
    import graft.operators.vector.VectorCuration
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val arr = emb.filter(col("vec_id") % 7 === 0)
    val cents = VectorCuration.kmeansTrain(idx, "embedding",
      VectorCuration.seedCentroids(8, 64), 1)
    val index = VectorOps.vectorIndex(idx, "vec_id", "embedding", cents)
    def run(p: Int) = VectorOps
      .annVsIndex(arr, index, "vec_id", "embedding", cents, 0.4, p)
      .select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val partial = run(2)
    val full = run(8)
    assert(partial.nonEmpty, "partial probe lost all matches")
    assert(partial.subsetOf(full))
    assert(partial != full,
      "nProbe=2 equals the full probe on this corpus — the registered " +
        "partial oracle row is no longer exercising the recall cut")
  }

  test("hybridTopK single-pass fusion is bit-identical to composing " +
      "the two arms through rrfFuse (the r13 reference form)") {
    import graft.operators.vector.Fusion
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val got = VectorOps.hybridTopK(emb, q, "vec_id", "embedding", 10, 60)
      .collect().map(_.toString).toSet
    // reference composition: each arm top-k independently, rrfFuse
    val dense = VectorOps.bruteTopK(emb, q, "vec_id", "embedding", 10)
      .select(col("q_id"), col("vec_id").as("id"), col("rnk"))
    val ham = VectorOps.hammingTopK(emb, q, "vec_id", "embedding", 10)
      .select(col("q_id"), col("vec_id").as("id"), col("rnk"))
    val ref = Fusion.rrfFuse(Seq(dense, ham), 60, 10)
      .collect().map(_.toString).toSet
    assert(got.nonEmpty && got == ref)
  }

  test("cosineDupPairsExact fails fast on an oversized corpus") {
    val emb = Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException] {
      VectorOps.cosineDupPairsExact(emb, "vec_id", "embedding", 0.4,
        maxRows = 1)
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("degenerate LSH bucket: cap bounds candidates; cluster pairs stay linear") {
    import spark.implicits._
    // 1000 byte-identical docs — every band hashes to ONE bucket, the
    // uncapped self-join would enumerate 1000·999/2 pairs per band.
    val docs = (1L to 1000L)
      .map(i => (i, "the same exact document text repeated for dedup testing"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, col("text"), col("doc_id"), 0.3,
      maxBucketSize = 50)
    // identical docs: jaccard 1.0, every capped pair survives; all bands
    // produce the same 50-doc prefix, distinct collapses them
    assert(pairs.count() == 50L * 49 / 2)
    val stars = Dedup.nearDupClusterPairs(docs, col("text"), col("doc_id"), 0.3)
    assert(stars.count() == 999) // every doc linked to the representative
    assert(stars.filter(col("a") =!= 1L).count() == 0) // rep = min doc_id
  }

  test("bruteTopK fails fast on an oversized query side") {
    val emb = Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException] {
      VectorOps.bruteTopK(emb, emb, "vec_id", "embedding", 3, maxQueryRows = 10)
    }
    assert(e.getMessage.contains("too large to broadcast"))
  }

  test("multi-probe ann never degrades the k-th best similarity") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 50 === 0)
    def run(p: Int) = VectorOps
      .annTopK(emb, q, "vec_id", "embedding", 3, nPlanes = 4, probes = p)
      .select(col("q_id"), col("rnk"), col("sim"))
    val p1 = run(1).withColumnRenamed("sim", "sim1")
    val p3 = run(3).withColumnRenamed("sim", "sim3")
    // candidates(probes=1) ⊆ candidates(probes=3), so at every rank the
    // achieved similarity is monotonically non-decreasing
    val worse = p1.join(p3, Seq("q_id", "rnk"))
      .filter(col("sim3") < col("sim1")).count()
    assert(worse == 0)
    // and the extra probes actually reach new buckets somewhere
    assert(run(3).count() >= run(1).count())
  }

  test("ivfTopK: full probe equals brute force exactly; recall monotone in nProbe") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 50 === 0)
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rnk", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = collectSet(VectorOps.bruteTopK(emb, q, "vec_id", "embedding", 5))
    // nProbe == nCells: cells partition the corpus, every pair scored once
    val full = collectSet(VectorOps.ivfTopK(
      emb, q, "vec_id", "embedding", 5, nCells = 4, nProbe = 4))
    assert(full == brute)
    // partial probe: candidate sets nest (probe lists are prefixes), so
    // true-top-k hits can only grow with nProbe
    def hits(p: Int) = (collectSet(VectorOps.ivfTopK(
      emb, q, "vec_id", "embedding", 5, nCells = 4, nProbe = p))
      intersect brute).size
    val h1 = hits(1); val h2 = hits(2)
    assert(h1 > 0)
    assert(h2 >= h1)
  }

  test("ivfCentroids is deterministic and respects the training cap") {
    val emb = Tables.embeddings(spark, sf)
    val a = VectorOps.ivfCentroids(emb, "vec_id", "embedding", 4, maxTrainRows = 40)
    val b = VectorOps.ivfCentroids(emb, "vec_id", "embedding", 4, maxTrainRows = 40)
    assert(a.length == 4 && a.head.length == 64)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("decodePartitions runs a pluggable per-partition decoder") {
    val d = graft.operators.multimodal.Multimodal.withBlob(
      Tables.documents(spark, sf), col("text"))
    val out = graft.operators.multimodal.Multimodal
      .decodePartitions(d, "blob", dims = 3)()
    val r = out.select(col("doc_id"), col("features")).head()
    assert(r.getSeq[Double](1).size == 3)
    assert(r.getSeq[Double](1).forall(v => v >= 0.0 && v <= 1.0))
    // custom decoder plugs in
    val custom = graft.operators.multimodal.Multimodal
      .decodePartitions(d, "blob")(b => Seq(b.length.toDouble))
    assert(custom.select(col("features")).head().getSeq[Double](0).head ==
      custom.select(col("blob_meta.n_bytes")).head().getInt(0).toDouble)
  }

  test("pHash: identical payloads hash equal (hamming-0 pairs); " +
      "distinct payloads never pair within 3 bits; partition-invariant") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different payload"), (4L, "yet another payload"),
      (5L, "the quick brown fox")).toDF("doc_id", "text")
    val pairs = M.pHashPairs(df, col("text"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the dup family {1,2,5} gives exactly its 3 hamming-0 pairs; the
    // md5-avalanche hashes of 3/4 sit far beyond 3 bits of anything
    assert(pairs == Set((1L, 2L, 0), (1L, 5L, 0), (2L, 5L, 0)))
    val h2 = M.pHash(df.repartition(7), col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val h1 = M.pHash(df.coalesce(1), col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h1 == h2 && h1(1L) == h1(2L) && h1(1L) != h1(3L))
  }

  test("pHash native kernel is bit-identical to the relational spec " +
      "twin over the corpus") {
    val M = graft.operators.multimodal.Multimodal
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val native = toMap(M.pHash(docs, col("text"), col("doc_id")))
    val twin = toMap(M.pHashViaJoins(docs, col("text"), col("doc_id")))
    assert(native.nonEmpty && native == twin)
  }

  test("pHash: DCT basis is the rounded-cosine table and bit 63 is " +
      "reachable (sign bit exact)") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    // the table IS round(1024*cos((2x+1)u*pi/16)) — guards typos in the
    // hardcoded literals without putting libm in any data path
    for (u <- 0 until 8; x <- 0 until 8)
      assert(M.DctT(u)(x) ==
        math.round(1024.0 * math.cos((2 * x + 1) * u * math.Pi / 16)))
    // hashes land across the full 64-bit range: some corpus hash has the
    // sign bit set (bit 63 = coefficient (7,7) > AC median), proving the
    // MinValue-weight path both engines replay
    val hs = M.pHash((0L until 40L).map(i => (i, s"payload-$i"))
      .toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect().map(_.getLong(1))
    assert(hs.exists(_ < 0L) && hs.exists(_ > 0L))
  }

  test("audioFp: HK frame law (nf = (n-34) div 17 + 1, frames 1..nf-1), " +
      "short-doc cutoff, fp range, partition-invariant") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    def mk(n: Int) = (0 until n).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, mk(120)), (2L, mk(50)), (3L, mk(51)), (4L, ""))
      .toDF("doc_id", "text")
    val out = M.audioFp(df, col("text"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // 120 tokens: nf = 6 -> frames 1..5; 51: nf = 2 -> frame 1 only;
    // 50: nf = 1 -> below the two-frame minimum; empty: nothing
    assert(byDoc(1L).toSeq == Seq(1, 2, 3, 4, 5))
    assert(byDoc(3L).toSeq == Seq(1))
    assert(!byDoc.contains(2L) && !byDoc.contains(4L))
    assert(out.forall { case (_, _, fp) => fp >= 0 && fp <= 65535 })
    val s1 = M.audioFp(df.repartition(7), col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(s1 == out.toSet)
  }

  test("audioFp native kernel is bit-identical to the relational HOF " +
      "twin over the corpus") {
    val M = graft.operators.multimodal.Multimodal
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val native = toSet(M.audioFp(docs, col("text"), col("doc_id")))
    val twin = toSet(M.audioFpViaHof(docs, col("text"), col("doc_id")))
    assert(native.nonEmpty && native == twin)
  }

  test("audioFpPairs: identical streams pair at jac 1.0, a trailing " +
      "perturbation outside frame coverage leaves the stream unchanged, " +
      "cross-variant docs share only banner-interior frames") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    val banner = (0 until 80).map(i => f"b$i%02d").mkString(" ")
    def tpl(v: Int) = banner + " " + Seq.fill(40)(s"t$v").mkString(" ")
    val df = Seq(
      (1L, tpl(0)),
      // 121st token: beyond the last frame's coverage (tokens <= 118),
      // so the sub-fingerprint STREAM is identical — the HK
      // granularity property an avalanche digest does not have
      (2L, tpl(0) + " zzz"),
      (3L, tpl(1)),
      (4L, (0 until 120).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fps = M.audioFp(df, col("text"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
    val pairs = M.audioFpPairs(df, col("text"), col("doc_id"),
      threshold = 0.2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))
      .toMap
    assert(pairs((1L, 2L))._2 == 1.0)
    // frames 1 and 2 only touch banner samples (tokens <= 67 < 80) on
    // both the frame and its predecessor, so cross-variant pairs share
    // at least those two fingerprints but not the whole stream
    for (k <- Seq((1L, 3L), (2L, 3L))) {
      assert(pairs(k)._1 >= 2 && pairs(k)._2 < 1.0 && pairs(k)._2 >= 0.2)
    }
    assert(!pairs.keySet.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("planBands: the MMDS optimal-band rule — log-nearest S-curve " +
      "midpoint, more-bands tie-break, domain guards") {
    assert(Dedup.planBands(0.3, 16) == ((8, 2)))
    assert(Dedup.planBands(0.5, 8) == ((4, 2))) // exact midpoint hit
    assert(Dedup.planBands(0.9, 16) == ((2, 8)))
    assert(Dedup.planBands(0.05, 16) == ((16, 1)))
    // 0.5 sits log-equidistant between (8,2)=0.354 and (4,4)=0.707:
    // the tie breaks toward MORE bands (recall-leaning)
    assert(Dedup.planBands(0.5, 16) == ((8, 2)))
    intercept[IllegalArgumentException](Dedup.planBands(0.0, 16))
    intercept[IllegalArgumentException](Dedup.planBands(1.0, 16))
    intercept[IllegalArgumentException](Dedup.planBands(0.3, 1))
  }

  test("nearDupPairsAuto: equals the fixed form at the planned knobs " +
      "and never loses a fixed-default pair (shared-prefix bands)") {
    val docs = Tables.documents(spark, sf)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = toSet(Dedup.nearDupPairsAuto(docs, col("text"),
      col("doc_id"), 0.3, k = 16))
    val (b, r) = Dedup.planBands(0.3, 16)
    val fixed = toSet(Dedup.nearDupPairs(docs, col("text"), col("doc_id"),
      0.3, b, r))
    assert(auto == fixed)
    // the plan's first 4 bands reuse the fixed default's signatures
    // (sig0..sig7), so its candidate set is a superset: every verified
    // default pair survives
    val dflt = toSet(Dedup.nearDupPairs(docs, col("text"), col("doc_id"),
      0.3))
    assert(dflt.subsetOf(auto))
  }

  test("audioFpAlignPairs: a one-hop (17-token) pad is recovered as " +
      "offset -1 with the body frames aligned; unrelated docs never " +
      "clear minAligned; partition-invariant") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    val body = (0 until 120).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, body),
      (2L, Seq.fill(17)("px").mkString(" ") + " " + body),
      (3L, (0 until 120).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      M.audioFpAlignPairs(d, col("text"), col("doc_id"), minAligned = 2)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getInt(2), r.getLong(3)))).toMap
    val out = run(df)
    // doc 2's frames sit one hop later: body frame f of doc 1 matches
    // frame f+1 of doc 2, so the winning offset is 1 - 2's = -1, with
    // at least the body-interior frames voting for it
    assert(out.contains((1L, 2L)))
    val (off, n) = out((1L, 2L))
    assert(off == -1 && n >= 2)
    assert(!out.keySet.exists(k => k._1 == 3L || k._2 == 3L))
    assert(run(df.repartition(5)) == out)
  }

  test("simhash64: low 32 bits bit-identical to simhash32 over the " +
      "corpus (sh64 is a widening, not a rehash)") {
    val both = Tables.documents(spark, sf).select(col("doc_id"),
        graft.functions.TextExpressions.simHash32(col("text")).as("s32"),
        graft.functions.TextExpressions.simHash64(col("text")).as("s64"))
      .collect()
    assert(both.nonEmpty)
    assert(both.forall(r => (r.getLong(2) & 0xffffffffL) == r.getLong(1)))
  }

  test("simhash64DupPairs: exact dups pair at hamming 0, distinct " +
      "payloads never pair within 3 bits, partition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "a wholly different token soup entirely"),
      (4L, "yet another unrelated payload of words"),
      (5L, "the quick brown fox jumps")).toDF("doc_id", "text")
    def toSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pairs = toSet(Dedup.simhash64DupPairs(df, col("text"),
      col("doc_id"), 3))
    assert(pairs == Set((1L, 2L, 0), (1L, 5L, 0), (2L, 5L, 0)))
    val p2 = toSet(Dedup.simhash64DupPairs(df.repartition(7), col("text"),
      col("doc_id"), 3))
    assert(p2 == pairs)
    intercept[IllegalArgumentException](
      Dedup.simhash64DupPairs(df, col("text"), col("doc_id"), 4))
  }

  test("simhash64AutoBandBits: the occupancy law picks 8/16 bits by " +
      "corpus size, respects the pigeonhole floor, rejects loudly past " +
      "the widest admissible key") {
    import graft.operators.text.Dedup
    // BENCH_NOTES_r19 §2 anchors: 500 docs → 8-bit; 50 k docs → 16-bit
    assert(Dedup.simhash64AutoBandBits(500L, 3, 128) == 8)
    assert(Dedup.simhash64AutoBandBits(50000L, 3, 128) == 16)
    // pigeonhole floor: hamming<=1 admits 32-bit keys, hamming<=3 not
    assert(Dedup.simhash64AutoBandBits(100000000L, 1, 128) == 32)
    intercept[IllegalArgumentException](
      Dedup.simhash64AutoBandBits(100000000L, 3, 128))
    // the dedup_simhash64_auto ORACLE computes its band width from the
    // corpus count with the SAME ceil-divide + 2^w rule
    // (simhash64PairsAutoSql), so it co-moves with the engine at every
    // SF; anchor the verify corpus's branch here so a drift between
    // the two formulations surfaces as THIS assert, not a value diff
    val n01 = Tables.documents(spark, "/root/testdata/sf0.01").count()
    assert(Dedup.simhash64AutoBandBits(n01, 3, 128) == 8,
      s"verify corpus n=$n01 left the 8-bit branch — confirm " +
        "simhash64PairsAutoSql picks the same width before trusting " +
        "the oracle row")
    // auto result equals the explicitly-widthed call
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(400)
    def toSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(toSet(Dedup.simhash64DupPairsAuto(docs, col("text"),
        col("doc_id"), 3)) ==
      toSet(Dedup.simhash64DupPairs(docs, col("text"), col("doc_id"), 3,
        bandBits = 8)))
  }

  test("KN perplexity: the interpolated-KN distribution NORMALIZES — " +
      "for every seen history the exact-rational numerators sum to " +
      "exactly the denominator over the vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "b c a a b"), (3L, "c c a b a"))
      .toDF("doc_id", "text")
    val pairs = TextOps.bigramPairs(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    val big = pairs.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    val n1r = big.keys.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    val n1l = big.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val vocab = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val bv = big.size.toLong + vocab.size
    // p(w2|w1) = nu / de with nu = (B+V)·max(4c12−3,0) + 3·n1r·(n1l+1),
    // de = 4·c1·(B+V): sum nu over ALL w2 in V must equal de exactly
    // (each seen bigram donates d = 3/4; the continuation mass returns
    // exactly d·n1r; the add-one closure spreads (B+V) across B + V)
    for (w1 <- c1.keys) {
      val de = BigInt(4) * c1(w1) * bv
      val nuSum = vocab.map { w2 =>
        BigInt(bv) * math.max(4L * big.getOrElse((w1, w2), 0) - 3L, 0L) +
          BigInt(3) * n1r(w1) * (n1l.getOrElse(w2, 0) + 1)
      }.sum
      assert(nuSum == de, s"history '$w1': sum $nuSum != $de")
    }
  }

  test("KN perplexity: held-out text (unseen words, unseen histories) " +
      "scores without error; self-scored output is partition-invariant") {
    import spark.implicits._
    val train = Seq((1L, "a b a b c"), (2L, "b c a a b")).toDF("doc_id", "text")
    val trainPairs = TextOps.bigramPairs(train, col("text"), col("doc_id"))
    // held-out: unseen bigram of seen history (c a...no, 'a c'), unseen
    // word entirely ('zz'), unseen history ('zz a')
    val held = Seq((9L, "a c zz a b")).toDF("doc_id", "text")
    val heldPairs = TextOps.bigramPairs(held, col("text"), col("doc_id"))
    val out = TextOps.knPerplexityFromPairs(heldPairs, trainPairs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(1) == 4 && r.getDouble(2) > 0.0 && r.getDouble(3) > 1.0)
    // self-scored partition invariance
    val docs = Tables.documents(spark, sf).limit(50)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.withKnPerplexity(d, col("text"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
          r.getDouble(3))).toSet
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("KN trigram perplexity: the interpolated distribution NORMALIZES " +
      "per seen history — the full-ladder numerators over the " +
      "vocabulary sum to exactly the denominator") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c a"), (2L, "b c a a b c"),
      (3L, "c c a b a b")).toDF("doc_id", "text")
    val ts = TextOps.trigramTuples(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val tri = ts.groupBy(identity).view.mapValues(_.size).toMap
    val hist = ts.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val n12r = tri.keys.toSeq.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size).toMap
    val cont = tri.keys.toSeq.map(t => (t._2, t._3)).distinct
    val ncont = tri.keys.toSeq.groupBy(t => (t._2, t._3)).view
      .mapValues(_.size).toMap
    val n12p = cont.groupBy(_._1).view
      .mapValues(ks => ks.map(k => ncont(k)).sum).toMap
    val nc = cont.groupBy(_._1).view.mapValues(_.size).toMap
    val n1l = cont.groupBy(_._2).view.mapValues(_.size).toMap
    val vocab = ts.flatMap(t => Seq(t._1, t._2, t._3)).distinct
    val bv = cont.size.toLong + vocab.size
    // nu = 4·n12p·bv·max(4c123−3,0) + 3·n12r·A2 with
    // A2 = bv·max(4·ncont−3,0) + 3·nc·(n1l+1); summed over w3 ∈ V the
    // seen mass returns 4·n12p·bv·(4c12−3·n12r), the backoff mass
    // returns 3·n12r·4·n12p·bv, total = 16·c12·n12p·bv = de
    for ((w1, w2) <- hist.keys) {
      val de = BigInt(16) * hist((w1, w2)) * n12p(w2) * bv
      val nuSum = vocab.map { w3 =>
        val a2 = BigInt(bv) *
          math.max(4L * ncont.getOrElse((w2, w3), 0) - 3L, 0L) +
          BigInt(3) * nc(w2) * (n1l.getOrElse(w3, 0) + 1)
        BigInt(4) * n12p(w2) * bv *
          math.max(4L * tri.getOrElse((w1, w2, w3), 0) - 3L, 0L) +
          BigInt(3) * n12r((w1, w2)) * a2
      }.sum
      assert(nuSum == de, s"history '($w1, $w2)': sum $nuSum != $de")
    }
  }

  test("KN trigram perplexity: held-out text walks the whole fallback " +
      "ladder without error; self-scored output is partition-invariant") {
    import spark.implicits._
    val train = Seq((1L, "a b a b c a"), (2L, "b c a a b c"))
      .toDF("doc_id", "text")
    val trainT = TextOps.trigramTuples(train, col("text"), col("doc_id"))
    // held-out ladder: seen trigram ('a b c'), unseen trigram of seen
    // history ('a b a' vs train... pick 'b c b'), unseen history with
    // seen middle ('c b x'), unseen middle entirely ('zz')
    val held = Seq((9L, "a b c b zz a b")).toDF("doc_id", "text")
    val heldT = TextOps.trigramTuples(held, col("text"), col("doc_id"))
    val out = TextOps.knTrigramPerplexityFromTuples(heldT, trainT).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(1) == 5 && r.getDouble(2) > 0.0 && r.getDouble(3) > 1.0)
    // self-scored partition invariance
    val docs = Tables.documents(spark, sf).limit(50)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.withKnTrigramPerplexity(d, col("text"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
          r.getDouble(3))).toSet
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
    // empty model/corpus: no null-scalar crash, empty output
    val et = TextOps.trigramTuples(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      col("text"), col("doc_id"))
    assert(TextOps.knTrigramPerplexityFromTuples(et, et).isEmpty)
  }

  test("packBinsSemantic: packs within the cluster shard — hand bins, " +
      "straddling doc spans two, unembedded docs don't pack, " +
      "partition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 50L))
      .toDF("doc_id", "n_tok")
    // doc 4 has no cluster assignment -> inner join drops it
    val clusters = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("doc_id", "cell")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.packBinsSemantic(d, col("doc_id"), col("n_tok"), clusters,
        512).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
    val out = run(docs)
    assert(out == Set(
      (1L, 0, 300L, 0L, 0L, 1L),   // [0, 300) in bin 0
      (2L, 0, 300L, 0L, 300L, 2L), // [300, 600) straddles bins 0-1
      (3L, 1, 100L, 0L, 0L, 1L)))  // own cluster restarts at bin 0
    assert(run(docs.repartition(5)) == out)
    intercept[IllegalArgumentException](
      TextOps.packBinsSemantic(docs, col("doc_id"), col("n_tok"),
        clusters, 0))
  }

  test("bm25Retrieve: both-terms doc outranks one-term doc, rarer term " +
      "scores higher at equal tf/dl, no-term docs absent, " +
      "partition-invariant") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple pear"),
      (2L, "banana cherry plum grape"),
      (3L, "durian durian durian durian"),
      (4L, "apple kiwi melon fig"),
      (5L, "kiwi melon fig grape")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana")).toDF("q_id", "qt")
    def run(c: org.apache.spark.sql.DataFrame) =
      TextOps.bm25Retrieve(c, col("text"), col("doc_id"), queries,
        col("qt"), col("q_id"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3)))
    val out = run(corpus)
    // doc 1 carries both terms (apple x2): rank 1; docs 2 and 4 carry
    // one each; doc 3/5 carry neither and never appear
    assert(out.map(_._2).toSet == Set(1L, 2L, 4L))
    assert(out.find(_._2 == 1L).get._3 == 1)
    assert(!out.exists(r => r._2 == 3L || r._2 == 5L))
    assert(run(corpus.repartition(7)).toSet == out.toSet)
    // idf monotonicity: 'apple' appears in 2 docs, 'banana' in 2...
    // use 'cherry' (df 1) vs 'grape' (df 2) on equal-tf equal-dl docs:
    // the rarer term's match must score strictly higher
    val q2 = Seq((200L, "cherry"), (201L, "grape")).toDF("q_id", "qt")
    val s2 = TextOps.bm25Retrieve(corpus, col("text"), col("doc_id"),
      q2, col("qt"), col("q_id"), k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
      .toMap
    assert(s2((200L, 2L)) > s2((201L, 2L)))
  }

  test("bm25Retrieve and knPerplexity: empty corpora produce empty " +
      "output, never a null-scalar crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val q = Seq((1L, "apple")).toDF("q_id", "qt")
    assert(TextOps.bm25Retrieve(empty, col("text"), col("doc_id"), q,
      col("qt"), col("q_id")).isEmpty)
    val ep = TextOps.bigramPairs(empty, col("text"), col("doc_id"))
    assert(TextOps.knPerplexityFromPairs(ep, ep).isEmpty)
  }

  test("matStream: widens a single-partition stream side to the " +
      "session's parallelism, leaves an already-wide input's " +
      "partitioning untouched") {
    import spark.implicits._
    val want = spark.sparkContext.defaultParallelism
    val narrow = (1L to 100L).toDF("x").coalesce(1)
    assert(VectorOps.matStream(narrow).rdd.getNumPartitions == want)
    val wide = (1L to 100L).toDF("x").repartition(want + 3)
    assert(VectorOps.matStream(wide).rdd.getNumPartitions == want + 3)
  }

  test("runStats: sorted-run fold equals the relational counts") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "a", "c", "a", "b"), // a×3, b×2, c×1
      Seq("x"),                          // single
      Seq.empty[String]                  // no grams
    ).toDF("g")
    val out = df.select(TextOps.runStats(col("g")).as("rs"))
      .select(col("rs.dup"), col("rs.top")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out(0) == ((5L, 3L))) // dup = 3+2 occurrences, top = 3
    assert(out(1) == ((0L, 1L)))
    assert(out(2) == ((0L, 0L)))
    // native ≡ HOF over real corpus grams (the A/B pin)
    val grams = Tables.documents(spark, sf)
      .select(TextOps.shingles(col("text"), 2, distinct = false).as("g"))
    val ab = grams.select(
      TextOps.runStats(col("g")).as("nat"),
      TextOps.runStatsHof(col("g")).as("hof"))
      .collect()
    assert(ab.nonEmpty)
    ab.foreach(r => assert(r.getStruct(0) == r.getStruct(1),
      s"native ${r.getStruct(0)} != hof ${r.getStruct(1)}"))
  }

  test("gopherReason fires rules in fixed order, first failure wins") {
    import spark.implicits._
    // (nTok, nAlpha, stopHits, top2Frac) → expected reason
    val cases = Seq(
      (10, 40, 5, 0.1, "word_count"),    // too short
      (60, 60, 5, 0.1, "word_length"),   // mean len 1 < 3
      (60, 240, 1, 0.1, "stopwords"),    // < 2 stop hits
      (60, 240, 5, 0.5, "repetition"),   // top2 over the cap
      (10, 10, 0, 0.9, "word_count"),    // all fail → first rule names it
      (60, 240, 5, 0.1, "ok"))
    val df = cases.toDF("n", "a", "s", "t", "want")
    val bad = df.select(col("want"),
        TextOps.gopherReason(col("n"), col("a"), col("s"), col("t"))
          .as("got"))
      .filter(col("want") =!= col("got"))
    assert(bad.count() == 0)
  }

  test("piiScrub redacts all three kinds; clean text is untouched") {
    import spark.implicits._
    val df = Seq(
      "mail bob.smith@corp.example now",
      "call 555-0134 or visit 10.1.2.3 today",
      "nothing sensitive here").toDF("t")
    val out = df.select(TextOps.piiScrub(col("t"))).as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "call <PHONE> or visit <IP> today")
    assert(out(2) == "nothing sensitive here")
  }

  test("sampleToMixture pulls the kept mix toward the target shares") {
    val docs = Tables.documents(spark, sf)
    val w = regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4 + 1
    val kept = TextOps.sampleToMixture(docs, col("doc_id"), col("source"), w)
    // deterministic: same rows on a second run
    assert(kept.select("doc_id").collect().toSet ==
      TextOps.sampleToMixture(docs, col("doc_id"), col("source"), w)
        .select("doc_id").collect().toSet)
    // a weight-1 source must keep at most as LARGE a fraction as a
    // weight-4 source (uniform input strata)
    val frac = kept.groupBy("source").count()
      .join(docs.groupBy("source").count()
        .withColumnRenamed("count", "n0"), "source")
      .withColumn("w",
        regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4 + 1)
      .withColumn("f", col("count") * lit(1.0) / col("n0"))
      .groupBy("w").agg(avg("f").as("f")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(frac(1) < frac(4))
  }

  test("randomProject is deterministic and JL-preserves relative " +
      "distances on average") {
    val emb = Tables.embeddings(spark, sf)
    val p = VectorOps.randomProject(emb, "embedding", 16, 64)
    assert(p.columns.count(_.startsWith("p")) >= 16)
    // deterministic matrix
    assert(VectorOps.rprojSigns(16, 64).map(_.toSeq) ==
      VectorOps.rprojSigns(16, 64).map(_.toSeq))
    assert(VectorOps.rprojSigns(16, 64).forall(_.forall(v =>
      v == 1.0f || v == -1.0f)))
    // E[||proj||²] = ||v||² under JL: the ratio distribution should
    // center near 1 (loose band — this is a sanity pin, not a proof)
    val ratio = p
      .withColumn("n2", VectorOps.dot(col("embedding"), col("embedding")))
      .withColumn("p2",
        (0 until 16).map(j => col(f"p$j%02d") * col(f"p$j%02d"))
          .reduce(_ + _))
      .agg(avg(col("p2") / col("n2"))).head().getDouble(0)
    assert(ratio > 0.5 && ratio < 1.5, s"JL energy ratio $ratio")
  }

  test("pqCodebooks: deterministic shapes; pqEncode codes in range") {
    val emb = Tables.embeddings(spark, sf)
    val books = VectorOps.pqCodebooks(emb, "vec_id", "embedding", 8, 4)
    assert(books.length == 8 && books.forall(_.length == 4) &&
      books.forall(_.forall(_.length == 8)))
    // total-order Lloyd: bit-identical on retrain
    val again = VectorOps.pqCodebooks(emb, "vec_id", "embedding", 8, 4)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      again.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = VectorOps.pqEncode(emb, "embedding", books)
      .select(col("pq_code")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == 8 && c.forall(x => x >= 0 && x < 4)))
  }

  test("pqTopK: trained-book ADC ranking overlaps brute-force top-k") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 20 === 0)
    val brute = VectorOps.bruteTopK(emb, q, "vec_id", "embedding", 5)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val pq = VectorOps.pqTopK(emb, q, "vec_id", "embedding", 5,
        m = 8, ksub = 16, iters = 6)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    // ADC is approximate (especially at this tiny training size): ask
    // only that the rankings are correlated, not equal — on average at
    // least one of five brute neighbours appears in the PQ five
    val overlaps = brute.keys.toSeq.map(k =>
      (brute(k) & pq.getOrElse(k, Set.empty)).size)
    assert(overlaps.sum.toDouble / overlaps.size >= 1.0,
      s"mean ADC/brute overlap ${overlaps.sum.toDouble / overlaps.size}")
  }

  test("ivfpqTopK: full probe equals flat PQ exactly; recall monotone in nProbe") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") % 50 === 0)
    val books = VectorOps.pqSeedBooks(8, 8, 8)
    val cents = VectorOps.ivfCentroids(emb, "vec_id", "embedding", 4)
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rnk", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // non-residual codes: full probe scores every pair with its flat-PQ
    // ADC distance — result sets are identical, ranks included
    val flat = collectSet(VectorOps.pqTopKWithBooks(
      emb, q, "vec_id", "embedding", 5, books))
    val full = collectSet(VectorOps.ivfpqTopKWithIndex(
      emb, q, "vec_id", "embedding", 5, nProbe = 4, cents, books))
    assert(full == flat)
    // partial probe: probed-cell lists are prefixes, candidates nest,
    // so flat-top-k hits can only grow with nProbe
    def hits(p: Int) = (collectSet(VectorOps.ivfpqTopKWithIndex(
      emb, q, "vec_id", "embedding", 5, nProbe = p, cents, books))
      intersect flat).size
    val h1 = hits(1); val h2 = hits(2)
    assert(h1 > 0)
    assert(h2 >= h1)
  }

  test("pqTopK fails fast on an oversized query side") {
    val emb = Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException] {
      VectorOps.pqTopKWithBooks(emb, emb, "vec_id", "embedding", 3,
        VectorOps.pqSeedBooks(8, 8, 8), maxQueryRows = 3)
    }
    assert(e.getMessage.contains("too large to broadcast"))
  }

  test("frame sampling covers the payload with the right stride") {
    val d = graft.operators.multimodal.Multimodal.withBlob(
      Tables.documents(spark, sf), col("text"))
    val frames = graft.operators.multimodal.Multimodal
      .frameSample(d, "blob", 100, 2)
    val r = frames.groupBy(col("doc_id"))
      .agg(max(col("frame_idx")).as("mx"), count(lit(1)).as("n"),
        first(col("blob_meta.n_bytes")).as("nb"))
      .withColumn("expected_mx",
        (floor((col("nb") - 1) / 100) / 2).cast("long") * 2)
      .filter(col("mx") =!= col("expected_mx"))
    assert(r.count() == 0)
  }

  test("dupGramStats: shared grams flagged, unique docs zero, sub-n excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),       // shares 'a b c d e' + 'b c d e f' with 2
      (2L, "a b c d e f"),       // exact copy
      (3L, "u v w x y z"),       // unique
      (4L, "too few")            // < 5 tokens
    ).toDF("doc_id", "text")
    val out = TextOps.dupGramStats(df, col("text"), col("doc_id"), n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(!out.contains(4L))
    assert(out(1L) == ((2, 2, 1.0)))
    assert(out(2L) == ((2, 2, 1.0)))
    assert(out(3L) == ((2, 0, 0.0)))
  }

  test("bm25TopK: doc with more query-term mass ranks first; " +
      "termless docs never appear") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark hash x y z"),
      (2L, "spark q r s t u"),
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(df, col("text"), col("doc_id"),
      Seq("spark", "hash"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // 3 scores zero
    assert(out(0).getDouble(1) > out(1).getDouble(1))
    assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1) // tf0, tf1
  }

  test("semDedup: lower-id survivor keeps, near-dup cluster-mate drops, " +
      "cross-cluster near-dups untouched") {
    import spark.implicits._
    val v = Array.fill(64)(0.0f); v(0) = 1.0f
    val v2 = v.clone(); v2(1) = 0.01f          // cos ~1 with v
    val w = Array.fill(64)(0.0f); w(1) = -1.0f // different cluster region
    val df = Seq((10L, v.toSeq), (20L, v2.toSeq), (30L, w.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val out = VectorOps.semDedup(df, "vec_id", "embedding", 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(10L)._2) // lowest id in its cluster: kept
    assert(out(10L)._1 == out(20L)._1) // sign bits agree -> same cluster
    assert(!out(20L)._2) // dropped against 10
    assert(out(30L)._2) // alone in its cluster
  }

  test("connectedComponents: chains close transitively, " +
      "components labeled by min id, maxIter caps propagation") {
    import spark.implicits._
    // a 4-chain (diameter 3 — needs >1 round), a pair, and edge order
    // that forces labels to travel backwards (4-3, 3-2, 2-1)
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // hard stop: one round can only move a label one hop
    val capped = Dedup.connectedComponents(pairs, maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(4L) == 3L && capped(3L) == 2L) // one hop per round
  }

  test("withQualityLr: single-token doc scores its exact hashed weight; " +
      "logit bounded; empty docs excluded") {
    import spark.implicits._
    val df = Seq((1L, "spark"), (2L, "spark spark"), (3L, "  "))
      .toDF("doc_id", "text")
    val out = TextOps.withQualityLr(df, col("text"))
      .select("doc_id", "n_tok", "lr_raw", "lr_prob")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(!out.contains(3L)) // no tokens: excluded, not NaN
    // mean of identical weights == the weight; uniform-hash bound
    assert(out(1L)._2 == out(2L)._2)
    assert(out(1L)._2 >= -1.0 && out(1L)._2 <= 1.0)
    // sigmoid of the rounded logit, monotone sanity
    assert(out(1L)._3 > 0.0 && out(1L)._3 < 1.0)
    assert((out(1L)._2 > 0) == (out(1L)._3 > 0.5))
  }

  test("bpePairs counts weighted char pairs; trainer merges " +
      "left-to-right and is deterministic") {
    import spark.implicits._
    val df = Seq("low low lower aaa").toDF("text")
    val pairs = TextOps.bpePairs(df, col("text"), k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'lo' and 'ow' appear in low(x2)+lower = 3; 'aa' twice within 'aaa'
    assert(pairs("lo") == 3 && pairs("ow") == 3)
    assert(pairs("aa") == 2)
    val merges = graft.operators.text.BpeTrainer.train(df, col("text"), 3)
    // ties at n=3 break lexicographically: (l,o) then merged (lo,w);
    // 'aaa' merges non-overlapping left-to-right later
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    assert(merges.size == 3)
    val again = graft.operators.text.BpeTrainer.train(df, col("text"), 3)
    assert(merges == again)
  }

  test("pin freshness: BpeTrainer.train(8) on sf0.01 still produces " +
      "the literal ruleset the text_bpe_encode query + oracle use") {
    val d = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val merges = graft.operators.text.BpeTrainer.train(d, col("text"), 8)
    assert(merges == graft.packs.LlmPack.bpePinnedRules,
      "pinned BPE ruleset is stale — retrain and repin")
  }

  test("BpeTrainer.encode applies trained merges: merged words collapse, " +
      "unseen suffixes stay char pieces") {
    import spark.implicits._
    val df = Seq((1L, "low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = graft.operators.text.BpeTrainer
      .encode(df, col("text"), col("doc_id"), merges)
      .orderBy("pos", "piece_idx")
      .select("pos", "piece").as[(Int, String)].collect().toSeq
    assert(out == Seq((0, "low"), (1, "low"), (1, "e"), (1, "r")))
  }

  test("matryoshka: truncated vectors are unit-norm; prefix preserved") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val m = graft.operators.vector.VectorOps
      .matryoshka(emb, "embedding", 16)
    val rows = m.select(col("vec_id"), col("embedding"), col("m_vec"))
      .limit(10).collect()
    rows.foreach { r =>
      val full = r.getSeq[Float](1)
      val mv = r.getSeq[Double](2)
      assert(mv.length == 16)
      val n = math.sqrt(mv.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6) // float components, double norm
      // direction preserved: same sign pattern as the raw prefix
      full.take(16).zip(mv).foreach { case (f, d) =>
        assert(f.toDouble.sign == d.sign || f == 0f)
      }
    }
  }

  test("hammingTopK: self excluded, distances ordered, guard trips") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val out = graft.operators.vector.VectorOps
      .hammingTopK(emb, emb.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", 3)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.forall(_.getAs[Long]("vec_id") != q))
      val byRank = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Int]("ham"))
      assert(byRank.sorted.sameElements(byRank)) // rank follows distance
    }
    intercept[IllegalArgumentException] {
      graft.operators.vector.VectorOps.hammingTopK(
        emb, emb, "vec_id", "embedding", 3, maxQueryRows = 10)
    }
  }

  test("heavyHitters: no false negatives; est >= exact; wide = exact") {
    val docs = graft.core.Tables.documents(spark, sf)
    val thr = 50L
    val got = graft.operators.text.Sketches
      .heavyHitters(docs, col("text"), thr, depth = 3, width = 8)
      .collect()
    // every row honors the sketch's one-sided error
    got.foreach(r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact")))
    // the exact heavy set, computed directly — candidate nomination via
    // the tight 3x8 sketch must not have lost any of them
    val direct = docs
      .select(explode(graft.operators.text.TextOps.tokens(col("text")))
        .as("tok"))
      .groupBy("tok").count().filter(col("count") >= thr)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(_.getAs[String]("token")).toSet == direct.keySet)
    got.foreach(r =>
      assert(r.getAs[Long]("exact") == direct(r.getAs[String]("token"))))
    // a collision-free width: estimates collapse to the exact counts
    val wide = graft.operators.text.Sketches
      .heavyHitters(docs, col("text"), thr, depth = 3, width = 4096)
      .collect()
    wide.foreach(r =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("exact")))
  }

  test("chatSpans: every span slices its exact content out of the " +
      "renderChat transcript") {
    val ev = graft.core.Tables.events(spark, sf)
    val t = graft.operators.text.TextOps.renderChat(ev, col("user_id"),
      Seq(col("ts_ms"), col("event_id")), col("event_type"), col("props"))
      .collect().map(r => r.getAs[Long]("conv_id") ->
        r.getAs[String]("transcript")).toMap
    val spans = graft.operators.text.TextOps.chatSpans(ev, col("user_id"),
      Seq(col("ts_ms"), col("event_id")), col("event_type"), col("props"))
      .collect()
    assert(spans.nonEmpty)
    // independent truth: content per (conv, order) from the raw rows
    val raw = ev.select(col("user_id"), col("ts_ms"), col("event_id"),
        coalesce(col("props").cast("string"), lit("")).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getString(3))
      .toMap
    val orderByConv = raw.keys.groupBy(_._1).map { case (u, ks) =>
      u -> ks.toSeq.sortBy(k => (k._2, k._3)).map(raw)
    }
    spans.foreach { r =>
      val conv = r.getAs[Long]("conv_id")
      val (s, e) = (r.getAs[Long]("start_pos").toInt,
        r.getAs[Long]("end_pos").toInt)
      val got = t(conv).substring(s, e)
      assert(got == orderByConv(conv)(r.getAs[Int]("turn") - 1))
    }
  }

  test("upsampleToMixture: copy counts hit floor/ceil of the rate; " +
      "deterministic; copies contiguous") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = graft.operators.text.TextOps.upsampleToMixture(docs,
      col("doc_id"), col("lang"),
      when(col("lang") === "en", 1.0).otherwise(4.0), 2.0)
      .select("doc_id", "lang", "copy").collect()
    // per doc: copies are 0..r-1 contiguous
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val cs = rs.map(_.getAs[Long]("copy")).sorted
      assert(cs.sameElements(cs.indices.map(_.toLong)))
    }
    // per stratum: every doc's copy count is floor(rate) or ceil(rate)
    val rates = graft.operators.text.TextOps.upsampleRates(docs,
      col("lang"), when(col("lang") === "en", 1.0).otherwise(4.0), 2.0)
      .collect().map(r => r.getAs[String]("_s") ->
        r.getAs[Double]("_rate")).toMap
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.length }
    byDoc.foreach { case (d, n) =>
      val r = rates(langOf(d))
      assert(n == math.floor(r).toLong || n == math.ceil(r).toLong)
    }
    // rerun is byte-identical
    val again = graft.operators.text.TextOps.upsampleToMixture(docs,
      col("doc_id"), col("lang"),
      when(col("lang") === "en", 1.0).otherwise(4.0), 2.0)
      .select("doc_id", "lang", "copy").collect()
    assert(out.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("spanCorrupt: splicing targets back into inputs reconstructs " +
      "every document; rate 0 is the identity") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.text.TextOps.spanCorrupt(docs,
      col("text"), col("doc_id"), 150000, 3)
      .join(docs.select(col("doc_id"),
        concat_ws(" ", split(trim(col("text")), "\\s+")).as("orig")),
        Seq("doc_id"))
      .collect()
    assert(out.nonEmpty && out.exists(_.getAs[Int]("n_spans") > 0))
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { r =>
      val n = r.getAs[Int]("n_spans")
      val input = r.getAs[String]("input_text")
      val target = r.getAs[String]("target_text")
      if (n == 0) assert(target == "" && input == r.getAs[String]("orig"))
      else {
        // target = <id_0> span0 … <id_{n-1}> span_{n-1} <id_n>
        assert(target.endsWith(s"<extra_id_$n>"))
        val spans = sentinel.split(target.stripSuffix(s" <extra_id_$n>"))
          .map(_.trim).drop(1) // leading empty before <extra_id_0>
        assert(spans.length == n)
        var rebuilt = input
        for (k <- 0 until n)
          rebuilt = rebuilt.replace(s"<extra_id_$k>", spans(k))
        assert(rebuilt == r.getAs[String]("orig"),
          s"doc ${r.getAs[Long]("doc_id")} failed to reconstruct")
      }
    }
    // rate 0: identity input, empty target
    val id0 = graft.operators.text.TextOps.spanCorrupt(docs,
      col("text"), col("doc_id"), 0, 3)
      .agg(sum(col("n_spans")), count(when(col("target_text") =!= "", 1)))
      .collect()(0)
    assert(id0.getLong(0) == 0L && id0.getLong(1) == 0L)
  }

  test("fimTransform: prefix+middle+suffix reassembles every doc; cut " +
      "points bounded") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.text.TextOps.fimTransform(docs,
      col("text"), col("doc_id"))
      .join(docs.select(col("doc_id"),
        concat_ws(" ", split(trim(col("text")), "\\s+")).as("orig")),
        Seq("doc_id"))
      .collect()
    assert(out.nonEmpty)
    val pat = ("(?s)^<fim_prefix> (.*) <fim_suffix> (.*) " +
      "<fim_middle> (.*)$").r
    out.foreach { r =>
      val (n, c1, c2) = (r.getAs[Int]("n_tok"), r.getAs[Int]("c1"),
        r.getAs[Int]("c2"))
      assert(0 <= c1 && c1 <= c2 && c2 <= n)
      r.getAs[String]("fim_text") match {
        case pat(p, sfx, m) =>
          val rebuilt = Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
          assert(rebuilt == r.getAs[String]("orig"),
            s"doc ${r.getAs[Long]("doc_id")} failed to reassemble")
        case other => fail(s"bad fim format: $other")
      }
    }
  }

  test("whiten: hand-computed z-scores; zero-variance dim whitens to 0") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(0.0f, 5.0f)),
      (2L, Seq(2.0f, 5.0f))).toDF("vec_id", "vec")
    val z = graft.operators.vector.VectorCuration
      .whiten(rows, "vec_id", "vec")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[String]("z_nano")).toMap
    // dim0: mean 1, sd 1 → z = ∓1e9; dim1 constant → 0
    assert(z == Map(1L -> "-1000000000,0", 2L -> "1000000000,0"))
  }

  test("pca: covarianceFixed + pcaPowerTop + pcaProject reach the " +
      "hand-computed fixed point on a 3-dim line") {
    import spark.implicits._
    val V = graft.operators.vector.VectorCuration
    // rows on the line (t, t/10, 0): principal direction is the
    // axis-0-dominant (1, 0.1, 0); all three stages hand-computable
    val rows = Seq(-2, -1, 0, 1, 2).map(t =>
      (t.toLong, Seq(t.toFloat, t / 10.0f, 0.0f))).toDF("vec_id", "vec")
    val cov = V.covarianceFixed(rows, "vec")
    val cm = cov.collect().map(r => (r.getAs[Int]("i"),
      r.getAs[Int]("j")) -> r.getAs[Double]("cov")).toMap
    assert(cm((0, 0)) == 2.0 && cm((0, 1)) == 0.2 &&
      cm((1, 0)) == 0.2 && cm((1, 1)) == 0.02 &&
      cm((2, 2)) == 0.0 && cm((0, 2)) == 0.0)
    val v = V.pcaPowerTop(cov, 3, 3).collect()
      .map(r => r.getAs[Int]("i") -> r.getAs[Long]("v_nano")).toMap
    // fixed point of the integer iteration: L∞-normalized (1, 0.1, 0)
    // with component 1 one sub-nano trunc below 10⁸ — the exact
    // trunc-toward-zero arithmetic the oracle replays
    assert(v == Map(0 -> 1000000000L, 1 -> 99999999L, 2 -> 0L))
    val proj = V.pcaProject(rows, "vec_id", "vec",
        V.pcaPowerTop(cov, 3, 3)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("proj_micro"))
      .toMap
    // proj_micro = (1e6·t·1e9 + 1e5·t·99999999) div 1e9
    //            = trunc(1009999.9999·t)
    assert(proj == Map(-2L -> -2019999L, -1L -> -1009999L, 0L -> 0L,
      1L -> 1009999L, 2L -> 2019999L))
  }

  test("multimodal nearDupPairs: frame-set Jaccard from constructed " +
      "blobs; disjoint payloads never pair") {
    import spark.implicits._
    val M = graft.operators.multimodal.Multimodal
    val docs = Seq(
      (1L, "X" * 256 + "Y" * 256),
      (2L, "X" * 256 + "Z" * 256),
      (3L, "Q" * 512)).toDF("doc_id", "body")
    val out = M.nearDupPairs(M.withBlob(docs, col("body")), "blob",
      col("doc_id"), 256, 1, 0.2)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("inter"), r.getAs[Double]("jac")))
    // A={X,Y}, B={X,Z}: inter 1, jac 1/(2+2-1); C={Q} pairs nothing
    assert(out.toSeq == Seq((1L, 2L, 1, 0.333333)))
  }

  test("spanDedup: duplicated three-sentence span keeps the min-doc " +
      "occurrence; short docs pass whole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "S one here. S two here. S three here. Unique tail A."),
      (2L, "S one here. S two here. S three here. Unique tail B."),
      (3L, "Too short. Only two.")).toDF("doc_id", "body")
    val out = graft.operators.text.TextOps.spanDedup(docs,
      col("body"), col("doc_id"), 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_sent"), r.getAs[Int]("n_drop"),
          r.getAs[String]("clean_text")))).toMap
    // doc 1 is the keep-min occurrence of the shared span — untouched;
    // doc 2 drops exactly the three shared sentences; doc 3 has no
    // 3-window and passes whole
    assert(out(1L) == ((4, 0,
      "S one here. S two here. S three here. Unique tail A.")))
    assert(out(2L) == ((4, 3, "Unique tail B.")))
    assert(out(3L) == ((2, 0, "Too short. Only two.")))
  }

  test("editDupPairs: near-rewrites pair with the exact edit distance; " +
      "prefix bound caps the kernel") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the quiet woods tonight"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")),   // 1 substitution
      (3L, "completely different text about spark structured streaming " +
        "with nothing shared at all in any shingle")).toDF("doc_id", "body")
    val pairs = graft.operators.text.Dedup.editDupPairs(docs,
      col("body"), col("doc_id"), maxDist = 10)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("dist")))
    assert(pairs.toSeq == Seq((1L, 2L, 1)))
    // the prefix bound truncates the compared text: with prefixLen
    // before the edit site, the pair collapses to distance 0
    val pre = graft.operators.text.Dedup.editDupPairs(docs,
      col("body"), col("doc_id"), maxDist = 10, prefixLen = 4)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("dist")))
    assert(pre.toSeq == Seq((1L, 2L, 0)))
  }

  test("invertedIndex: tf and positions from a constructed doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c a"), (2L, "b b")).toDF("doc_id", "text")
    val idx = graft.operators.text.TextOps.invertedIndex(docs,
      col("text"), col("doc_id")).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[String]("positions"))).toMap
    assert(idx(("a", 1L)) == ((3L, "1,3,5")))
    assert(idx(("b", 1L)) == ((1L, "2")))
    assert(idx(("c", 1L)) == ((1L, "4")))
    assert(idx(("b", 2L)) == ((2L, "1,2")))
    assert(idx.size == 4)
  }

  test("winnow: shared-run guarantee, density bound, tie rule") {
    import spark.implicits._
    val w = 4
    // doc 1 and 2 share a 10-token run (>= w + 2 = 6): they MUST share
    // a selected fingerprint (the Schleimer guarantee)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two $shared three four five six"),
      (2L, s"nine eight seven $shared"),
      (3L, "completely different words everywhere nothing matches at all")
    ).toDF("doc_id", "text")
    val fps = graft.operators.text.Dedup.winnow(docs, col("text"),
      col("doc_id"), w).collect()
    def fpsOf(d: Long) = fps.filter(_.getAs[Long]("doc_id") == d)
      .map(_.getAs[Long]("fp")).toSet
    assert((fpsOf(1L) intersect fpsOf(2L)).nonEmpty)
    assert((fpsOf(1L) intersect fpsOf(3L)).isEmpty)
    // density: selected positions are a strict subset of gram positions
    val grams1 = 13 - 2 // doc 1 token count - 2
    val sel1 = fps.filter(_.getAs[Long]("doc_id") == 1L)
    assert(sel1.length < grams1 && sel1.nonEmpty)
    // every window of w grams contains a selected position (coverage)
    val pos1 = sel1.map(_.getAs[Int]("pos")).sorted
    (1 to (grams1 - w + 1)).foreach { i =>
      assert(pos1.exists(p => p >= i && p < i + w),
        s"window at $i has no selected fingerprint")
    }
    // matches report: (1, 2) is the only pair
    val pairs = graft.operators.text.Dedup.winnowMatches(
      graft.operators.text.Dedup.winnow(docs, col("text"),
        col("doc_id"), w)).collect()
    assert(pairs.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      == Set((1L, 2L)))
  }

  test("c4Filter: each rule fires on its constructed case") {
    import spark.implicits._
    val docs = Seq(
      // 1: good two lines + one unterminated line (dropped)
      (1L, "one two three.\nfour five six seven!\nno terminal punct"),
      // 2: short line dropped by word count, one good line -> under
      //    minLines(2), doc dropped
      (2L, "too short.\nthis line is long enough to survive."),
      // 3: line-blocklist drops the middle line
      (3L, "keep me alive today.\nenable javascript to continue here.\nanother good line stays!"),
      // 4: doc-blocklist ('{') kills the whole doc
      (4L, "var x = { a\nperfectly fine line one.\nperfectly fine line two."),
      // 5: quote-terminated counts as terminal punctuation
      (5L, "he said \"hello there.\"\nshe replied with a wave.")
    ).toDF("doc_id", "text")
    val out = graft.operators.text.TextOps.c4Filter(docs, col("text"),
        minWords = 3, lineBlock = Seq("javascript"), docBlock = Seq("{"),
        minLines = 2)
      .select("doc_id", "clean_text", "n_lines", "n_kept")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out.keySet == Set(1L, 3L, 5L)) // 2 under minLines, 4 doc-blocked
    assert(out(1L) == (("one two three.\nfour five six seven!", 3, 2)))
    assert(out(3L) ==
      (("keep me alive today.\nanother good line stays!", 3, 2)))
    assert(out(5L)._3 == 2)
  }

  test("spanTrim: keeper kept, dupes cut, short and full-dup docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // keeper of both grams (min doc id)
      (2L, "a b c d e x"),   // shares gram 'a b c d e' -> pos 1-5 cut
      (3L, "p q"),           // below n: passes through untouched
      (4L, "a b c d e f")    // byte-identical to 1: fully cut
    ).toDF("doc_id", "text")
    val out = TextOps.spanTrim(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((6, 0, "a b c d e f"))) // keeper untouched
    assert(out(2L) == ((6, 5, "x")))
    assert(out(3L) == ((2, 0, "p q")))
    assert(out(4L) == ((6, 6, "")))
  }

  test("hllEstimate: hand-pinned integer estimator, both branches; " +
      "hllDistinct partition-invariant and within documented error") {
    import spark.implicits._
    import graft.operators.text.Sketches
    // hand-constructed register table (p=4, m=16): buckets 0..3 hold
    // regs 1..4, the other 12 empty. znz = Σ2^(26−reg) = 62914560,
    // z_inv = znz + 12·2^26 = 868220928, est_raw =
    // ((673·256)<<26) // z_inv // 1000 = 13 ≤ 5m/2 and v>0 → linear
    // counting: (16·(lnNano(16)−lnNano(12))) // 1e9 = 4.
    val regs = Seq((0, 1), (1, 2), (2, 3), (3, 4)).toDF("bucket", "reg")
    val est = Sketches.hllEstimate(regs, Seq.empty, 4).collect()(0)
    assert(est.getAs[Int]("n_used") == 4)
    assert(est.getAs[Int]("v_zero") == 12)
    assert(est.getAs[Long]("est_raw") == 13L)
    assert(est.getAs[Long]("est") == 4L)
    // raw branch: all registers at 1 (dense) -> est_raw kept as est
    val dense = (0 until 16).map(b => (b, 1)).toDF("bucket", "reg")
    val d = Sketches.hllEstimate(dense, Seq.empty, 4).collect()(0)
    assert(d.getAs[Int]("v_zero") == 0)
    assert(d.getAs[Long]("est") == d.getAs[Long]("est_raw"))
    // end-to-end: 10k distinct ids, m=64 -> RSE ~1.04/8 = 13%; assert
    // within 3 RSE, and bit-identical across partitionings (registers
    // are max-merged, so the sketch is partitioning-free by algebra)
    val ids = (1 to 10000).map(i => s"id_$i").toDF("v")
    val e1 = Sketches.hllDistinct(ids.repartition(1), col("v"), Seq.empty, 6)
      .collect()(0).getAs[Long]("est")
    val e13 = Sketches.hllDistinct(ids.repartition(13), col("v"), Seq.empty, 6)
      .collect()(0).getAs[Long]("est")
    assert(e1 == e13)
    assert(math.abs(e1 - 10000L) < 4000, s"est $e1 too far from 10000")
    // sketch UNION is register max-merge: registers built on disjoint
    // halves, max-merged, estimate identically to the whole — the
    // per-day-sketches-answer-any-range algebra (and the streaming
    // story: micro-batch registers max-merge into the running state)
    val (ha, hb) = (ids.filter(col("v") < "id_5"), ids.filter(col("v") >= "id_5"))
    val merged = Sketches.hllEstimate(
      Sketches.hllRegisters(ha, col("v"), Seq.empty, 6)
        .unionByName(Sketches.hllRegisters(hb, col("v"), Seq.empty, 6))
        .groupBy(col("bucket")).agg(max(col("reg")).as("reg")),
      Seq.empty, 6).collect()(0).getAs[Long]("est")
    assert(merged == e1)
  }

  test("hyperBall: path-graph balls near-exact in the LC regime; " +
      "source node stays at zero; partition-invariant") {
    import spark.implicits._
    import graft.operators.graph.GraphOps
    // path 1 -> 2 -> 3 -> 4: exact in-balls |B_t(4)| = t, |B_*(1)| = 0
    // (beyond self). At m=64 and <=3 elements the linear-counting
    // branch is near-exact, so estimates sit within +/-1 of truth.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = GraphOps.hyperBall(e, 3, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (b0, b1, b2, b3, harm) = out(4L)
    assert(b0 == 1L)                       // B_0 = {self}
    assert(math.abs(b1 - 1 - 1) <= 1 && math.abs(b2 - 1 - 2) <= 1 &&
      math.abs(b3 - 1 - 3) <= 1)           // ball incl. self ~ t+1
    assert(harm >= 1000L)                  // at least the depth-1 term
    assert(out(1L)._5 == 0L)               // nothing reaches the source
    assert(out(1L)._1 == 1L && out(1L)._4 == 1L)
    // determinism across partitionings (register algebra)
    val out7 = GraphOps.hyperBall(e.repartition(7), 3, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(out.map { case (k, v) => k -> v._5 } == out7)
  }

  test("topTokens: counts, deterministic tie-break, k cut") {
    import spark.implicits._
    val docs = Seq(
      ("en", "b b b a a c"), ("en", "a c"),
      ("de", "x y")).toDF("lang", "text")
    // en: a=3, b=3, c=2 -> ties (3,3) break by token: a rank 1, b rank 2
    val out = TextOps.topTokens(docs, col("text"), col("lang"), "lang", 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getInt(3))).toSet
    assert(out == Set(
      ("en", "a", 3L, 1), ("en", "b", 3L, 2),
      ("de", "x", 1L, 1), ("de", "y", 1L, 2)))
  }

  test("histQuantiles: hand-computed buckets and ranks; partition " +
      "invariance; error inside the 2^-mb bound") {
    import spark.implicits._
    import graft.operators.text.Sketches
    // values 1,2,4,8 -> q = v*1e6; each lands in its own (sh, kh=30)
    // bucket: lo(1e6) = 30<<15 = 983040, lo(2e6) = 30<<16 = 1966080,
    // lo(8e6) = 30<<18 = 7864320. n=4: p=1 -> rank 1 -> first lo;
    // p=500 -> rank 2 -> second lo (offset 0 inside the bucket);
    // p=1000 -> rank 4 -> fourth lo.
    val df = Seq(1.0, 2.0, 4.0, 8.0).toDF("x").withColumn("g", lit("a"))
    val out = Sketches.histQuantiles(df, col("x"), Seq("g" -> col("g")),
        Seq(1, 500, 1000))
      .collect().map(r => r.getAs[Int]("p_milli") ->
        r.getAs[Long]("est_micro")).toMap
    assert(out(1) == 983040L)
    assert(out(500) == 1966080L)
    assert(out(1000) == 7864320L)
    // partition invariance + error bound on a spread-out set
    val vals = (1 to 2000).map(i => (i * 37 % 997) + 1.0)
    def est(parts: Int) = Sketches.histQuantiles(
      vals.toDF("x").repartition(parts).withColumn("g", lit("a")),
      col("x"), Seq("g" -> col("g")), Seq(500, 900, 990))
      .collect().map(r => r.getAs[Int]("p_milli") ->
        r.getAs[Long]("est_micro")).toMap
    val (e1, e7) = (est(1), est(7))
    assert(e1 == e7)
    val sorted = vals.sorted
    Seq(500, 900, 990).foreach { p =>
      val exact = sorted(math.ceil(sorted.size * p / 1000.0).toInt - 1)
      val rel = math.abs(e1(p) / 1e6 - exact) / exact
      assert(rel <= 1.0 / 16 + 0.001, s"p=$p rel=$rel")
    }
  }

  test("corpusJaccardEst: identical snapshots at 1.0; known overlap " +
      "exact; estimate consistent with match count") {
    import spark.implicits._
    val same = Seq(
      (0L, "w1 w2 w3 w4 w5"), (1L, "w1 w2 w3 w4 w5"),
      (2L, "z1 z2 z3 z4"), (3L, "z1 z2 z3 z4")
    ).toDF("doc_id", "text")
    val r = Dedup.corpusJaccardEst(same, col("text"), col("doc_id") % 2)
      .collect()(0)
    assert(r.getAs[Int]("matches") == 8)
    assert(r.getAs[Long]("jac_est_ppm") == 1000000L)
    assert(r.getAs[Long]("jac_exact_ppm") == 1000000L)
    // A: {a b c, b c d}; B: {a b c, b c e} -> inter 1, union 3
    val mix = Seq((0L, "a b c d"), (1L, "a b c e")).toDF("doc_id", "text")
    val m = Dedup.corpusJaccardEst(mix, col("text"), col("doc_id") % 2)
      .collect()(0)
    assert(m.getAs[Long]("jac_exact_ppm") == 333333L)
    assert(m.getAs[Long]("jac_est_ppm") ==
      m.getAs[Int]("matches") * 1000000L / 8)
  }
}
