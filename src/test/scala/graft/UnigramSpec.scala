package graft

import graft.core.{Sessions, Tables}
import graft.operators.text.UnigramTrainer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (Kudo 2018, hard-EM over the vocabulary
  * table): Viterbi semantics, training determinism, coverage, and the
  * encode join's corpus reconstruction.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "unigram-test")
  val sf = "/root/testdata/sf0.001"

  test("viterbi: picks the max-probability segmentation") {
    val lp = Map("ab" -> -1.0, "c" -> -2.0, "a" -> -3.0, "b" -> -3.0,
      "abc" -> -9.0)
    // ab+c = -3 beats abc = -9 and a+b+c = -8
    assert(UnigramTrainer.viterbi("abc", lp, 6) == Seq("ab", "c"))
    // tie-break: equal-score paths prefer the LONGER last piece
    val tie = Map("aa" -> -2.0, "a" -> -1.0)
    assert(UnigramTrainer.viterbi("aa", tie, 6) == Seq("aa"))
    // unreachable word trips the coverage invariant loudly
    intercept[IllegalArgumentException] {
      UnigramTrainer.viterbi("xy", Map("x" -> -1.0), 6)
    }
  }

  test("viterbiUnk: held-out characters emit <unk> and never displace " +
      "a feasible real segmentation (the sf1 'key1' regression)") {
    val lp = Map("ab" -> -1.0, "c" -> -2.0, "a" -> -3.0, "b" -> -3.0,
      "key" -> -1.5, "k" -> -4.0, "e" -> -4.0, "y" -> -4.0)
    val unk = UnigramTrainer.unkLpFor(lp.toSeq)
    // a digit outside the vocab tokenizes instead of throwing
    assert(UnigramTrainer.viterbiUnk("key1", lp, 6, unk) ==
      Seq("key", UnigramTrainer.UnkPiece))
    // fully covered words segment EXACTLY as the strict DP does
    assert(UnigramTrainer.viterbiUnk("abc", lp, 6, unk) ==
      UnigramTrainer.viterbi("abc", lp, 6))
    // unk is last-resort: a feasible 1-char real piece always wins
    assert(UnigramTrainer.viterbiUnk("c", lp, 6, unk) == Seq("c"))
    // an entirely unknown word becomes one <unk> per character
    assert(UnigramTrainer.viterbiUnk("zq", lp, 6, unk) ==
      Seq(UnigramTrainer.UnkPiece, UnigramTrainer.UnkPiece))
  }

  test("train: deterministic, chars always covered, vocab bounded") {
    val docs = Tables.documents(spark, sf)
    val m1 = UnigramTrainer.train(docs, col("text"), vocabSize = 40,
      seedSize = 128, emIters = 3)
    val m2 = UnigramTrainer.train(docs, col("text"), vocabSize = 40,
      seedSize = 128, emIters = 3)
    assert(m1 == m2) // byte-identical across runs
    val pieces = m1.map(_._1).toSet
    // every character of every corpus word is a piece (coverage)
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= " " && col("c") =!= "")
      .distinct().collect().map(_.getString(0)).toSet
    chars.foreach(c => assert(pieces(c), s"missing char piece '$c'"))
    // log-probs are a (sub-)distribution: all negative
    assert(m1.forall(_._2 < 0))
  }

  test("viterbi property: reassembly + optimality vs brute enumeration") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word: Gen[String] = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen: Gen[Map[String, Double]] = for {
      extra <- Gen.listOfN(6, for {
        n <- Gen.choose(2, 4)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
        p <- Gen.choose(-5.0, -0.5)
      } yield cs.mkString -> p)
      cp <- Gen.choose(-6.0, -1.0)
    } yield (Seq("a", "b", "c").map(_ -> cp) ++ extra).toMap
    // brute force: enumerate every segmentation, max total log-prob
    def bruteBest(w: String, lp: Map[String, Double]): Double = {
      if (w.isEmpty) 0.0
      else (1 to math.min(6, w.length)).flatMap { l =>
        lp.get(w.substring(0, l))
          .map(_ + bruteBest(w.substring(l), lp))
      }.maxOption.getOrElse(Double.NegativeInfinity)
    }
    val p = Prop.forAll(word, vocabGen) { (w, lp) =>
      val seg = UnigramTrainer.viterbi(w, lp, 6)
      val score = seg.map(lp).sum
      seg.mkString("") == w &&
        math.abs(score - bruteBest(w, lp)) < 1e-9
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("encode: pieces concatenate back to every word of the corpus") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val model = UnigramTrainer.train(docs, col("text"), vocabSize = 48,
      seedSize = 128, emIters = 2)
    val enc = UnigramTrainer.encode(docs, col("text"), col("doc_id"),
      model)
    // reassemble each (doc, pos) word from its pieces and compare with
    // the direct tokenization
    val rebuilt = enc.groupBy("doc_id", "pos")
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("piece_idx"), col("piece"))))
        .getField("piece")).as("w"))
    val direct = docs.select(col("doc_id"),
      posexplode(graft.operators.text.TextOps.tokens(col("text")))
        .as(Seq("pos", "w")))
    val mismatch = rebuilt.join(direct, Seq("doc_id", "pos"))
      .filter(rebuilt("w") =!= direct("w")).count()
    assert(mismatch == 0)
    assert(rebuilt.count() == direct.count())
  }

  test("pin freshness: train() on sf0.01 still produces the literal " +
      "(piece, score_nano) table the text_unigram_encode oracle uses") {
    // the query + DuckDB oracle replay PINNED literals (no libm in the
    // compared path); this test is what keeps the pin honest — if
    // training semantics change, it fails HERE, not as a silent model
    // drift behind a still-green oracle row
    val d = Tables.documents(spark, "/root/testdata/sf0.01")
    val trained = UnigramTrainer.train(d, col("text"), vocabSize = 48,
      seedSize = 256, maxPieceLen = 6, emIters = 4)
      .map { case (p, lp) => p -> math.round(lp * 1e9) }
    assert(trained == graft.packs.LlmPack.unigramPinnedPieces,
      s"pinned unigram pieces are stale — retrain and repin")
  }
}
