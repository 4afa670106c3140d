package graft

import graft.core.Sessions
import graft.operators.text.WordPiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece greedy longest-match-first: hand-vocab pins (asymmetric
  * initial/continuation inventories, greedy precedence, [UNK] paths),
  * a Scala-reference equivalence sweep on the corpus, and partition
  * invariance.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "wordpiece-test")

  private def enc(docs: org.apache.spark.sql.DataFrame,
      vocab: Seq[String]): Seq[(Long, Int, Int, String)] =
    WordPiece.encode(docs, col("text"), col("doc_id"), vocab)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
        r.getAs[Int]("piece_idx"), r.getAs[String]("piece")))
      .toSeq.sortBy(t => (t._1, t._2, t._3))

  /** Scala reference replay of the greedy scan. */
  private def ref(word: String, vocab: Set[String],
      maxPieceLen: Int = 6, maxWordLen: Int = 12): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    if (word.length > maxWordLen) return Seq("[UNK]")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < word.length) {
      val hit = (math.min(maxPieceLen, word.length - pos) to 1 by -1)
        .iterator.map { l =>
          val s = word.substring(pos, pos + l)
          if (pos == 0) s else "##" + s
        }.find(vocab.contains)
      hit match {
        case Some(p) =>
          out += p
          pos += (if (pos == 0) p.length else p.length - 2)
        case None => return Seq("[UNK]")
      }
    }
    out.toSeq
  }

  test("asymmetric inventories: initial and continuation independent") {
    import spark.implicits._
    val vocab = Seq("un", "##able", "able", "b")
    val docs = Seq((0L, "unable able bun")).toDF("doc_id", "text")
    val got = enc(docs, vocab)
    assert(got == Seq(
      (0L, 0, 0, "un"), (0L, 0, 1, "##able"),
      (0L, 1, 0, "able"),
      (0L, 2, 0, "[UNK]"))) // '##un' is not in the vocabulary
  }

  test("greedy prefers the longest match") {
    import spark.implicits._
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val got = enc(docs, Seq("a", "aa", "##a", "##aa"))
    assert(got.map(_._4) == Seq("aa", "##a"))
  }

  test("over-long words and matchless words become [UNK]") {
    import spark.implicits._
    val docs = Seq((0L, "abcdefghijklm zz a")).toDF("doc_id", "text")
    val got = enc(docs, Seq("a", "b", "##b"))
    assert(got.map(t => (t._2, t._4)) ==
      Seq((0, "[UNK]"), (1, "[UNK]"), (2, "a")))
  }

  test("matches the Scala reference on corpus words (%97 docs)") {
    val vocab = graft.packs.LlmPack.wordpieceVocab
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 97 === 0)
    val got = enc(docs, vocab)
    assert(got.nonEmpty)
    val vset = vocab.toSet
    val words = docs.select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+"))
          .as(Seq("pos", "w")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
        r.getAs[String]("w")))
    val expect = words.flatMap { case (d, p, w) =>
      ref(w, vset).zipWithIndex.map { case (pc, i) => (d, p, i, pc) }
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    assert(got == expect)
  }

  test("partition-count-invariant") {
    val vocab = graft.packs.LlmPack.wordpieceVocab
    val docs = graft.core.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 97 === 0)
    val a = enc(docs.repartition(2), vocab)
    val b = enc(docs.repartition(16), vocab)
    assert(a == b)
  }
}
