package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev-only (test scope): dump the unigram piece table train() produces
  * on sf0.01 so its (piece, score_nano) rows can be pinned as literals
  * in the text_unigram_encode query + oracle (the text_bpe_encode
  * pinned-ruleset convention).
  */
object DumpPieces {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "dump-pieces")
    val d = Tables.documents(spark, "/root/testdata/sf0.01")
    val pieces = graft.operators.text.UnigramTrainer.train(
      d, col("text"), vocabSize = 48, seedSize = 256,
      maxPieceLen = 6, emIters = 4)
    pieces.foreach { case (p, lp) =>
      println(s"""PIECE\t"$p"\t${math.round(lp * 1e9)}""")
    }
    spark.stop()
  }
}
