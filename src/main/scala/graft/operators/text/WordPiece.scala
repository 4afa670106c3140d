package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Wu et al. 2016, the BERT tokenizer):
  * greedy longest-match-first segmentation of each word against a
  * fixed vocabulary, where non-initial pieces carry the `##`
  * continuation prefix and a word with NO valid segmentation (or
  * longer than `maxWordLen`) becomes a single `[UNK]` — completing the
  * tokenizer-apply family next to [[BpeTrainer.encode]] (merge rules)
  * and [[UnigramTrainer.encode]] (Viterbi).
  *
  * The greedy scan is ONE native Catalyst expression
  * ([[WordPieceSeg]]) — a tight loop behind a single static call in
  * whole-stage codegen, the [[graft.functions.LnNano]] discipline. The
  * first cut was a 12-step unrolled when-chain; CollapseProject
  * substitutes each step's cursor into the next's ~13 references, so
  * the optimized expression tree grows ~13^12 and OOMs the driver —
  * the FixedLog plan-size lesson repeated one layer up, and exactly
  * why the native node exists.
  *
  * 100 TB shape (the [[UnigramTrainer.encode]] contract): the corpus
  * is touched once to pos-explode words; the greedy node runs on the
  * DISTINCT-WORD table (vocabulary-sized, ≪ corpus tokens); results
  * join back word-keyed. The vocabulary rides the plan as one
  * broadcast-scale reference object (tokenizer vocabs are 32-256k
  * entries), hashed once per executor, O(1) probes per cursor step.
  */
object WordPiece {

  /** Reference greedy scan — the runtime kernel [[WordPieceSeg]] calls
    * (eval and codegen paths alike) and the unit-pin yardstick.
    */
  def segRef(word: String, vocab: java.util.HashSet[String],
      maxPieceLen: Int, maxWordLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    if (n > maxWordLen) return Array("[UNK]")
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var pos = 0
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (pos == 0) word.substring(0, l)
          else "##" + word.substring(pos, pos + l)
        if (vocab.contains(cand)) hit = cand
        l -= 1
      }
      if (hit == null) return Array("[UNK]")
      out += hit
      pos += (if (pos == 0) hit.length else hit.length - 2)
    }
    out.toArray
  }

  /** ArrayData forwarder the generated code calls (static, like
    * `FixedLog.lnNanoRef`).
    */
  def segArray(w: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int, maxWordLen: Int): ArrayData =
    new GenericArrayData(
      segRef(w.toString, vocab, maxPieceLen, maxWordLen)
        .map(UTF8String.fromString): Array[UTF8String])

  /** Greedy-segment `docs[text]` under `vocab` (which must already
    * contain the `##`-prefixed continuation forms it accepts — initial
    * and continuation inventories are independent, as in BERT).
    * Emits `(doc_id, pos, piece_idx, piece)` — one row per piece,
    * `pos` the 0-based word position, `piece_idx` 0-based within the
    * word; empty words emit nothing.
    */
  def encode(docs: DataFrame, text: Column, id: Column,
      vocab: Seq[String], maxPieceLen: Int = 6, maxWordLen: Int = 12)
      : DataFrame = {
    require(vocab.nonEmpty, "wordpiece: vocab must be non-empty")
    require(maxPieceLen >= 1 && maxWordLen >= 1,
      "wordpiece: maxPieceLen and maxWordLen must be >= 1")
    val words = docs.select(id.as("doc_id"),
      posexplode(TextOps.tokens(text)).as(Seq("pos", "_w")))
    val seg = ColumnBridge.column(WordPieceSeg(
      ColumnBridge.expression(col("_w")), vocab, maxPieceLen,
      maxWordLen))
    val segmented = words.select(col("_w")).distinct()
      .withColumn("_pieces", seg)
    words.join(segmented, "_w")
      .select(col("doc_id"), col("pos"),
        posexplode(col("_pieces")).as(Seq("piece_idx", "piece")))
  }
}

/** `wordpiece_seg(word)`: the greedy longest-match-first WordPiece
  * segmentation as a native Catalyst expression — one plan node, one
  * static call in whole-stage codegen; the vocabulary is a per-plan
  * reference object hashed once.
  */
case class WordPieceSeg(child: Expression, vocab: Seq[String],
    maxPieceLen: Int, maxWordLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_seg"

  @transient private lazy val vset: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(h.add)
    h
  }

  override def nullSafeEval(w: Any): Any =
    WordPiece.segArray(w.asInstanceOf[UTF8String], vset,
      maxPieceLen, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("wpVocab", vset,
      "java.util.HashSet<java.lang.String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.text.WordPiece.segArray($c, $vref, " +
        s"$maxPieceLen, $maxWordLen)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceSeg = copy(child = newChild)
}
