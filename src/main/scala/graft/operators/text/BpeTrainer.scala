package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training, Spark-shaped (Sennrich et al.
  * 2016, the standard subword-vocabulary algorithm).
  *
  * The corpus is touched ONCE (the word-frequency count); every merge
  * iteration after that runs on the vocabulary table — (word-symbols,
  * frequency) rows, distinct words ≪ corpus tokens — so a 100 TB corpus
  * pays one scan-and-count shuffle and the iterations cost
  * vocabulary-sized work regardless of corpus size. Per iteration the
  * driver collects exactly ONE row (the argmax pair — same sanctioned
  * bounded collect as the IVF k-means trainer), and the vocabulary
  * frame is eagerly localCheckpoint'ed so lineage stays flat across
  * iterations instead of stacking `merges` transform layers.
  *
  * Merge application is the classic left-to-right non-overlapping pass,
  * expressed as an `aggregate` fold over the symbol array: append each
  * symbol, except when the accumulator's last element is `a` and the
  * incoming symbol is `b` — then replace the last element with `a+b`
  * ("aaa" under (a,a) → ["aa","a"], the textbook behavior). The fold is
  * an interpreted HOF, acceptable here precisely because it runs on the
  * vocabulary table, never the corpus (the HOF-on-volume-path ban,
  * BENCH_NOTES_r9 §4).
  */
object BpeTrainer {

  /** One merge step on a symbols column: left-to-right non-overlapping
    * replacement of adjacent (a, b) with a+b.
    */
  def applyMerge(symbols: Column, a: String, b: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, x) =>
        // get() is 0-based and null-on-out-of-range (never throws under
        // ANSI), so the empty-accumulator case falls to `otherwise`
        when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts over a (symbols, freq) vocabulary frame:
    * (a, b, n) with n = Σ freq over occurrences.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("_syms")) >= 2)
      .select(col("_syms"), col("_n"),
        explode(sequence(lit(1), size(col("_syms")) - 1)).as("_i"))
      .select(element_at(col("_syms"), col("_i")).as("a"),
        element_at(col("_syms"), col("_i") + 1).as("b"), col("_n"))
      .groupBy(col("a"), col("b")).agg(sum(col("_n")).as("n"))

  /** Apply an ordered merge-rule list to a corpus — the tokenizer's
    * APPLY side: emits one row per (doc, token position, piece index,
    * piece). The merges run on the DISTINCT-WORD table only (each rule
    * is one [[applyMerge]] fold pass, checkpointed every 8 rules to
    * keep the expression tree and lineage bounded); the corpus pays a
    * posexplode and one equi-join on the word — the same
    * vocabulary-not-corpus cost split as [[train]].
    */
  def encode(docs: DataFrame, text: Column, id: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(id.as("doc_id"),
        posexplode(TextOps.tokens(text)).as(Seq("pos", "_w")))
    var vocab = words.select(col("_w")).distinct()
      .withColumn("_syms", filter(split(col("_w"), ""), x => x =!= lit("")))
    merges.grouped(8).foreach { batch =>
      vocab = batch.foldLeft(vocab) { case (d, (a, b)) =>
        d.withColumn("_syms", applyMerge(col("_syms"), a, b))
      }.localCheckpoint()
    }
    words.join(vocab, "_w")
      .select(col("doc_id"), col("pos"),
        posexplode(col("_syms")).as(Seq("piece_idx", "piece")))
  }

  /** Train `merges` BPE merge rules over `text`'s whitespace words.
    * Returns the ordered rule list; ties break lexicographically on
    * (a, b) so training is deterministic.
    */
  def train(docs: DataFrame, text: Column, merges: Int): Seq[(String, String)] = {
    var vocab = docs.select(explode(TextOps.tokens(text)).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      // split-on-empty keeps a trailing "" under Spark's limit=-1 —
      // filter it so symbols are exactly the characters
      .select(filter(split(col("_w"), ""), x => x =!= lit(""))
        .as("_syms"), col("_n"))
      .localCheckpoint()
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < merges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect() // ONE row: the argmax merge candidate
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += ((a, b))
        vocab = vocab
          .select(applyMerge(col("_syms"), a, b).as("_syms"), col("_n"))
          .localCheckpoint()
      }
      i += 1
    }
    out.result()
  }
}
