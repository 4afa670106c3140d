package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation / phrase mining over a document corpus — the PMI
  * (pointwise mutual information) ranking of adjacent token pairs that
  * tokenizer-merge seeding, phrase-table construction, and boilerplate
  * discovery all start from (the word2phrase / BPE-candidate family:
  * a merge like "New York" is exactly a high-PMI adjacent pair).
  *
  * PMI(x, y) = ln( p(x,y) / (p(x·)·p(·y)) ) over the ADJACENT-BIGRAM
  * distribution: p(x,y) = n_xy/N, with the LEFT and RIGHT marginals
  * p(x·) = Σ_y n_xy / N and p(·y) = Σ_x n_xy / N — so
  *   pmi = ln n_xy + ln N − ln n_x· − ln n_·y.
  *
  * Every log is [[graft.functions.FixedLog]] `lnNano` — integer 1e-9
  * units in pure 64-bit arithmetic — so the score is bit-exact on any
  * engine build (the nb_classify libm lesson) and, because logs are
  * taken per row and SUMMED nowhere, the result is trivially
  * partition-order-free. The sum-of-logs form (never ln(a·b/c·d)) also
  * keeps every lnNano argument a raw count: no product can overflow
  * even at 100 TB token counts (ln args ≤ total bigrams; the nano score
  * is bounded by ±2·ln(N)·1e9 ≈ ±6e10 for N = 2⁶³).
  *
  * 100 TB shape: ONE corpus scan explodes adjacent pairs (an index
  * explode over the token array — no window, no shuffle); pair counts
  * are one map-side-combinable (x, y) aggregate; the marginals and the
  * grand total derive from the PAIR-COUNT table (vocabulary²-bounded,
  * scope-cached — never a second corpus scan); the min-count gate cuts
  * the long tail BEFORE the marginal joins; the final top-k is a
  * TakeOrdered (per-partition heap + driver merge of k rows), never a
  * global sort.
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations by fixed-point PMI.
    *
    * Returns `(x, y, n_xy, pmi_nano)` — the pair, its adjacent-bigram
    * count, and PMI in integer nano-units — ordered by
    * `(pmi_nano DESC, x, y)` (a total order, so the cut is
    * deterministic under any partitioning). Pairs with
    * `n_xy < minCount` are dropped before scoring: a 1-occurrence
    * hapax pair of two hapax tokens has PMI = ln N — the classic
    * degenerate top of an ungated PMI ranking.
    */
  def pmiTopK(docs: DataFrame, text: Column, minCount: Long = 3,
      k: Int = 50): DataFrame = {
    require(minCount >= 1,
      s"pmiTopK: minCount must be >= 1, got $minCount")
    require(k >= 1, s"pmiTopK: k must be >= 1, got $k")
    val pairs = TextOps.bigramPairs(docs, text, lit(0L))
      .select(col("w1").as("x"), col("w2").as("y"))
    graft.core.CacheScope.withPersisted(
      pairs.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("n_xy"))) { pc =>
      val lx = pc.groupBy(col("x")).agg(sum(col("n_xy")).as("_n_x"))
      val ry = pc.groupBy(col("y")).agg(sum(col("n_xy")).as("_n_y"))
      // 1-row grand total joined on a constant key: a broadcast HASH
      // join (the bigramLmFromPairs trick), not a nested-loop shape
      val nn = pc.agg(sum(col("n_xy")).as("_nb"))
        .withColumn("_k", lit(1))
      val j = pc.filter(col("n_xy") >= minCount)
        .join(lx, Seq("x")).join(ry, Seq("y"))
        .withColumn("_k", lit(1))
        .join(broadcast(nn), Seq("_k")).drop("_k")
      val logged = Seq(("n_xy", "_ln_xy"), ("_n_x", "_ln_x"),
        ("_n_y", "_ln_y"), ("_nb", "_ln_nb")).foldLeft(j) {
        case (cur, (in, out)) =>
          graft.functions.FixedLog.withLnNano(cur, col(in), out)
      }
      logged.select(col("x"), col("y"), col("n_xy"),
        (col("_ln_xy") + col("_ln_nb") - col("_ln_x") - col("_ln_y"))
          .as("pmi_nano"))
        .orderBy(col("pmi_nano").desc, col("x"), col("y"))
        .limit(k)
    }
  }
}
