package graft.operators.join

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter pre-join pruning — the shuffle-reduction primitive for
  * big ⋈ medium joins (SCALE.md "bloom pruning").
  *
  * A semi/inner join of a 100 TB fact side against a dimension too large
  * to broadcast pays a full shuffle of the FACT side — including every
  * row whose key has no partner and contributes nothing. A Bloom sketch
  * of the dimension keys is megabytes regardless of dimension row count
  * (sized by `expectedItems`/`fpp` only), broadcasts as a plan literal,
  * and gates fact rows BEFORE their shuffle: only might-match rows (true
  * matches + the fpp sliver) reach the exchange. With a 1% fpp and a 1%
  * match rate, the shuffle carries ~2% of the fact side.
  *
  * Exactness contract: the sketch has false positives but NO false
  * negatives, so `filter(mightContain) ∘ join == join` for join types
  * where unmatched probe-side rows don't survive (inner/semi). The real
  * join still runs behind the gate — results are bit-identical to the
  * unpruned plan and the oracle pins that.
  *
  * Spark itself injects this shape (runtime row-level filtering,
  * `spark.sql.optimizer.runtime.bloomFilter.*`) but only for shuffle
  * joins whose creation side already carries a selective filter and fits
  * its size thresholds; this operator is the explicit form for when the
  * planner can't see the selectivity (e.g. the dimension is the output
  * of an aggregate, exactly the dedup/decontaminate gram-set case).
  *
  * Determinism: bits are ORed into the sketch — insertion order and
  * partitioning don't change the bit array; probes are pure. The
  * sketch build is one `treeAggregate` action at query construction
  * (the IVF-training precedent: a bounded driver-side artifact whose
  * size is set by parameters, not by data volume).
  */
object BloomPrune {

  /** Serialized Bloom sketch over `xxhash64(key)` of `dim`. Insertion
    * and probe both go through xxhash64 → `putLong`/`mightContainLong`,
    * the same discipline as Spark's injected runtime filters.
    */
  def sketch(dim: DataFrame, key: Column,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bf = dim.select(xxhash64(key).as("_h")).na.drop("any")
      .stat.bloomFilter("_h", expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe against a serialized sketch — codegen'd
    * `BloomFilterMightContain` on `xxhash64(key)`, the sketch inlined as
    * a binary literal (so every task probes a local copy; no join, no
    * shuffle, no driver round-trip at execution time).
    */
  def mightContain(sketchBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketchBytes, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** `big ⋈ dim` with the big side Bloom-gated before its shuffle.
    * Row-identical to the ungated join; only inner/semi are
    * prune-safe (an outer probe side must keep unmatched rows, which is
    * exactly what the gate drops).
    */
  def prunedJoin(big: DataFrame, bigKey: Column,
      dim: DataFrame, dimKey: Column,
      joinType: String = "left_semi",
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "semi").contains(jt),
      s"bloom prune: '$joinType' keeps unmatched probe rows — gate only " +
        "inner/left_semi joins")
    val bytes = sketch(dim, dimKey, expectedItems, fpp)
    big.filter(mightContain(bytes, bigKey))
      .join(dim, bigKey === dimKey, joinType)
  }
}
