package graft.operators.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffle joins (SCALE.md "skew").
  *
  * AQE's skew-join splits oversized SHUFFLE partitions at runtime, but it
  * only fires for sort-merge joins under AQE and after the skewed
  * partition has already been written. Explicit salting removes the hot
  * partition at the source: the skewed side spreads each key over
  * `salts` sub-keys, the (small-ish) dimension side is replicated once
  * per salt, and the join runs on (key, salt) — the hot key's rows land
  * on `salts` different reducers instead of one.
  *
  * The salt is derived from the skewed ROW (xxhash64 over all columns),
  * not from rand(): re-evaluation of a nondeterministic column across
  * stage retries would re-shuffle rows between sub-keys mid-join; a
  * row-derived salt is stable under retries and keeps the whole plan
  * deterministic (the engine's oracle mandate).
  *
  * Cost model: dim side grows ×salts (explode before ITS shuffle), so
  * pick `salts` ≈ hot-key rows / target-partition rows, and keep
  * `salts × |dim|` well under the skewed side — for a genuinely tiny dim
  * prefer `broadcast()` (no shuffle, no skew) and for mild skew prefer
  * AQE; this is the tool for the heavy middle ground.
  */
object Skew {

  /** `skewed ⋈ dim` on `keys`, with the skewed side salted `salts` ways.
    * Row-identical to the unsalted join (the oracle pins this). Only
    * join types that tolerate a replicated right side are allowed.
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi").contains(jt),
      s"saltedJoin: '$joinType' would duplicate unmatched replicated dim " +
        "rows — only inner/left/left_semi are salt-safe")
    val s = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.toIndexedSeq
        .map(c => col(s"`$c`")): _*)),
        lit(salts)).cast("int"))
    val d = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    s.join(d, (keys :+ "_salt").toIndexedSeq, joinType).drop("_salt")
  }
}
