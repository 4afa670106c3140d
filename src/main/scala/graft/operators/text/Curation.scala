package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the large-scale training-data pipeline:
  * composition reports, per-domain caps, and deterministic global
  * shuffling for training order.
  *
  * The Common-Crawl-style curation loop is: measure the mix
  * ([[domainStats]]), bound any one domain's dominance ([[capPerKey]] —
  * the "at most N pages per host" rule), then fix a reproducible
  * training order ([[shuffleOrder]]). All three are built on the same
  * md5-derived determinism as [[TextOps.hashSample]] so every engine —
  * and every re-run — selects and orders the exact same rows.
  */
object Curation {

  /** Corpus composition report: per-domain document count, total weight
    * (typically a token count), and the domain's share of the corpus
    * weight — the "what is my mix" input to [[TextOps.sampleToMixture]].
    *
    * 100 TB shape: one map-side-combined aggregate down to
    * domain-cardinality rows, then the 1-row grand total joins back by
    * broadcast — no second scan of the corpus, no driver collect.
    */
  def domainStats(df: DataFrame, domain: Column, weight: Column)
      : DataFrame = {
    val per = df.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight.cast("long")).as("n_weight"))
    val tot = per.agg(sum(col("n_weight")).as("_tot"))
    per.join(broadcast(tot))
      .withColumn("share", round(col("n_weight") / col("_tot"), 6))
      .drop("_tot")
  }

  /** Keep at most `n` rows per key, selected deterministically: rows
    * rank by (md5-hash of id, id) inside each key, so the survivors are
    * a stable pseudo-random subset — the per-host / per-domain cap rule
    * of web-corpus curation (no domain floods the corpus), with none of
    * the order-dependence a `limit` inside a group would have.
    *
    * 100 TB shape: one shuffle on the key, then a PARTITIONED window
    * (never a global sort). Skewed domains are bounded by the rank
    * filter itself — a hot key's rows all land in one task, which is the
    * floor any exact per-key top-n pays; for pathological single-key
    * skew, pre-filter with [[TextOps.hashSample]] at a rate that
    * over-samples `n` and cap the remainder here.
    */
  def capPerKey(df: DataFrame, key: Seq[Column], id: Column, n: Int)
      : DataFrame = {
    require(n > 0, s"capPerKey: n must be positive, got $n")
    val w = Window.partitionBy(key: _*)
      .orderBy(TextOps.hash60(id.cast("string")), id)
    df.withColumn("_cap_rn", row_number().over(w))
      .filter(col("_cap_rn") <= n)
      .drop("_cap_rn")
  }

  /** Deterministic global shuffle for training order: every row gets a
    * 0-based position `as`, ordered by md5(seed || "|" || id). The same
    * (corpus, seed) yields the same permutation on every run and every
    * engine — reproducible epoch ordering without RNG state — and a new
    * seed is a fresh permutation.
    *
    * 100 TB shape: the ordering is a range partition on the hash (every
    * partition stays parallel) and the numbering is the partition-offset
    * scheme of [[graft.operators.stateless.GlobalOrder]] — there is no
    * single-task global sort anywhere. Inherently batch: a global
    * permutation needs the whole epoch's rows by definition.
    */
  def shuffleOrder(df: DataFrame, id: Column, seed: String,
      as: String = "pos"): DataFrame = {
    val key = md5(concat_ws("|", lit(seed), id.cast("string")))
    graft.operators.stateless.GlobalOrder
      .rowNumber(df.withColumn("_shuf", key), Seq(col("_shuf"), id), as)
      .withColumn(as, col(as) - 1)
      .drop("_shuf")
  }
}
