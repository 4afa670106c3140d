package graft.operators.stateless

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering — the replacement for the
  * `Window.orderBy` (no partition) anti-pattern, which funnels every row
  * through a single task.
  *
  * Two-pass partition-offset scheme (the same design as RDD.zipWithIndex):
  *  1. range-partition + sort by the order columns — every partition stays
  *     parallel and holds a contiguous key range;
  *  2. count rows per partition (one tiny job), turn counts into cumulative
  *     offsets on the driver;
  *  3. global row number = partition offset + local position, where the
  *     local position comes from `monotonically_increasing_id()` (which is
  *     `partitionId << 33 | localIndex` and therefore order-preserving
  *     within each sorted partition).
  *
  * Requires the order columns to form a total order for a deterministic
  * numbering (ties may land on either side of a partition boundary).
  */
object GlobalOrder {

  /** Add a 1-based global row number `as` ordered by `order`.
    *
    * Range-partition + per-partition sort, then RDD `zipWithIndex` on the
    * SAME RDD instance ([[org.apache.spark.sql.graftbridge.ColumnBridge
    * .zipWithGlobalIndex]]): zipWithIndex's partition-count job and the
    * data pass share one materialized shuffle, so both see the same
    * sampled range bounds. A two-branch relational formulation is NOT
    * safe here — `repartitionByRange` samples bounds with an
    * RDD-id-derived seed per instantiation, and plan-level exchange reuse
    * across branches is best-effort (AQE may re-plan a branch), which
    * round 8 observed as a silently mis-numbered row. The RDD form pins
    * the partitioning by construction; nothing is persisted and shuffle
    * files are GC-cleaned.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], as: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
    org.apache.spark.sql.graftbridge.ColumnBridge
      .zipWithGlobalIndex(sorted, as)
  }

  /** Inclusive running total of `weight` in global `order` — the
    * distributed prefix-sum (scan) primitive, and the scale-safe
    * replacement for `sum(w).over(Window.orderBy(...))` with no
    * partition clause (which funnels the corpus through one task).
    *
    * Same range-partition + partition-offset scheme as [[rowNumber]]
    * ([[org.apache.spark.sql.graftbridge.ColumnBridge
    * .zipWithRunningSum]]): per-partition sums collect to the driver
    * (numPartitions rows — bounded), become offsets, and a second pass
    * over the SAME materialized shuffle adds them. `weight` is cast to
    * long; the order columns must form a total order.
    */
  def runningSum(df: DataFrame, order: Seq[Column], weight: Column,
      as: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.withColumn("_rs_w", weight.cast("long"))
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
    org.apache.spark.sql.graftbridge.ColumnBridge
      .zipWithRunningSum(sorted, "_rs_w", as)
      .drop("_rs_w")
  }
}
