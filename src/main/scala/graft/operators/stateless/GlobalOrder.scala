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
    * The sorted frame is pinned with an eager local checkpoint before the
    * counts pass: `repartitionByRange` samples its bounds with an
    * RDD-id-derived seed, so two separate executions would see different
    * partitionings and the offsets would not line up with the data pass.
    * The checkpoint pins one set of bounds for both passes — the honest
    * cost of a global ordering; keyed operators never pay it. Unlike a
    * Dataset persist (which pins its plan in the CacheManager for the
    * application lifetime), checkpoint blocks are RDD-level storage the
    * ContextCleaner frees on GC.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], as: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
      .withColumn("_loc", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint(eager = true)
    // Per-partition counts are metadata-sized (numShufflePartitions rows):
    // collecting them to build offsets is the zipWithIndex pattern, not a
    // data-path collect.
    val counts = sorted.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_pid")).collect()
    var acc = 0L
    val offsets = counts.map { row =>
      val entry = (row.getLong(0), acc)
      acc += row.getLong(1)
      entry
    }.toMap
    // One map literal + element_at — O(1) hash probe per row, vs an O(P)
    // when-chain evaluated per row (200 branches at default partitions).
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1)
          .flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*),
        col("_pid"))
    sorted
      .withColumn(as, offExpr + col("_loc") + 1)
      .drop("_mid", "_pid", "_loc")
  }
}
