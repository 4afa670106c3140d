package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local mode is `local[N]` for tests/bench; on a real cluster the same
  * settings apply minus master. AQE is enabled so skewed joins and
  * undersized shuffles re-plan at runtime — the primary 100 TB safety net.
  */
object Sessions {
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let AQE coalesce INSIDE persisted plans too: a CacheScope base
      // otherwise pins spark.sql.shuffle.partitions-many cache blocks
      // regardless of size, and every downstream scan of the cache pays
      // one task per block (measured: 33-task stages over ~1000-row
      // caches dominate the small-aggregate operators at sf0.1). With
      // this on, the cached partitioning follows AQE's byte-sized law —
      // few blocks for small frames, the usual advisory-sized spread at
      // scale — instead of a constant tuned to the core count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // (spark.sql.files.minPartitionNum was measured and REJECTED: the
      // sf fixtures are single-row-group parquet, so a higher split
      // floor only minted empty tasks — a scan cannot split below a
      // row group. Kernel-heavy single-task scans are an input-layout
      // property here, not a config defect.)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The driver corpus stores event timestamps as parquet TIMESTAMP(NANOS)
      // which Spark has no native type for; read them as nanosecond longs and
      // convert explicitly (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table warehouse (Tables.writeBucketed co-located joins);
      // keep it out of the repo working dir
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults to an externally built session (driver entry). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
