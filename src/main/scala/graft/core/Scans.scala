package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-spreading for per-row kernels over unsplittable inputs — guide
  * §2.5's "input skew: one huge unsplittable file → repartition
  * immediately after the read", applied to the engine's expensive
  * projected kernels (tokenize+explode, SimHash, pHash, hashed
  * features).
  *
  * Why: a single-row-group parquet file (or a gzip part) scans as ONE
  * task — a scan cannot split below a row group — so a kernel projected
  * directly onto the scan runs single-threaded no matter how many cores
  * the session has. Measured at sf0.1 / local[32]: 2.3 s of
  * dedup_simhash_pairs' 3.0 s wall was one SimHash task; bm25Postings'
  * tokenization showed the same one-task shape inside every serve
  * query. (The r15 `spark.sql.files.minPartitionNum` attempt could not
  * fix this — a config floor only mints empty splits; moving the rows
  * is the only way to move the compute.)
  *
  * The fix is an explicit DETERMINISTIC hash repartition between the
  * scan and the kernel projection — the kernel then evaluates on the
  * spread side of the exchange. It applies ONLY when the input arrives
  * with fewer partitions than the session parallelism: splittable
  * 100 TB inputs arrive pre-spread and are left untouched (a blanket
  * repartition would add a full shuffle and could REDUCE their
  * parallelism). Hash-by-key, not round-robin: deterministic under
  * task retry (guide §2.5's SPARK-38388 note) and no
  * sort-before-repartition cost.
  */
object Scans {

  /** Repartition `df` by `key` to the session's default parallelism
    * when it arrives with fewer partitions; identity otherwise. Call
    * BEFORE projecting an expensive kernel, with only the kernel's
    * input columns selected (the exchange then carries the narrow
    * pre-kernel rows, and the kernel runs spread).
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    // streaming frames can't answer a partition probe (.rdd throws on
    // unstarted streaming plans) and arrive micro-batch-partitioned by
    // their source anyway — identity there keeps the stream ≡ batch
    // operator pins intact
    if (df.isStreaming) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want, key) else df
  }
}
