package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test corpus (TESTDATA.md): TPC-H-ish star schema
  * plus `events`, `documents`, `embeddings`.
  *
  * All loads are plain parquet scans — filters/projections push down.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Corpus table by name, unless a same-named table/view is already
    * registered in the session catalog — the catalog-first hook that
    * lets foreign-DB bindings (mongo collections, crate/pg tables) run
    * against seeded views where the corpus has no parquet twin. Scoped
    * to the DB query nodes; the core corpus loaders stay parquet-only.
    */
  def loadOrView(spark: SparkSession, dir: String, name: String): DataFrame =
    if (spark.catalog.tableExists(name)) spark.table(name)
    else load(spark, dir, name)

  /** `events` with `ts` normalized to a proper TimestampType column.
    *
    * The corpus writes TIMESTAMP(NANOS) which Spark reads as a nanosecond
    * epoch long (spark.sql.legacy.parquet.nanosAsLong). We convert to
    * microsecond timestamps (Spark's native precision) and keep the exact
    * nanosecond epoch in `ts_ns` for oracle-exact arithmetic: integer
    * truncation is deterministic and matches DuckDB's epoch_ms/epoch_ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(load(spark, dir, "events"))
  }

  /** [[events]] plus `ts_raw` — the UNTRANSFORMED scan column, kept so a
    * poll-window range predicate can land on a direct scan attribute
    * (PushedFilters row-group skipping; see PollSource.windowPredicate).
    * Separate entry point so every other query keeps its schema.
    */
  def eventsWithRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(load(spark, dir, "events"), keepRaw = true)
  }

  /** Normalize an events frame's `ts` to TimestampType + derived
    * `ts_ns`/`ts_ms` epochs, whatever physical form the corpus parquet
    * takes (works on batch AND streaming frames — column ops only):
    *  - TIMESTAMP(NANOS) under nanosAsLong → nanosecond epoch long;
    *  - TIMESTAMP/TIMESTAMP(MICROS) NTZ (DuckDB default; also what
    *    Spark ≥4.1 yields for NANOS now that the legacy long read is
    *    gone) → cast is a pure re-tag under the pinned UTC session tz;
    *  - plain TIMESTAMP → derived epochs only.
    */
  def normalizeEvents(raw0: DataFrame, keepRaw: Boolean = false): DataFrame = {
    val raw = if (keepRaw) raw0.withColumn("ts_raw", col("ts")) else raw0
    // NOTE: nanosecond epochs exceed 2^53 — double division corrupts the
    // low digits, so all conversions use integral `div`.
    raw0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ parquet: read as UTC wall-clock — graft sessions pin
        // spark.sql.session.timeZone to UTC, so the cast is a pure
        // re-tag, and unix_micros then resolves (it rejects NTZ input)
        val t = col("ts").cast("timestamp")
        raw
          .withColumn("ts_ns", unix_micros(t) * 1000L)
          .withColumn("ts_ms", unix_millis(t))
          .withColumn("ts", t)
      case _ =>
        raw
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
          .withColumn("ts_ms", unix_millis(col("ts")))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
  def documents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")

  /** Persist `df` as a bucketed, per-bucket-sorted table. Two tables
    * bucketed on the same keys with the same bucket count join WITHOUT
    * any Exchange — the co-located join that turns a repeated 100 TB
    * shuffle into a one-time layout cost. Size `buckets` so one bucket
    * of the big fact fits an executor core (e.g. 4096 at 100 TB ≈ 25 GB
    * raw / ~5 GB compressed per bucket).
    */
  def writeBucketed(df: DataFrame, name: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite").format("parquet").saveAsTable(name)
}
