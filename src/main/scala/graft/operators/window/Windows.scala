package graft.operators.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Window operators (SURVEY §2.5) — the point→batch converters.
  *
  * Event-time windows map to Spark's native `window()`/`session_window()`
  * grouping (pre-shuffle partial aggregation, AQE-sized shuffles). The
  * count window has no relational builtin: its batch form is row_number
  * bucketing; the streaming form is graft.streaming.Streaming.countWindow.
  */
object Windows {

  /** `win_time` with every == period — tumbling event-time window
    * (ref: esp_win_time.erl:28-96). Emits window_start_ms/window_end_ms.
    */
  def tumblingAgg(
      df: DataFrame,
      ts: Column,
      duration: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, duration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .withColumn("window_end_ms", unix_millis(col("window.end")))
      .drop("window")

  /** `win_time` sliding — period length, every emit interval
    * (ref: esp_win_time.erl:28-96, period/every options).
    */
  def slidingAgg(
      df: DataFrame,
      ts: Column,
      period: String,
      every: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, period, every) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .withColumn("window_end_ms", unix_millis(col("window.end")))
      .drop("window")

  /** `fill_period` option — suppress the partial head windows emitted before
    * one full period of data exists (ref: esp_win_time.erl:88-96 check_emit).
    * Batch analog: keep only windows starting at/after the first timestamp.
    * The bound stays LAZY: a 1-row min-aggregate broadcast-joined onto the
    * windowed frame (conditionless 1-row BNLJ ≈ a scalar subquery), so no
    * Spark job runs at query-construction time and the min computes inside
    * the same job — at 100 TB an eager `.head` here would be a full extra
    * source scan per planned query. An empty source yields a null bound,
    * which filters nothing out of the (equally empty) windowed frame.
    */
  def fillPeriod(windowed: DataFrame, source: DataFrame, ts: Column): DataFrame = {
    val bounds = source.agg(min(unix_millis(ts)).as("_min_ms"))
    windowed
      .join(broadcast(bounds))
      .filter(col("window_start_ms") >= col("_min_ms"))
      .drop("_min_ms")
  }

  /** `win_session` — session window by inactivity gap
    * (ref: esp_win_session.erl:30-57). Native `session_window` (Spark 3.2+):
    * start = first event ts, end = last event ts + gap.
    */
  def sessionAgg(
      df: DataFrame,
      ts: Column,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start_ms", unix_millis(col("session_window.start")))
      .withColumn("session_end_ms", unix_millis(col("session_window.end")))
      .drop("session_window")

  /** `win_event` / `batch` count window, batch analog
    * (ref: esp_win_event.erl:29-82): every `every` rows emit the last
    * `period` rows. The tumbling case (period == every) is row bucketing.
    */
  /** `win_clock` — processing-time sliding window (ref:
    * esp_win_clock.erl:33-136). Engine policy is event-time first
    * (SURVEY §7.4): wall-clock windows are non-deterministic by nature,
    * so this stamps an ingest-time column at scan and windows on it;
    * `align` is inherent (window origin is the epoch). Excluded from
    * oracle checks by design.
    */
  def clockAgg(
      df: DataFrame,
      duration: String,
      keys: Seq[Column],
      aggs: Seq[Column],
      alignMs: Option[Long] = None,
      slide: Option[String] = None): DataFrame = {
    // period > every = sliding clock window (esp_win_clock.erl options)
    val win = slide.filter(_ != duration)
      .map(s => window(col("_ingest_ts"), duration, s))
      .getOrElse(window(col("_ingest_ts"), duration))
    val base = df.withColumn("_ingest_ts", current_timestamp())
      .groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms", unix_millis(col("window.start")))
      .withColumn("window_end_ms", unix_millis(col("window.end")))
      .drop("window")
    // `align` (esp_win_clock.erl:121-127 faxe_time:align): the emitted
    // window is shifted down to the align unit boundary — pure integer
    // arithmetic on the already-computed start. BOTH bounds shift by the
    // same delta so end - start stays == every and the pair describes one
    // consistent interval.
    alignMs match {
      case Some(a) =>
        val delta = pmod(col("window_start_ms"), lit(a))
        base
          .withColumn("window_end_ms", col("window_end_ms") - delta)
          .withColumn("window_start_ms", col("window_start_ms") - delta)
      case None => base
    }
  }

  /** `win_event` sliding count window (period > every): every `every`-th
    * row per key emits an aggregate over the last `period` rows
    * (ref: esp_win_event.erl:56-82 maybe_emit/maybe_evict). Each row
    * belongs to at most ceil(period/every) emission windows — the row is
    * exploded to exactly those window ids, then it is a plain keyed
    * aggregation (no self-join, no per-key state).
    */
  def countSlidingAgg(
      df: DataFrame,
      period: Int,
      every: Int,
      order: Seq[Column],
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    // keyless: the scalable two-pass global numbering (same as tumbling)
    val numbered =
      if (keys.isEmpty)
        graft.operators.stateless.GlobalOrder.rowNumber(df, order, "_rn")
      else {
        val w = W.partitionBy(keys: _*).orderBy(order: _*)
        df.withColumn("_rn", row_number().over(w))
      }
    // emission k covers rows (k*every - period, k*every]; row rn belongs to
    // ks in [ceil(rn/every), floor((rn - 1 + period)/every)]
    val kFirst = ceil(col("_rn") / every).cast("long")
    val kLast = floor((col("_rn") - 1 + period) / every).cast("long")
    numbered
      .withColumn("win_id", explode(sequence(kFirst, kLast)))
      .groupBy(keys :+ col("win_id"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def countTumblingAgg(
      df: DataFrame,
      n: Int,
      order: Seq[Column],
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    val numbered =
      if (keys.isEmpty)
        graft.operators.stateless.GlobalOrder.rowNumber(df, order, "_rn")
      else {
        val w = W.partitionBy(keys: _*).orderBy(order: _*)
        df.withColumn("_rn", row_number().over(w))
      }
    numbered.withColumn("win_id", ((col("_rn") - 1) / n).cast("long"))
      .groupBy(keys :+ col("win_id"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
