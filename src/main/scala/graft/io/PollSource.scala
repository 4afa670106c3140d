package graft.io

import org.apache.spark.sql.{Column, DataFrame}

/** Incremental polling source — the engine side of the reference's
  * continuous DB query nodes (ref: esp_crate_query_cont.erl:36-43 state,
  * :204-216 ahead-of-time wait, :406-434 advancing query_mark + catch-up,
  * :457-459 min_interval pacing; bucketing rewrite esp_crate_query.erl:
  * 144-171).
  *
  * The poll planner is pure offset arithmetic over an advancing `[from,
  * to)` window: `mark` is the exclusive upper bound; each successful poll
  * advances it by `periodMs`; a poll is only issued once `mark + offsetMs
  * <= now` (the offset lets late-arriving rows land before their window
  * is read — the reference's 20 s default); behind-schedule marks catch
  * up in a burst paced by `minIntervalMs`. Exactly-once coverage holds by
  * construction: windows partition the timeline.
  *
  * Spark-first: a poll window becomes a pushdown-friendly range filter on
  * the event-time column, so each poll is a pruned scan (parquet row-group
  * skipping / partition pruning at scale), and the actual transport is a
  * binding — `fetch: PollWindow => DataFrame` over a parquet dir here, a
  * JDBC predicate-pushdown read in a DB deployment (see README connector
  * boundary).
  */
object PollSource {

  /** One `[fromMs, toMs)` poll window (ms epoch, to exclusive). */
  final case class PollWindow(fromMs: Long, toMs: Long)

  /** Advancing-mark poll planner. Not thread-safe (one poller per flow,
    * like the reference's per-node state).
    *
    * @param startMs   time (in data) at which to start (ref `start`;
    *                  derive from a setup aggregate for the reference's
    *                  setup_query behavior)
    * @param periodMs  window length == advance step (ref `period`)
    * @param offsetMs  read lag behind wall-clock now (ref `offset`, 20s)
    * @param minIntervalMs floor between successive polls when catching up
    *                  (ref `min_interval`, 5s) — returned as the wait hint
    * @param stopMs    time (in data) at which to end (ref `stop`); the
    *                  poller stops once `mark > stopMs`
    */
  final class IncrementalPoll(
      startMs: Long,
      periodMs: Long,
      offsetMs: Long = 20000L,
      minIntervalMs: Long = 5000L,
      stopMs: Option[Long] = None) {
    require(periodMs > 0, "periodMs must be positive")
    private var markMs: Long = startMs + periodMs

    /** The next poll's exclusive upper bound (ref query_mark). */
    def mark: Long = markMs

    /** Next window if one is due at `nowMs`, advancing the mark.
      * None = ahead of time (wait until `mark + offset`) or stopped.
      */
    def next(nowMs: Long): Option[PollWindow] = {
      if (stopMs.exists(markMs > _)) None
      else if (markMs + offsetMs > nowMs) None
      else {
        val w = PollWindow(markMs - periodMs, markMs)
        markMs += periodMs
        Some(w)
      }
    }

    /** True once the stop mark is passed (ref stop_flow). */
    def stopped: Boolean = stopMs.exists(markMs > _)

    /** Wall-clock ms until the next poll is due at `nowMs`: the
      * min-interval floor while catching up, else the gap to
      * `mark + offset` (ref next_query/1:457-459).
      */
    def nextDueInMs(nowMs: Long): Long =
      math.max(minIntervalMs, (markMs + offsetMs) - nowMs)

    /** Catch-up burst: every window due at `nowMs`, at most `max`
      * (ref :204-216 — behind-schedule marks re-fire immediately).
      */
    def catchUp(nowMs: Long, max: Int = Int.MaxValue): Seq[PollWindow] = {
      val out = Seq.newBuilder[PollWindow]
      var n = 0
      var w = next(nowMs)
      while (w.isDefined && n < max) {
        out += w.get
        n += 1
        w = next(nowMs)
      }
      out.result()
    }
  }

  /** One poll window as a DataFrame: a range filter the optimizer pushes
    * into the scan (PushedFilters on ts at the parquet reader).
    */
  def poll(df: DataFrame, tsMs: Column, w: PollWindow): DataFrame =
    df.filter(tsMs >= w.fromMs && tsMs < w.toMs)

  /** Window predicate that actually reaches the parquet reader: a filter
    * on a DERIVED column (`ts div 1000000`, `unix_micros(cast(ts))`)
    * pushes only IsNotNull — every poll would full-scan at 100 TB. The
    * RAW scan attribute (`<base>_raw` when the frame carries one —
    * Tables.eventsWithRaw) takes the bound in its own type instead:
    *  - NTZ timestamp: ms bound re-tagged to an NTZ literal (exact —
    *    sub-ms values order strictly inside the half-open window);
    *  - epoch-ns long: `ms ∈ [a,b) ⟺ ns ∈ [a·10⁶, b·10⁶)` exactly
    *    (integer truncation).
    * A raw-less frame with a raw `_ns` long column (legacy nanosAsLong
    * read) gets the ns bound; otherwise the ms filter still gives
    * correct rows, just without row-group skipping.
    */
  def windowPredicate(df: DataFrame, tsMsName: String,
      w: PollWindow): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val base = tsMsName.stripSuffix("_ms")
    val raw = base + "_raw"
    val ns = base + "_ns"
    def ntz(ms: Long) =
      timestamp_micros(lit(ms * 1000L)).cast(TimestampNTZType)
    if (df.columns.contains(raw)) df.schema(raw).dataType match {
      case TimestampNTZType =>
        col(raw) >= ntz(w.fromMs) && col(raw) < ntz(w.toMs)
      case LongType =>
        col(raw) >= w.fromMs * 1000000L && col(raw) < w.toMs * 1000000L
      case _ => col(tsMsName) >= w.fromMs && col(tsMsName) < w.toMs
    }
    else if (df.columns.contains(ns))
      col(ns) >= w.fromMs * 1000000L && col(ns) < w.toMs * 1000000L
    else col(tsMsName) >= w.fromMs && col(tsMsName) < w.toMs
  }

  /** Run `poller` to exhaustion against a DataFrame-producing fetch and
    * union the polls — N successive polls over a partitioned timeline.
    */
  def pollAll(
      poller: IncrementalPoll,
      nowMs: Long,
      fetch: PollWindow => DataFrame): Option[DataFrame] = {
    val frames = poller.catchUp(nowMs).map(fetch)
    frames.reduceOption(_ union _)
  }
}
