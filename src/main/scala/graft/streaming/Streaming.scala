package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

/** Structured-Streaming forms of the stateful operators that have no
  * relational batch analog (SURVEY §2.5/§2.6): keyed state via
  * `flatMapGroupsWithState`, which Spark backs with the state store
  * (RocksDB at scale) — the engine's answer to faxe's per-node actor
  * state, partitioned by the stream key instead of subgraph cloning.
  *
  * All operators also run on batch Datasets (Spark executes FMGWS as a
  * grouped map there), so semantics are testable without a stream.
  */
object Streaming {

  /** `win_time` streaming form: watermarked event-time window aggregation
    * (ref: esp_win_time.erl:28-96; SURVEY §2.5 — faxe has unbounded
    * lateness, Spark's knob is the watermark delay; window contents match
    * for data within the delay).
    */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      period: String,
      every: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), period, every) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** `win_session` streaming form: watermarked session window. */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gap: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** `batch` node: emit a batch every `size` points per key; an optional
    * processing-time flush timeout emits a partial batch after silence
    * (ref: esp_batch.erl:30-119 — size trigger, timeout started on first
    * buffered point, flush on timer).
    */
  def countBatch[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      size: Int,
      timeoutMs: Long = 0L)(
      implicit ek: Encoder[K], es: Encoder[Seq[V]],
      eo: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] = {
    val conf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Seq[V], (K, Seq[V])](OutputMode.Append(), conf) {
        (key: K, it: Iterator[V], state: GroupState[Seq[V]]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(Seq.empty)
            state.remove()
            if (buf.nonEmpty) Iterator.single((key, buf)) else Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(Seq.empty)
            val out = ArrayBuffer.empty[(K, Seq[V])]
            it.foreach { v =>
              buf = buf :+ v
              if (buf.size >= size) { out += ((key, buf)); buf = Seq.empty }
            }
            if (buf.nonEmpty) {
              state.update(buf)
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            } else state.remove()
            out.iterator
          }
      }
  }

  /** Sliding last-`m` ring per key, the streaming base of the series
    * similarity family: after each arrival, once `m` values are
    * present, emits `(key, last m values in arrival order)`. Per-key
    * state is exactly m doubles — bounded regardless of stream length.
    * Per-key ordered arrival stands in for event-time order (the
    * packBins contract); the LAST emission per key equals the batch
    * `Series.keySeries` array, which is what downstream scoring
    * (zNormTopK's distance, withSax's word) consumes.
    */
  def slidingSeries[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      valFn: V => Double,
      m: Int)(
      implicit ek: Encoder[K], es: Encoder[Seq[Double]],
      eo: Encoder[(K, Seq[Double])]): Dataset[(K, Seq[Double])] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Seq[Double], (K, Seq[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: K, it: Iterator[V], state: GroupState[Seq[Double]]) =>
          var buf = state.getOption.getOrElse(Seq.empty)
          val out = ArrayBuffer.empty[(K, Seq[Double])]
          it.foreach { v =>
            buf = (buf :+ valFn(v)).takeRight(m)
            if (buf.size == m) out += ((key, buf))
          }
          state.update(buf)
          out.iterator
      }

  /** `win_event` tumbling count window: alias of countBatch (period ==
    * every; ref: esp_win_event.erl:29-82).
    */
  def countWindow[K, V](ds: Dataset[V], keyFn: V => K, n: Int)(
      implicit ek: Encoder[K], es: Encoder[Seq[V]],
      eo: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    countBatch(ds, keyFn, n)

  /** `change_detect`, streaming form: emit only rows whose monitored value
    * differs from the key's stored last value (ref:
    * esp_change_detect.erl:41-196). First row per key passes.
    */
  def changeDetect[K, V, F](
      ds: Dataset[V],
      keyFn: V => K,
      monitored: V => F)(
      implicit ek: Encoder[K], ev: Encoder[V],
      ef: Encoder[F]): Dataset[V] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[F, V](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[F]) =>
          val out = ArrayBuffer.empty[V]
          var last = state.getOption
          it.foreach { v =>
            val f = monitored(v)
            if (!last.contains(f)) { out += v; last = Some(f) }
          }
          last.foreach(state.update)
          out.iterator
      }

  /** `deadman`, streaming form: forward traffic; after `thresholdMs` of
    * silence per key emit a synthetic heartbeat row built by `heartbeat`
    * and re-arm (ref: esp_deadman.erl:43-75). Processing-time semantics by
    * nature — excluded from oracle checks, covered by unit tests.
    */
  def deadman[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      thresholdMs: Long,
      heartbeat: K => V)(
      implicit ek: Encoder[K], ev: Encoder[V]): Dataset[V] = {
    implicit val longEnc: Encoder[java.lang.Long] = Encoders.LONG
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[java.lang.Long, V](OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: K, it: Iterator[V], state: GroupState[java.lang.Long]) =>
          if (state.hasTimedOut) {
            state.setTimeoutDuration(thresholdMs) // re-arm
            Iterator.single(heartbeat(key))
          } else {
            val rows = it.toSeq
            state.update(System.currentTimeMillis())
            state.setTimeoutDuration(thresholdMs)
            rows.iterator
          }
      }
  }

  /** `triggered_timeout`: a row matching `arm` starts a timer; a `disarm`
    * row cancels it; if the timer fires first, emit `alarm(key)` (ref:
    * esp_triggered_timeout.erl:46-82). Traffic passes through.
    */
  def triggeredTimeout[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      arm: V => Boolean,
      disarm: V => Boolean,
      timeoutMs: Long,
      alarm: K => V)(
      implicit ek: Encoder[K], ev: Encoder[V]): Dataset[V] = {
    implicit val boolEnc: Encoder[java.lang.Boolean] = Encoders.BOOLEAN
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[java.lang.Boolean, V](OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: K, it: Iterator[V], state: GroupState[java.lang.Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(alarm(key))
          } else {
            val rows = it.toSeq
            rows.foreach { v =>
              if (disarm(v)) { if (state.exists) state.remove() }
              else if (arm(v)) {
                state.update(true)
                state.setTimeoutDuration(timeoutMs)
              }
            }
            rows.iterator
          }
      }
  }

  /** `time_elapsed`: wall-clock ms between consecutive arrivals per key
    * (ref: esp_time_elapsed.erl:31-44) — processing-time by definition
    * (SURVEY §7.4 documents the non-determinism); -1 on the first row.
    */
  def timeElapsed[K, V, U](
      ds: Dataset[V],
      keyFn: V => K,
      out: (V, Long) => U)(
      implicit ek: Encoder[K], eu: Encoder[U]): Dataset[U] = {
    implicit val longEnc: Encoder[java.lang.Long] = Encoders.LONG
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[java.lang.Long, U](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[java.lang.Long]) =>
          val outRows = ArrayBuffer.empty[U]
          it.foreach { v =>
            val nowMs = System.currentTimeMillis()
            val elapsed = state.getOption.map(nowMs - _.longValue).getOrElse(-1L)
            outRows += out(v, elapsed)
            state.update(nowMs)
          }
          outRows.iterator
      }
  }

  /** `state_sequence` streaming form, strict mode (ref:
    * esp_state_sequence.erl strict=true — the sequence steps must be
    * CONSECUTIVE rows of the key): keyed ring buffer of the last n-1
    * rows' predicate flags + timestamps; a row completing the chain
    * within the per-step timeouts is emitted. Rows are consumed in
    * arrival order per key — the reference's actor processes in arrival
    * order too; the batch twin (StateOps.stateSequence) sorts by the
    * order columns instead.
    */
  def stateSequence[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      preds: Seq[V => Boolean],
      timeoutsMs: Seq[Long],
      tsFn: V => Long)(
      implicit ek: Encoder[K], ev: Encoder[V],
      es: Encoder[Seq[(Long, Seq[Boolean])]]): Dataset[V] = {
    require(preds.size >= 2 && timeoutsMs.size == preds.size - 1)
    val n = preds.size
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Seq[(Long, Seq[Boolean])], V](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[Seq[(Long, Seq[Boolean])]]) =>
          var hist = state.getOption.getOrElse(Seq.empty)
          val out = ArrayBuffer.empty[V]
          // the group iterator carries NO intra-batch order guarantee
          // after the groupByKey shuffle (a multi-partition source can
          // interleave a key's rows arbitrarily): order by event time
          // before feeding the sequence FSM. Cross-batch late data is the
          // watermark's business, as in any streaming state op.
          it.toSeq.sortBy(tsFn).foreach { v =>
            val flags = preds.map(_(v))
            val ts = tsFn(v)
            if (hist.size >= n - 1) {
              val win = hist.takeRight(n - 1)
              val tss = win.map(_._1) :+ ts
              val ok = (0 until n - 1).forall(i => win(i)._2(i)) &&
                flags(n - 1) &&
                (1 until n).forall(j => tss(j) - tss(j - 1) <= timeoutsMs(j - 1))
              if (ok) out += v
            }
            hist = (hist :+ (ts, flags)).takeRight(n - 1)
          }
          state.update(hist)
          out.iterator
      }
  }

  /** `collect`, streaming form: keyed upsert cache — `add` admits rows,
    * `remove` evicts the key (ref: esp_collect.erl:63-637). Emits the
    * current latest row per key on change.
    */
  def collectLatest[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      add: V => Boolean,
      remove: V => Boolean)(
      implicit ek: Encoder[K], ev: Encoder[V]): Dataset[V] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[V, V](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[V]) =>
          val out = ArrayBuffer.empty[V]
          it.foreach { v =>
            if (remove(v)) { if (state.exists) state.remove() }
            else if (add(v)) { state.update(v); out += v }
          }
          out.iterator
      }

  /** `combine`, streaming form: enrich-latest over one union-tagged
    * stream — side rows (port 2) update the key's buffered row, TRIGGER
    * rows (port 1) emit paired with the current buffer, and a trigger
    * arriving before any side row is DROPPED (the cold-buffer rule,
    * esp_combine.erl:94-95; `.nofill` pass-through is the caller's
    * concern). Rows within a micro-batch process in event-time order,
    * side before trigger on ties — the batch asOfLatest's (_ts, _side)
    * sort, so streaming emissions match the batch operator whenever
    * arrival respects the watermark.
    */
  def enrichLatest[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      isTrigger: V => Boolean,
      tsFn: V => Long)(
      implicit ek: Encoder[K], ev: Encoder[V],
      eo: Encoder[(V, V)]): Dataset[(V, V)] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[V, (V, V)](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[V]) =>
          val out = ArrayBuffer.empty[(V, V)]
          it.toIndexedSeq.sortBy(v => (tsFn(v), isTrigger(v))).foreach { v =>
            if (!isTrigger(v)) state.update(v)
            else state.getOption.foreach(s => out += ((v, s)))
          }
          out.iterator
      }

  /** `pack_bins` streaming form: the per-shard concat-and-chunk cursor as
    * keyed state. Each shard's state is ONE long — the cumulative token
    * count — bounded regardless of stream length; rows are packed in
    * `orderFn` order within each micro-batch, and with per-shard ordered
    * arrival across batches the emissions match the batch
    * `TextOps.packBins` exactly (same window arithmetic, the running sum
    * carried by state instead of a sort). Out-of-order arrival ACROSS
    * micro-batches packs in arrival order — the streaming analog of
    * appending to a shard's tail; replaying from one source offset is
    * deterministic either way.
    */
  def packBins[K, V](
      ds: Dataset[V],
      keyFn: V => K,
      tokensFn: V => Long,
      orderFn: V => Long,
      binTokens: Int)(
      implicit ek: Encoder[K],
      eo: Encoder[(V, Long, Long, Long)]): Dataset[(V, Long, Long, Long)] = {
    implicit val cursorEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Long, (V, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, it: Iterator[V], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toIndexedSeq.sortBy(orderFn).map { v =>
            val n = tokensFn(v)
            val start = cum
            val binId = start / binTokens
            val nBins =
              if (n <= 0) 0L else (start + n - 1) / binTokens - binId + 1
            cum += n
            (v, binId, start % binTokens, nBins)
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Continuous-ingestion exact dedup: drop any document whose content
    * hash has already been seen — in an EARLIER micro-batch or earlier
    * in this one — keeping the first arrival. The streaming complement
    * of [[graft.operators.text.Dedup.exactDupGroups]], whose keep-MIN
    * rule needs the whole corpus: on a live crawl feed, arrival order
    * IS the dedup rule.
    *
    * Spark-first: this is exactly `dropDuplicates` on a streaming
    * Dataset — the hash-keyed seen-set lives in the state store
    * (RocksDB at scale), partitioned by content hash, one tiny row per
    * distinct document ever seen. No custom state code to maintain.
    * For bounded state on unbounded feeds, pass `withinWatermark` +
    * an event-time column already watermarked upstream —
    * `dropDuplicatesWithinWatermark` then expires seen-hashes once
    * they age out, the standard TTL trade (a dup arriving later than
    * the watermark delay is re-admitted; crawls re-visiting a URL
    * weeks later usually WANT re-admission on drift).
    *
    * Cross-BATCH semantics are the guarantee: a hash seen in an
    * earlier micro-batch never re-emits. WITHIN one (micro-)batch the
    * surviving representative among simultaneous duplicates is
    * partition-dependent (SQL DISTINCT semantics) — use the batch
    * keep-min [[graft.operators.text.Dedup.exactDupGroups]] when the
    * representative identity matters. Pinned in StreamingSpec.
    */
  def exactDedupStream(df: DataFrame, text: Column,
      withinWatermark: Boolean = false): DataFrame = {
    val hashed = df.withColumn("content_hash", md5(text))
    if (withinWatermark)
      hashed.dropDuplicatesWithinWatermark(Seq("content_hash"))
    else hashed.dropDuplicates(Seq("content_hash"))
  }
}
