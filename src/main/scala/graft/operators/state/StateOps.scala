package graft.operators.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** State-tracking / edge-detection operators (SURVEY §2.6).
  *
  * Batch forms are lag/run-length window functions ordered by event time
  * within the stream key — one shuffle on the key, then a single sorted
  * pass per partition (faxe's per-edge FIFO order becomes per-key ts
  * order, SURVEY §7.4). Streaming forms: graft.streaming.Streaming.
  */
object StateOps {

  private def spec(keys: Seq[Column], order: Seq[Column]): WindowSpec =
    // Keyless = the reference's single-stream semantics (one node instance
    // owns one totally-ordered stream): plans a single ordered task — the
    // same serial cost the single-node reference pays, correct for
    // verbatim-script parity. At scale a keyless lag chain is a global
    // sort: `group_by` is the 100 TB switch (SCALE.md), and every
    // registered oracle query stays keyed (PlanLintSpec rejects
    // unpartitioned WindowExec there).
    if (keys.isEmpty) Window.orderBy(order: _*)
    else Window.partitionBy(keys: _*).orderBy(order: _*)

  /** `change_detect`, whole-point form — pass rows that differ from the
    * previous row on ANY compared column (esp_change_detect.erl:95-99:
    * fields undefined → the whole fields MAP is compared for equality;
    * null-safe so a null-vs-value flip counts as a change, like a
    * missing-vs-present map key). First row passes (:94 empty
    * LastValues).
    */
  def changeDetect(df: DataFrame, fields: Seq[Column], keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    val firstRow = lag(lit(1), 1).over(w).isNull
    val changed = fields.map(f => !(lag(f, 1).over(w) <=> f)).reduce(_ || _)
    df.withColumn("_chg", firstRow || changed).filter(col("_chg")).drop("_chg")
  }

  /** `change_detect`, monitored-fields form (esp_change_detect.erl
    * check/4, pinned by its eunit): a point is SUPPRESSED if any
    * monitored field is defined on both sides and EQUAL — i.e. every
    * defined monitored field must change for the point to pass; an
    * undefined previous or current value never vetoes. First row passes
    * (no previous values → no veto).
    */
  def changeDetectMonitored(df: DataFrame, fields: Seq[Column],
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    val veto = fields
      .map(f => lag(f, 1).over(w).isNotNull && f.isNotNull &&
        lag(f, 1).over(w) === f)
      .reduce(_ || _)
    df.withColumn("_veto", veto).filter(!col("_veto")).drop("_veto")
  }

  /** `value_diff` — difference to previous value; modes abs / c-p / p-c
    * (ref: esp_value_diff.erl:18-20,43-55).
    */
  def valueDiff(df: DataFrame, field: Column, mode: String, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val prev = lag(field, 1).over(spec(keys, order))
    val d = mode match {
      case "c-p" => field - prev
      case "p-c" => prev - field
      case "abs" => abs(field - prev)
      case m     => throw new IllegalArgumentException(s"value_diff mode: $m")
    }
    df.withColumn(as, d)
  }

  /** `time_diff` — ms between consecutive rows (ref: esp_time_diff.erl:31-59). */
  def timeDiff(df: DataFrame, tsMs: Column, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn(as, tsMs - lag(tsMs, 1).over(spec(keys, order)))

  /** Run id — increments whenever the boolean `state` flips; the shared
    * core of the run-length family (ref: lib/state_change.erl new/process).
    */
  def runId(df: DataFrame, state: Column, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    val flip = when(
      lag(state, 1).over(w).isNull || lag(state, 1).over(w) =!= state, 1L)
      .otherwise(0L)
    // two stacked window passes over the same (keys, order) spec — Catalyst
    // plans them in one Window operator chain with a single sort
    df.withColumn("_flip", flip)
      .withColumn(as, sum(col("_flip")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_flip")
  }

  /** `state_count` — consecutive-true count while in state, -1 otherwise
    * (ref: esp_state_count.erl:33-55).
    */
  def stateCount(df: DataFrame, state: Column, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val withRun = runId(df, state, "_run", keys, order)
    val w = spec(keys :+ col("_run"), order)
    withRun
      .withColumn(as, when(state, row_number().over(w).cast("long")).otherwise(-1L))
      .drop("_run")
  }

  /** `state_duration` — ms the state has held, -1 when out of state
    * (ref: esp_state_duration.erl:39-66).
    */
  def stateDuration(df: DataFrame, state: Column, tsMs: Column, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val withRun = runId(df, state, "_run", keys, order)
    val w = spec(keys :+ col("_run"), order)
      .rowsBetween(Window.unboundedPreceding, 0)
    withRun
      .withColumn(as, when(state, tsMs - min(tsMs).over(w)).otherwise(-1L))
      .drop("_run")
  }

  /** `state_change` — emit on enter/leave edges with a transition tag
    * (ref: esp_state_change.erl:45-96).
    */
  def stateChange(df: DataFrame, state: Column, as: String,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    val prev = lag(state, 1).over(w)
    val tag = when(state && (prev.isNull || !prev), lit("enter"))
      .when(!state && prev, lit("leave"))
    df.withColumn(as, tag).filter(col(as).isNotNull)
  }

  /** `state_sequence` with general per-step predicates (ref:
    * esp_state_sequence.erl:47-105 lambda list, strict mode — strict
    * means the matching rows must be consecutive, which is exactly the
    * lag-chain formulation): each predicate is evaluated per row first,
    * then the chain checks row k-back against predicate n-1-k plus the
    * step timeouts. Emits the rows completing the sequence.
    */
  def stateSequence(df: DataFrame, preds: Seq[Column],
      timeoutsMs: Seq[Long], tsMs: Column,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    require(preds.size >= 2 && timeoutsMs.size == preds.size - 1)
    val w = spec(keys, order)
    val n = preds.size
    val withB = preds.zipWithIndex.foldLeft(df) { case (d, (p, i)) =>
      d.withColumn(s"_b$i", p)
    }
    val valueConds = (0 until n).map { k =>
      val b = col(s"_b${n - 1 - k}")
      if (k == 0) b else lag(b, k).over(w)
    }
    val gapConds = (1 until n).map { k =>
      val newer = if (k == 1) tsMs else lag(tsMs, k - 1).over(w)
      val older = lag(tsMs, k).over(w)
      newer - older <= lit(timeoutsMs(n - 1 - k))
    }
    withB.withColumn("_seq_ok", (valueConds ++ gapConds).reduce(_ && _))
      .filter(col("_seq_ok"))
      .drop("_seq_ok" +: (0 until n).map(i => s"_b$i"): _*)
  }

  /** `state_sequence`, non-strict mode (ref: esp_state_sequence.erl
    * strict=false — other points may occur between the steps): greedy
    * chain of prefix-max carries. Step 0 rows stamp their ts; step k is
    * valid when it lies within `timeoutsMs(k-1)` of the latest valid
    * step-(k-1) row strictly before it; rows completing the last step
    * are emitted. One sort per key — every carry is a window max over
    * the same (keys, order) spec.
    */
  def stateSequenceAny(df: DataFrame, preds: Seq[Column],
      timeoutsMs: Seq[Long], tsMs: Column,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    require(preds.size >= 2 && timeoutsMs.size == preds.size - 1)
    val prefix = spec(keys, order).rowsBetween(Window.unboundedPreceding, -1)
    val n = preds.size
    val seeded = df.withColumn("_v0", when(preds.head, tsMs))
    val chained = (1 until n - 1).foldLeft(seeded) { (d, k) =>
      d.withColumn(s"_m${k - 1}", max(col(s"_v${k - 1}")).over(prefix))
        .withColumn(s"_v$k",
          when(preds(k) && tsMs - col(s"_m${k - 1}") <= timeoutsMs(k - 1), tsMs))
    }
    val last = chained
      .withColumn(s"_m${n - 2}", max(col(s"_v${n - 2}")).over(prefix))
      .filter(preds(n - 1) &&
        tsMs - col(s"_m${n - 2}") <= timeoutsMs(n - 2))
    last.drop((0 until n - 1).map(i => s"_v$i") ++
      (0 until n - 1).map(i => s"_m$i"): _*)
  }

  /** `state_sequence` over a discriminant column: the sequence matches when
    * the last `seq.size` values of `disc` (in order) equal `seq` and each
    * consecutive gap is within `timeoutsMs`. Emits the completing rows.
    */
  def stateSequenceOver(df: DataFrame, disc: Column, seq: Seq[String],
      timeoutsMs: Seq[Long], tsMs: Column,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    require(seq.size >= 2 && timeoutsMs.size == seq.size - 1)
    val w = spec(keys, order)
    val n = seq.size
    val valueConds = (0 until n).map { k =>
      val expect = seq(n - 1 - k)
      (if (k == 0) disc else lag(disc, k).over(w)) === lit(expect)
    }
    val gapConds = (1 until n).map { k =>
      val newer = if (k == 1) tsMs else lag(tsMs, k - 1).over(w)
      val older = lag(tsMs, k).over(w)
      newer - older <= lit(timeoutsMs(n - 1 - k))
    }
    val all = (valueConds ++ gapConds).reduce(_ && _)
    df.withColumn("_seq_ok", all).filter(col("_seq_ok")).drop("_seq_ok")
  }

  /** `state_change_bulk` — edge detection over many monitored booleans at
    * once (ref: esp_state_change_bulk.erl:53-99): adds one edge-tag column
    * per entry (`enter`/`leave`/null); rows where no field changed are
    * dropped.
    */
  def stateChangeBulk(df: DataFrame, states: Seq[(String, Column)],
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    val tagged = states.foldLeft(df) { case (d, (name, state)) =>
      val prev = lag(state, 1).over(w)
      d.withColumn(s"${name}_edge",
        when(state && (prev.isNull || !prev), lit("enter"))
          .when(!state && prev, lit("leave")))
    }
    tagged.filter(states.map { case (n, _) => col(s"${n}_edge").isNotNull }
      .reduce(_ || _))
  }

  /** `triggered_timeout` batch analog (ref: esp_triggered_timeout.erl:46-56
    * timeout/timeout_trigger/cancel_trigger): emit every trigger row that is
    * NOT followed by a cancel row within `timeoutMs` on the same key. The
    * actor's per-key timer FSM becomes one forward-looking window min —
    * single keyed shuffle, single sorted pass. The true wall-clock timer
    * form is graft.streaming.Streaming.triggeredTimeout.
    */
  def triggeredTimeout(df: DataFrame, trigger: Column, cancel: Column,
      timeoutMs: Long, tsMs: Column,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order).rowsBetween(1, Window.unboundedFollowing)
    df.withColumn("_next_cancel", min(when(cancel, tsMs)).over(w))
      .filter(trigger &&
        (col("_next_cancel").isNull || col("_next_cancel") - tsMs > timeoutMs))
      .drop("_next_cancel")
  }

  /** `deadman` batch analog — detect silences longer than `thresholdMs`
    * (ref: esp_deadman.erl:43-75); emits one row per gap with the previous
    * timestamp and gap length. The true heartbeat-emitting form is the
    * streaming operator graft.streaming.Streaming.deadman.
    */
  def deadmanGaps(df: DataFrame, tsMs: Column, thresholdMs: Long,
      keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = spec(keys, order)
    df.withColumn("_prev_ms", lag(tsMs, 1).over(w))
      .withColumn("gap_ms", tsMs - col("_prev_ms"))
      .filter(col("gap_ms") > thresholdMs)
      .withColumnRenamed("_prev_ms", "prev_ms")
  }
}
