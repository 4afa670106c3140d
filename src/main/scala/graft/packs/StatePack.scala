package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.state.StateOps
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for SURVEY §2.6 state/edge-detection operators.
  *
  * All run on `events` keyed by `user_id` and ordered by (ts_ns, event_id) —
  * a total order, so every lag/run computation is deterministic. The oracle
  * mirrors the same windows with epoch_ns ordering.
  */
object StatePack extends QueryPack {

  private val keys = Seq(col("user_id"))
  private val order = Seq(col("ts_ns"), col("event_id"))
  private val oraW = "PARTITION BY user_id ORDER BY epoch_ns(ts), event_id"

  def entries: Map[String, QueryDef] = Map(
    // change_detect: pass rows whose event_type differs from the previous
    // row (ref: esp_change_detect.erl:41-196). First row passes.
    "state_change_detect" -> QueryDef(
      (s, dir) =>
        StateOps.changeDetect(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ms"), col("ts_ns")),
          Seq(col("event_type")), keys, order)
          .drop("ts_ns"),
      // first-row marker + IS DISTINCT FROM mirror the engine's
      // null-safe form exactly (a value→NULL flip is a change, NULL→NULL
      // is not) — the plain lag IS NULL / <> pair diverges on nullable
      // monitored fields
      Some(s"""SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
              |FROM events
              |QUALIFY lag(1) OVER ($oraW) IS NULL
              |   OR lag(event_type) OVER ($oraW)
              |      IS DISTINCT FROM event_type""".stripMargin)),

    // value_diff, all three modes (ref: esp_value_diff.erl:18-20,43-55).
    "state_value_diff" -> QueryDef(
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"), col("ts_ns"))
        val d1 = StateOps.valueDiff(base, col("value"), "c-p", "d_cp", keys, order)
        val d2 = StateOps.valueDiff(d1, col("value"), "p-c", "d_pc", keys, order)
        StateOps.valueDiff(d2, col("value"), "abs", "d_abs", keys, order)
          .drop("ts_ns")
      },
      Some(s"""SELECT event_id, user_id, value,
              |  value - lag(value) OVER ($oraW) AS d_cp,
              |  lag(value) OVER ($oraW) - value AS d_pc,
              |  abs(value - lag(value) OVER ($oraW)) AS d_abs
              |FROM events""".stripMargin)),

    // time_diff: ms between consecutive rows (ref: esp_time_diff.erl:31-59).
    "state_time_diff" -> QueryDef(
      (s, dir) =>
        StateOps.timeDiff(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_ms"), col("ts_ns")),
          col("ts_ms"), "dt_ms", keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
              |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER ($oraW) AS dt_ms
              |FROM events""".stripMargin)),

    // state_count: consecutive count while value > 50, else -1
    // (ref: esp_state_count.erl:33-55).
    "state_count" -> QueryDef(
      (s, dir) =>
        StateOps.stateCount(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("value"), col("ts_ns")),
          col("value") > 50, "sc", keys, order)
          .drop("ts_ns"),
      Some(s"""WITH x AS (
              |  SELECT event_id, user_id, value, ts, value > 50 AS st,
              |    CASE WHEN lag(value > 50) OVER ($oraW) IS NULL
              |      OR lag(value > 50) OVER ($oraW) <> (value > 50)
              |    THEN 1 ELSE 0 END AS flip
              |  FROM events
              |), y AS (
              |  SELECT *, sum(flip) OVER
              |    ($oraW ROWS UNBOUNDED PRECEDING) AS run FROM x)
              |SELECT event_id, user_id, value,
              |  CASE WHEN st THEN CAST(row_number() OVER
              |    (PARTITION BY user_id, run ORDER BY epoch_ns(ts), event_id)
              |    AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sc
              |FROM y""".stripMargin)),

    // state_duration: ms the state has held, -1 out of state
    // (ref: esp_state_duration.erl:39-66).
    "state_duration" -> QueryDef(
      (s, dir) =>
        StateOps.stateDuration(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("value"),
              col("ts_ms"), col("ts_ns")),
          col("value") > 50, col("ts_ms"), "sd", keys, order)
          .drop("ts_ns"),
      Some(s"""WITH x AS (
              |  SELECT event_id, user_id, value, ts, epoch_ms(ts) AS ts_ms,
              |    value > 50 AS st,
              |    CASE WHEN lag(value > 50) OVER ($oraW) IS NULL
              |      OR lag(value > 50) OVER ($oraW) <> (value > 50)
              |    THEN 1 ELSE 0 END AS flip
              |  FROM events
              |), y AS (
              |  SELECT *, sum(flip) OVER
              |    ($oraW ROWS UNBOUNDED PRECEDING) AS run FROM x)
              |SELECT event_id, user_id, value, ts_ms,
              |  CASE WHEN st THEN ts_ms - min(ts_ms) OVER
              |    (PARTITION BY user_id, run)
              |  ELSE CAST(-1 AS BIGINT) END AS sd
              |FROM y""".stripMargin)),

    // state_change: enter/leave edges of value > 50
    // (ref: esp_state_change.erl:45-96).
    "state_change" -> QueryDef(
      (s, dir) =>
        StateOps.stateChange(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("value"), col("ts_ns")),
          col("value") > 50, "edge", keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, value, edge FROM (
              |  SELECT event_id, user_id, value,
              |    CASE WHEN (value > 50) AND (lag(value > 50) OVER ($oraW)
              |           IS NULL OR NOT lag(value > 50) OVER ($oraW))
              |         THEN 'enter'
              |         WHEN NOT (value > 50) AND lag(value > 50) OVER ($oraW)
              |         THEN 'leave' END AS edge
              |  FROM events) WHERE edge IS NOT NULL""".stripMargin)),

    // state_sequence: view → click → purchase, each step within 7 days
    // (ref: esp_state_sequence.erl:47-105); emits the completing rows.
    "state_sequence" -> QueryDef(
      (s, dir) =>
        StateOps.stateSequenceOver(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ms"), col("ts_ns")),
          col("event_type"), Seq("view", "click", "purchase"),
          Seq(604800000L, 604800000L), col("ts_ms"), keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, event_type, ts_ms FROM (
              |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
              |    lag(event_type, 1) OVER ($oraW) AS p1,
              |    lag(event_type, 2) OVER ($oraW) AS p2,
              |    epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER ($oraW) AS g1,
              |    lag(epoch_ms(ts), 1) OVER ($oraW)
              |      - lag(epoch_ms(ts), 2) OVER ($oraW) AS g2
              |  FROM events)
              |WHERE event_type = 'purchase' AND p1 = 'click' AND p2 = 'view'
              |  AND g1 <= 604800000 AND g2 <= 604800000""".stripMargin)),

    // state_change_bulk: edges of two monitored states at once
    // (ref: esp_state_change_bulk.erl:53-99).
    "state_change_bulk" -> QueryDef(
      (s, dir) =>
        StateOps.stateChangeBulk(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("value"),
              col("event_type"), col("ts_ns")),
          Seq("hi" -> (col("value") > 50), "clk" -> (col("event_type") === "click")),
          keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, value, event_type, hi_edge, clk_edge
              |FROM (
              |  SELECT event_id, user_id, value, event_type,
              |    CASE WHEN (value > 50) AND (lag(value > 50) OVER ($oraW)
              |           IS NULL OR NOT lag(value > 50) OVER ($oraW))
              |         THEN 'enter'
              |         WHEN NOT (value > 50) AND lag(value > 50) OVER ($oraW)
              |         THEN 'leave' END AS hi_edge,
              |    CASE WHEN (event_type = 'click') AND
              |           (lag(event_type = 'click') OVER ($oraW) IS NULL
              |            OR NOT lag(event_type = 'click') OVER ($oraW))
              |         THEN 'enter'
              |         WHEN NOT (event_type = 'click') AND
              |           lag(event_type = 'click') OVER ($oraW)
              |         THEN 'leave' END AS clk_edge
              |  FROM events)
              |WHERE hi_edge IS NOT NULL OR clk_edge IS NOT NULL""".stripMargin)),

    // state_sequence with general per-step predicates: a low reading
    // (< 30) followed immediately by a high one (> 70) within 7 days
    // (ref: esp_state_sequence.erl:47-105 lambda list, strict mode).
    "state_sequence_pred" -> QueryDef(
      (s, dir) =>
        StateOps.stateSequence(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("value"),
              col("ts_ms"), col("ts_ns")),
          Seq(col("value") < 30, col("value") > 70),
          Seq(604800000L), col("ts_ms"), keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, value, ts_ms FROM (
              |  SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms,
              |    lag(value) OVER ($oraW) AS pv,
              |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER ($oraW) AS gap
              |  FROM events)
              |WHERE value > 70 AND pv < 30 AND gap <= 604800000""".stripMargin)),

    // state_sequence non-strict: view …then… click …then… purchase with
    // other events allowed in between, each step within 7 days of the
    // latest valid previous step (ref: esp_state_sequence.erl strict=false).
    "state_sequence_any" -> QueryDef(
      (s, dir) =>
        StateOps.stateSequenceAny(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ms"), col("ts_ns")),
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"),
          Seq(604800000L, 604800000L), col("ts_ms"), keys, order)
          .drop("ts_ns"),
      Some(s"""WITH x AS (
              |  SELECT event_id, user_id, event_type, ts, epoch_ms(ts) AS ts_ms,
              |    CASE WHEN event_type = 'view' THEN epoch_ms(ts) END AS v0
              |  FROM events
              |), y AS (
              |  SELECT *, max(v0) OVER
              |    ($oraW ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m0
              |  FROM x
              |), z AS (
              |  SELECT *, CASE WHEN event_type = 'click'
              |    AND ts_ms - m0 <= 604800000 THEN ts_ms END AS v1 FROM y
              |), w2 AS (
              |  SELECT *, max(v1) OVER
              |    ($oraW ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
              |  FROM z)
              |SELECT event_id, user_id, event_type, ts_ms FROM w2
              |WHERE event_type = 'purchase' AND ts_ms - m1 <= 604800000""".stripMargin)),

    // deadman (batch analog): silences > 2 days per user
    // (ref: esp_deadman.erl:43-75).
    "state_deadman_gaps" -> QueryDef(
      (s, dir) =>
        StateOps.deadmanGaps(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_ms"), col("ts_ns")),
          col("ts_ms"), 172800000L, keys, order)
          .drop("ts_ns"),
      Some(s"""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
              |  lag(epoch_ms(ts)) OVER ($oraW) AS prev_ms,
              |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER ($oraW) AS gap_ms
              |FROM events
              |QUALIFY gap_ms > 172800000""".stripMargin))
  )
}
