package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.stateless.Transforms
import graft.operators.window.Windows
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for SURVEY §2.5 window operators.
  *
  * Determinism policy: double sums are order-dependent, so windowed sums go
  * through `floor(value*1000)::BIGINT` (exact in both engines); count/min/max
  * are order-independent. Window bounds are emitted as epoch-ms BIGINT.
  */
object WindowPack extends QueryPack {

  private val vsumM = sum(floor(col("value") * 1000).cast("long")).as("vsum_m")

  def entries: Map[String, QueryDef] = Map(
    // win_time tumbling (every == period), keyed by event_type
    // (ref: esp_win_time.erl:28-96).
    "win_time_tumbling" -> QueryDef(
      (s, dir) =>
        Windows.tumblingAgg(
          Tables.events(s, dir), col("ts"), "1 hour", Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), min(col("value")).as("vmin"),
            max(col("value")).as("vmax"), vsumM)),
      Some("""SELECT event_type,
             |  (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
             |  (epoch_ms(ts) // 3600000) * 3600000 + 3600000 AS window_end_ms,
             |  count(*) AS n, min(value) AS vmin, max(value) AS vmax,
             |  CAST(sum(CAST(floor(value*1000) AS BIGINT)) AS BIGINT) AS vsum_m
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // win_time sliding: period 2h, every 1h — each row lands in 2 windows
    // (ref: esp_win_time.erl period/every options).
    "win_time_sliding" -> QueryDef(
      (s, dir) =>
        Windows.slidingAgg(
          Tables.events(s, dir), col("ts"), "2 hours", "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), min(col("value")).as("vmin"),
            max(col("value")).as("vmax"))),
      Some("""SELECT event_type, ws AS window_start_ms,
             |  ws + 7200000 AS window_end_ms,
             |  count(*) AS n, min(value) AS vmin, max(value) AS vmax
             |FROM (SELECT event_type, value,
             |        ((epoch_ms(ts) // 3600000) - k.k) * 3600000 AS ws
             |      FROM events, (SELECT UNNEST([0, 1]) AS k) k)
             |GROUP BY 1, 2, 3""".stripMargin)),

    // fill_period: suppress the partial head window before one full period
    // of data exists (ref: esp_win_time.erl:88-96 check_emit).
    "win_time_fill_period" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val windowed = Windows.tumblingAgg(
          ev, col("ts"), "1 day", Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), max(col("value")).as("vmax")))
        Windows.fillPeriod(windowed, ev, col("ts"))
      },
      Some("""SELECT event_type,
             |  (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
             |  (epoch_ms(ts) // 86400000) * 86400000 + 86400000 AS window_end_ms,
             |  count(*) AS n, max(value) AS vmax
             |FROM events GROUP BY 1, 2, 3
             |HAVING window_start_ms >= (SELECT min(epoch_ms(ts)) FROM events)""".stripMargin)),

    // win_session: 6h inactivity gap per user (ref: esp_win_session.erl:30-57).
    // Oracle = gaps-and-islands; break on gap >= the timeout in µs exactly as
    // session_window does (a new event at exactly start+gap opens a session).
    "win_session" -> QueryDef(
      (s, dir) =>
        Windows.sessionAgg(
          Tables.events(s, dir), col("ts"), "6 hours", Seq(col("user_id")),
          Seq(count(lit(1)).as("n"), min(col("value")).as("vmin"))),
      Some("""WITH x AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), y AS (
             |  SELECT *, sum(brk) OVER
             |    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM x)
             |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
             |  epoch_ms(max(ts)) + 21600000 AS session_end_ms,
             |  count(*) AS n, min(value) AS vmin
             |FROM y GROUP BY user_id, sess""".stripMargin)),

    // win_event / batch count window, keyed (ref: esp_win_event.erl:29-82):
    // every 10 rows per user in ts order form one window.
    "win_count_tumbling" -> QueryDef(
      (s, dir) =>
        Windows.countTumblingAgg(
          Tables.events(s, dir), 10, Seq(col("ts_ns"), col("event_id")),
          Seq(col("user_id")),
          Seq(count(lit(1)).as("n"), min(col("ts_ms")).as("first_ms"), vsumM)),
      Some("""SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
             |  count(*) AS n, min(ms) AS first_ms,
             |  CAST(sum(vm) AS BIGINT) AS vsum_m
             |FROM (SELECT user_id, epoch_ms(ts) AS ms,
             |        CAST(floor(value*1000) AS BIGINT) AS vm,
             |        row_number() OVER
             |          (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
             |      FROM events)
             |GROUP BY 1, 2""".stripMargin)),

    // win_event sliding count window: period 10 rows, emit every 5 rows
    // (ref: esp_win_event.erl:56-82). Partial head windows emit too
    // (fill_period off), matching the row-range [k*5-10, k*5).
    "win_count_sliding" -> QueryDef(
      (s, dir) =>
        Windows.countSlidingAgg(
          Tables.events(s, dir), 10, 5,
          Seq(col("ts_ns"), col("event_id")), Seq(col("user_id")),
          Seq(count(lit(1)).as("n"), min(col("ts_ms")).as("first_ms"), vsumM)),
      Some("""SELECT user_id, k AS win_id, count(*) AS n, min(ms) AS first_ms,
             |  CAST(sum(vm) AS BIGINT) AS vsum_m
             |FROM (SELECT user_id, epoch_ms(ts) AS ms,
             |        CAST(floor(value*1000) AS BIGINT) AS vm,
             |        row_number() OVER
             |          (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
             |      FROM events),
             |  UNNEST(generate_series(CAST(ceil(rn / 5.0) AS BIGINT),
             |    (rn - 1 + 10) // 5)) t(k)
             |GROUP BY 1, 2""".stripMargin)),

    // sample duration mode: first row per day (ref: esp_sample.erl:27-67) —
    // partitioned by the time bucket, never a global sort.
    "sample_first_per" -> QueryDef(
      (s, dir) =>
        Transforms.sampleFirstPer(
          Tables.events(s, dir), col("ts"), 86400000L,
          Seq(col("ts_ns"), col("event_id")))
          .select(col("event_id"), col("ts_ms").as("ms")),
      Some("""SELECT event_id, epoch_ms(ts) AS ms FROM (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY (epoch_ms(ts) // 86400000)
             |     ORDER BY epoch_ns(ts), event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin))
  )
}
