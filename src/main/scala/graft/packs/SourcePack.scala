package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.io.PollSource
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for the engine-side source machinery
  * (SURVEY §2.7): the incremental polling planner over parquet slices.
  */
object SourcePack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    // N successive polls ≡ one batch query: the advancing [from, to)
    // planner (esp_crate_query_cont.erl:406-434) partitions the corpus
    // timeline into ~9 windows, each becoming a pushdown range scan; the
    // union must reproduce the full table EXACTLY (hash match) — proving
    // no window overlaps and none is skipped. Start/stop are derived from
    // a one-row setup aggregate, the reference's setup_query behavior
    // (esp_crate_query_cont.erl start/setup_start).
    "poll_incremental" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_ms"), col("value"))
        val bounds = ev.agg(min("ts_ms"), max("ts_ms")).head
        val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
        val period = math.max(1L, (mx - mn) / 8)
        val poller = new PollSource.IncrementalPoll(
          startMs = mn, periodMs = period, offsetMs = 0L,
          minIntervalMs = 0L, stopMs = Some(mx + period))
        PollSource.pollAll(poller, nowMs = mx + period,
          w => PollSource.poll(ev, col("ts_ms"), w))
          .getOrElse(throw new IllegalStateException("no poll windows"))
      },
      Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
             |FROM events""".stripMargin))
  )
}
