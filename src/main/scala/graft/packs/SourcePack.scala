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
        // ts_raw rides along so each poll's range predicate lands on the
        // RAW parquet column (row-group skipping; PollSource
        // .windowPredicate) — dropped after the filter
        val ev = Tables.eventsWithRaw(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("value"), col("ts_raw"))
        val bounds = ev.agg(min("ts_ms"), max("ts_ms")).head
        val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
        val period = math.max(1L, (mx - mn) / 8)
        val poller = new PollSource.IncrementalPoll(
          startMs = mn, periodMs = period, offsetMs = 0L,
          minIntervalMs = 0L, stopMs = Some(mx + period))
        PollSource.pollAll(poller, nowMs = mx + period,
          w => ev.filter(PollSource.windowPredicate(ev, "ts_ms", w))
            .drop("ts_raw"))
          .getOrElse(throw new IllegalStateException("no poll windows"))
      },
      Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
             |FROM events""".stripMargin)),

    // crate_query's time-bucket rewrite, end-to-end through the DFS node
    // (esp_crate_query.erl:144-171 build_query; eunit :216-225): N poll
    // windows, each rewritten to a bucket GROUP BY, must reproduce ONE
    // global time-bucket query exactly — proving the bucket-aligned mark
    // timeline never splits a bucket across polls.
    "poll_bucketed" -> QueryDef(
      (s, dir) => graft.dfs.DfsEngine.runSingle(
        """#|crate_query(
           #  .query('SELECT event_type, count(*) AS n, max(value) AS vmax FROM events')
           #  .group_by_time(2m)
           #  .period(30m)
           #  .group_by('event_type'))
           #""".stripMargin('#'), s, dir),
      Some("""SELECT event_type,
             |  (epoch_ms(ts) // 1000 // 120) * 120 AS ts_gb,
             |  count(*) AS n, max(value) AS vmax
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // mongo_query's find-selector semantics (esp_mongo_query.erl:40-62):
    // the JSON selector translates to a relational predicate
    // (io/MongoFilter.scala) that must match ANSI SQL exactly —
    // operators, range bounds, IN lists and implicit AND all hash-pinned.
    "mongo_find" -> QueryDef(
      (s, dir) => graft.dfs.DfsEngine.runSingle(
        """#|mongo_query(
           #  .collection('events')
           #  .query('{"event_type": {"$in": ["click", "view"]}, "value": {"$gt": 50, "$lte": 95}}'))
           #|keep('event_id', 'user_id', 'event_type', 'value')
           #""".stripMargin('#'), s, dir),
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE event_type IN ('click', 'view')
             |  AND value > 50 AND value <= 95""".stripMargin)),

    // file sinks + blobstream sources under the oracle: nation rides
    // through BOTH the csv and jsonl sink→source round-trips (quoting,
    // header, schema re-application all exercised), the two legs are
    // re-joined, and the result must still hash-match the parquet truth —
    // any encode/decode corruption on either leg breaks the pin.
    "blob_roundtrip" -> QueryDef(
      (s, dir) => {
        val ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
        val tmp = java.nio.file.Files.createTempDirectory("graft_blob").toString
        val nation = Tables.load(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        graft.io.Sinks.csv(nation, s"$tmp/csv")
        graft.io.Sinks.jsonLines(nation, s"$tmp/jsonl")
        val csvBack = graft.io.Sources.csv(s, s"$tmp/csv", schema = Some(ddl))
        val jsonBack = graft.io.Sources.jsonLines(s, s"$tmp/jsonl",
          schema = Some(ddl))
        csvBack.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .join(jsonBack.select(col("n_nationkey"),
            length(col("n_name")).cast("long").as("name_len")),
            "n_nationkey")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey,
             |  length(n_name) AS name_len
             |FROM nation""".stripMargin))
  )
}
