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
             |FROM nation""".stripMargin)),

    // influx_out's line-protocol encoder under the oracle (previously
    // wire-byte unit pins only): every events row renders to its full
    // `m,tag=v f=v,f=v ts\n` line — compact-float trim, null-field
    // drop, null-tag drop and the timestamp clause all replayed
    // string-for-string by DuckDB (esp_influx_out.erl:203-214;
    // lib/influx_line.erl:229-257 value encoding)
    "io_influx_lines" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("user_id"),
            col("value"), col("ts_ms"))
        ev.select(col("event_id"),
          graft.io.InfluxLine.encode(ev, lit("events"),
            fields = Seq("value", "user_id"),
            tags = Seq("event_type"),
            ts = Some(col("ts_ms"))).as("line"))
      },
      Some(influxLinesSql)),

    // the email node's template render + message assembly under the
    // oracle (esp_email.erl:115-137): `{{field}}` substitution, the
    // ##PREHEADER##/##CONTENT## wrap and the header block are one
    // deterministic string per alert row — DuckDB rebuilds the exact
    // bytes, so a drifted placeholder or header flips the hash
    "io_email_render" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("value") > 95)
        val subject = graft.io.EmailFormat.template(
          "[graft] {{event_type}} from user {{user_id}}")
        val content = graft.io.EmailFormat.template(
          "event {{event_id}}: value {{value}} at {{ts_ms}}")
        val body = graft.io.EmailFormat.wrapTemplate(
          "<html><head><!--##PREHEADER##--></head>" +
            "<body>##CONTENT##</body></html>", content)
        ev.select(col("event_id"),
          graft.io.EmailFormat.message("alerts@graft",
            Seq("ops@graft", "oncall@graft"), subject, body).as("msg"))
      },
      Some(emailRenderSql)),

    // s7read's address-partition planner as oracle rows: the
    // reference's own eunit fixture (54 addresses — bool runs split by
    // a byte gap, a word run, a DBS string) must coalesce to EXACTLY
    // its published partitions with the run-relative bit offsets
    // (esp_s7read.erl:390-455; the expected rows are the eunit's Res /
    // AliasesList verbatim, so the oracle is reference ground truth,
    // not a copy of this engine's output)
    "io_s7_plan" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val addrs = Seq(
          "DB11136.DBX88.0", "DB11136.DBX88.1", "DB11136.DBX88.2",
          "DB11136.DBX88.3", "DB11136.DBX90.0", "DB11136.DBX90.1",
          "DB11136.DBX90.2", "DB11136.DBX90.3", "DB11136.DBX90.4",
          "DB11136.DBX90.5", "DB11136.DBX90.6", "DB11136.DBX90.7",
          "DB11136.DBX91.0", "DB11136.DBX91.1", "DB11136.DBX91.2",
          "DB11136.DBX91.3", "DB11136.DBX91.7", "DB11136.DBX92.0",
          "DB11136.DBX92.1", "DB11136.DBX92.2", "DB11136.DBX92.3",
          "DB11136.DBX92.4", "DB11136.DBX92.5", "DB11136.DBX92.6",
          "DB11136.DBX92.7", "DB11136.DBX93.0", "DB11136.DBX93.1",
          "DB11136.DBX93.2", "DB11136.DBX93.3", "DB11136.DBX93.4",
          "DB11136.DBX93.5", "DB11136.DBX93.6", "DB11136.DBX93.7",
          "DB11136.DBX94.0", "DB11136.DBX94.1", "DB11136.DBW96",
          "DB11136.DBW98", "DB11136.DBX100.0", "DB11136.DBX100.1",
          "DB11136.DBX100.2", "DB11136.DBX100.4", "DB11136.DBX100.5",
          "DB11136.DBX100.6", "DB11136.DBX100.7", "DB11136.DBX101.0",
          "DB11136.DBX101.1", "DB11136.DBX101.2", "DB11136.DBX101.3",
          "DB11136.DBX101.4", "DB11136.DBX101.6", "DB11136.DBX101.7",
          "DB11136.DBX102.0", "DB11136.DBX102.1", "DB8034.DBS66.30")
        val parsed = addrs.map(a => graft.io.PlcPlan.parseS7(a).getOrElse(
          throw new IllegalStateException(s"io_s7_plan: unparseable $a")))
        val (parts, als) = graft.io.PlcPlan.buildS7(parsed,
          addrs.map(_.replace(".", "_")))
        parts.zip(als).zipWithIndex.map { case ((p, a), i) =>
          (i, p.area, p.dbNumber, p.start, p.amount, p.wordLen,
            a.aliases.size, a.kinds.headOption.getOrElse(""),
            a.bits.mkString(","))
        }.toDF("part_idx", "area", "db", "start_byte", "amount",
          "word_len", "n_aliases", "kind", "bits")
      },
      Some(s7PlanSql)),

    // modbus_read's contiguous-register coalescing as oracle rows —
    // the reference's build_find_contiguous eunit fixture and its
    // exact expected partitions, last-partition-first order included
    // (esp_modbus_read.erl:274-293)
    "io_modbus_plan" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.io.PlcPlan._
        def rq(alias: String, start: Int) =
          ModbusReq(alias, "read_hregs", start, 2, "float32")
        val reqs = Seq(
          rq("ActiveEnergyRcvd", 2701), rq("ActiveEnergyDelvd", 2699),
          rq("ReactiveEnergyRcvd", 2709), rq("ReactiveEnergyDelvd", 2707),
          rq("ApparentEnergyRcvd", 2717), rq("ApparentEnergyDelvd", 2715),
          rq("MaximalCurrentValue", 3009))
        findContiguousModbus(reqs).zipWithIndex.map { case (p, i) =>
          (i, p.alias, p.function, p.start, p.amount, p.count, p.opts,
            p.aliases.mkString(","))
        }.toDF("part_idx", "alias", "fn", "start_reg", "amount",
          "n_reqs", "opts", "aliases")
      },
      Some(modbusPlanSql))
  )

  /** Oracle for [[io_influx_lines]]: DuckDB rebuilds each line byte
    * for byte — printf + trailing-zero trim is the compact-float law,
    * concat_ws's null-skip is the null-field drop on both engines.
    */
  private lazy val influxLinesSql: String =
    """WITH cf AS (
      |  SELECT event_id, event_type, user_id, value,
      |    epoch_ms(ts) AS ts_ms,
      |    CASE WHEN value IS NOT NULL THEN
      |      regexp_replace(printf('%.12f', value), '0+$', '') END AS vt
      |  FROM events)
      |SELECT event_id,
      |  'events' ||
      |  coalesce(',event_type=' || event_type, '') || ' ' ||
      |  concat_ws(',',
      |    CASE WHEN value IS NOT NULL THEN 'value=' ||
      |      (CASE WHEN vt LIKE '%.' THEN vt || '0' ELSE vt END) END,
      |    CASE WHEN user_id IS NOT NULL
      |      THEN 'user_id=' || CAST(user_id AS VARCHAR) END) ||
      |  coalesce(' ' || CAST(ts_ms AS VARCHAR), '') || chr(10) AS line
      |FROM cf""".stripMargin

  /** Oracle for [[io_email_render]]: the exact header block + the
    * double-marker template wrap, placeholder nulls rendering empty.
    */
  private lazy val emailRenderSql: String =
    """WITH c AS (
      |  SELECT event_id,
      |    'event ' || coalesce(CAST(event_id AS VARCHAR), '') ||
      |    ': value ' || coalesce(CAST(value AS VARCHAR), '') ||
      |    ' at ' || coalesce(CAST(epoch_ms(ts) AS VARCHAR), '')
      |      AS content,
      |    '[graft] ' || coalesce(event_type, '') || ' from user ' ||
      |    coalesce(CAST(user_id AS VARCHAR), '') AS subj
      |  FROM events WHERE value > 95)
      |SELECT event_id,
      |  'Subject: ' || subj || chr(13) || chr(10) ||
      |  'From: alerts@graft' || chr(13) || chr(10) ||
      |  'To: ops@graft,oncall@graft' || chr(13) || chr(10) ||
      |  'Content-Type: text/html' || chr(13) || chr(10) ||
      |  chr(13) || chr(10) ||
      |  '<html><head><!--' || content || '--></head><body>' ||
      |  content || '</body></html>' AS msg
      |FROM c""".stripMargin

  /** Oracle for [[io_s7_plan]]: the reference eunit's expected
    * partitions and run-relative bit lists, verbatim.
    */
  private lazy val s7PlanSql: String =
    """SELECT * FROM (VALUES
      |  (0, 'db', 11136, 88, 1, 'byte', 4, 'bool_byte', '0,1,2,3'),
      |  (1, 'db', 11136, 90, 5, 'byte', 31, 'bool_byte',
      |   '0,1,2,3,4,5,6,7,8,9,10,11,15,16,17,18,19,20,21,22,23,24,25,26,27,28,29,30,31,32,33'),
      |  (2, 'db', 11136, 100, 3, 'byte', 16, 'bool_byte',
      |   '0,1,2,4,5,6,7,8,9,10,11,12,14,15,16,17'),
      |  (3, 'db', 11136, 96, 2, 'word', 2, 'word', ''),
      |  (4, 'db', 8034, 66, 30, 'byte', 1, 'string', '')
      |) AS t(part_idx, area, db, start_byte, amount, word_len,
      |       n_aliases, kind, bits)""".stripMargin

  /** Oracle for [[io_modbus_plan]]: the reference eunit's expected
    * coalesced reads, last-partition-first order included.
    */
  private lazy val modbusPlanSql: String =
    """SELECT * FROM (VALUES
      |  (0, 'MaximalCurrentValue', 'read_hregs', 3009, 2, 1, 'float32',
      |   'MaximalCurrentValue'),
      |  (1, 'ActiveEnergyDelvd', 'read_hregs', 2699, 4, 2, 'float32',
      |   'ActiveEnergyDelvd,ActiveEnergyRcvd'),
      |  (2, 'ReactiveEnergyDelvd', 'read_hregs', 2707, 4, 2, 'float32',
      |   'ReactiveEnergyDelvd,ReactiveEnergyRcvd'),
      |  (3, 'ApparentEnergyDelvd', 'read_hregs', 2715, 4, 2, 'float32',
      |   'ApparentEnergyDelvd,ApparentEnergyRcvd')
      |) AS t(part_idx, alias, fn, start_reg, amount, n_reqs, opts,
      |       aliases)""".stripMargin
}
