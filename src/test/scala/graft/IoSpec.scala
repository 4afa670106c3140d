package graft

import graft.core.{Sessions, Tables}
import graft.io.{Sinks, Sources}
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IoSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "io-test")
  val sf = "/root/testdata/sf0.001"

  test("incremental poll planner: advancing windows, offset wait, stop, pacing") {
    import graft.io.PollSource
    import graft.io.PollSource.PollWindow
    // start 1000, period 100, offset 20: first mark 1100, due at now>=1120
    val p = new PollSource.IncrementalPoll(startMs = 1000L, periodMs = 100L,
      offsetMs = 20L, minIntervalMs = 5L, stopMs = Some(1400L))
    assert(p.next(nowMs = 1119L).isEmpty)            // ahead of time — wait
    assert(p.next(nowMs = 1120L).contains(PollWindow(1000L, 1100L)))
    // catch-up burst: due marks 1200, 1300, 1400 all fire; 1500 > stop
    assert(p.catchUp(nowMs = 5000L) ==
      Seq(PollWindow(1100L, 1200L), PollWindow(1200L, 1300L),
        PollWindow(1300L, 1400L)))
    assert(p.stopped && p.next(5000L).isEmpty)
    // pacing hint: behind schedule → min_interval floor; ahead → gap
    val q = new PollSource.IncrementalPoll(1000L, 100L, 20L, 5L)
    assert(q.nextDueInMs(nowMs = 9999L) == 5L)
    assert(q.nextDueInMs(nowMs = 1100L) == 20L)
    // bounded burst
    val r = new PollSource.IncrementalPoll(0L, 10L, 0L, 0L)
    assert(r.catchUp(nowMs = 1000L, max = 3).size == 3)
  }

  test("poll windows partition the corpus: union of N polls == one scan") {
    import graft.io.PollSource
    val ev = Tables.events(spark, sf).select("event_id", "ts_ms")
    val b = ev.agg(min("ts_ms"), max("ts_ms")).head
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val period = math.max(1L, (mx - mn) / 5)
    val poller = new PollSource.IncrementalPoll(mn, period, 0L, 0L,
      stopMs = Some(mx + period))
    val out = PollSource.pollAll(poller, mx + period,
      w => PollSource.poll(ev, col("ts_ms"), w)).get
    assert(out.count() == ev.count())                 // covering
    assert(out.select("event_id").distinct().count() == ev.count()) // disjoint
  }

  test("crate_query rewrite matches the reference eunit expectations") {
    import graft.io.CrateQuery
    // esp_crate_query.erl:217-219 time_group_test
    assert(CrateQuery.timeGroup(420000L, "ts") ==
      "floor(EXTRACT(epoch FROM ts)/420)*420 AS ts_gb")
    // esp_crate_query.erl:221-225 build_simple_query_test
    assert(CrateQuery.buildQuery(
      "SELECT COUNT(*) FROM table WHERE tag1 = 'test'", 300000L, "time",
      Seq("a", "b")) ==
      "SELECT floor(EXTRACT(epoch FROM time)/300)*300 AS time_gb, " +
        "COUNT(*) FROM table WHERE tag1 = 'test' AND time >= $1 AND " +
        "time <= $2 GROUP BY time_gb, a, b ORDER BY time_gb DESC")
    // no-WHERE query grows a WHERE clause
    assert(CrateQuery.buildQuery("SELECT COUNT(*) FROM t", 60000L, "ts", Nil)
      .contains(" WHERE ts >= $1 AND ts <= $2 GROUP BY ts_gb ORDER BY"))
  }

  test("crate_query polls reproduce one global bucket query") {
    import graft.io.CrateQuery
    val out = CrateQuery.runPolls(spark, sf,
      "SELECT event_type, count(*) AS n FROM events",
      groupByTimeMs = 120000L, timeField = "ts",
      groupBys = Seq("event_type"), periodMs = 1800000L)
    val expect = Tables.events(spark, sf)
      .groupBy((col("ts_ms") / 1000L).cast("long")
          .divide(120L).cast("long").multiply(120L).as("ts_gb"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(out.count() == expect.count())
    assert(out.exceptAll(expect.select("ts_gb", "event_type", "n"))
      .count() == 0)
  }

  test("JDBC statement + incremental poll against embedded Derby") {
    import graft.io.{Jdbc, PollSource}
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE readings") catch { case _: Exception => () }
      st.execute(
        "CREATE TABLE readings (id INT, ts_ms BIGINT, val DOUBLE)")
      (1 to 20).foreach(i => st.execute(
        s"INSERT INTO readings VALUES ($i, ${i * 1000L}, ${i * 1.5})"))
      st.close()
    } finally conn.close()

    // one-shot statement: executed by the DB as a derived table
    val one = Jdbc.statement(spark, url,
      "SELECT id, val FROM readings WHERE val > 15")
    assert(one.count() == 10 && one.columns.map(_.toLowerCase).toSet ==
      Set("id", "val"))

    // incremental polls partition the table exactly (N polls == 1 scan)
    val poller = new PollSource.IncrementalPoll(startMs = 1000L,
      periodMs = 7000L, offsetMs = 0L, minIntervalMs = 0L,
      stopMs = Some(30000L))
    val polled = poller.catchUp(nowMs = 60000L)
      .map(w => Jdbc.poll(spark, url, "readings", "ts_ms", w))
      .reduce(_ union _)
    assert(polled.count() == 20) // covering: first window starts AT startMs
    assert(polled.select("id").distinct().count() == 20)

    // DFS front-end: postgre_statement source + postgre_out sink
    val viaDfs = graft.dfs.DfsEngine.runSingle(
      s"""#|postgre_statement(
          #  .host('$url')
          #  .statement('SELECT id, ts_ms, val FROM readings'))
          #|where(lambda: "VAL" > 12)
          #""".stripMargin('#'), spark, sf)
    assert(viaDfs.count() == 12)
    graft.dfs.DfsEngine.runSingle(
      s"""#|postgre_statement(
          #  .host('$url')
          #  .statement('SELECT id, val FROM readings'))
          #|postgre_out(
          #  .host('$url')
          #  .table('readings_out')
          #  .db_fields('ID2')
          #  .faxe_fields('ID'))
          #""".stripMargin('#'), spark, sf)
    val back = Jdbc.statement(spark, url, "SELECT id2 FROM readings_out")
    assert(back.count() == 20)
  }

  test("mongo selector translates to relational predicates") {
    import graft.io.MongoFilter
    val ev = Tables.events(spark, sf)
    def n(sel: String) = ev.filter(MongoFilter.column(sel)).count()
    assert(n("{}") == ev.count())
    assert(n("""{"event_type": "click"}""") ==
      ev.filter(col("event_type") === "click").count())
    assert(n("""{"value": {"$gt": 50, "$lte": 90}}""") ==
      ev.filter(col("value") > 50 && col("value") <= 90).count())
    assert(n("""{"event_type": {"$in": ["click", "view"]}}""") ==
      ev.filter(col("event_type").isin("click", "view")).count())
    assert(n("""{"$or": [{"event_type": "click"}, {"value": {"$lt": 5}}]}""") ==
      ev.filter(col("event_type") === "click" || col("value") < 5).count())
    assert(n("""{"event_type": {"$exists": true}}""") ==
      ev.filter(col("event_type").isNotNull).count())
    // the translated predicate reaches the parquet scan (PushedFilters)
    val plan = ev.filter(MongoFilter.column("""{"value": {"$gt": 50}}"""))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,50"))
    // DFS node end-to-end
    val out = graft.dfs.DfsEngine.runSingle(
      """#|mongo_query(
         #  .collection('events')
         #  .query('{"value": {"$gt": 90}, "event_type": "click"}'))
         #""".stripMargin('#'), spark, sf)
    assert(out.count() ==
      ev.filter(col("value") > 90 && col("event_type") === "click").count())
  }

  test("email templating renders per row; node publishes messages") {
    import graft.io.EmailFormat
    import graft.sources.{Loopback, LoopbackBus}
    // string_template eval: {{path}} placeholders, null → empty
    val df = Tables.events(spark, sf).limit(3)
    val subj = df.select(EmailFormat.template(
      "Alarm {{event_type}} at {{ts_ms}}").as("s")).collect()
    assert(subj.forall(_.getString(0).matches("Alarm \\w+ at \\d{13}")))
    // ##PREHEADER##/##CONTENT## markers all become the content
    // (esp_email.erl:115-117)
    val wrapped = df.limit(1).select(EmailFormat.wrapTemplate(
      "<p>##PREHEADER##</p><div>##CONTENT##</div>",
      org.apache.spark.sql.functions.lit("X")).as("w")).head.getString(0)
    assert(wrapped == "<p>X</p><div>X</div>")

    LoopbackBus.clear()
    graft.dfs.DfsEngine.runSingle(
      """#|parquet_read(.table('events'))
         #|where(lambda: "value" > 99)
         #|email(
         #  .to('ops@example.com', 'oncall@example.com')
         #  .from_address('faxe@plant1')
         #  .smtp_relay('mail1')
         #  .subject('alert {{event_type}}')
         #  .body('value was {{value}}'))
         #""".stripMargin('#'), spark, sf)
    val msgs = Loopback.subscribe(spark, "email:mail1")
      .select("payload").collect().map(_.getString(0))
    assert(msgs.nonEmpty)
    assert(msgs.forall(m =>
      m.startsWith("Subject: alert ") &&
        m.contains("From: faxe@plant1\r\nTo: ops@example.com,oncall@example.com") &&
        m.contains("\r\n\r\nvalue was ")))
  }

  test("crate sinks: jdbc-bound insert and bulk endpoint publish") {
    import graft.sources.{Loopback, LoopbackBus}
    val url = "jdbc:derby:memory:cratedb;create=true"
    graft.dfs.DfsEngine.runSingle(
      s"""#|parquet_read(.table('events'))
          #|keep('event_id', 'value', 'event_type')
          #|crate_out(
          #  .host('$url')
          #  .table('crate_rows')
          #  .db_fields('eid', 'v')
          #  .faxe_fields('event_id', 'value')
          #  .remaining_fields_as('rest'))
          #""".stripMargin('#'), spark, sf)
    // Spark's JDBC write quotes identifiers, so the created columns are
    // case-sensitive in Derby — read them back unnamed
    val back = graft.io.Jdbc.statement(spark, url,
      "SELECT * FROM crate_rows")
    assert(back.count() == Tables.events(spark, sf).count())
    assert(back.columns.toSeq == Seq("eid", "v", "rest"))
    assert(back.head.getString(2).contains("\"event_type\""))

    LoopbackBus.clear()
    graft.dfs.DfsEngine.runSingle(
      """#|parquet_read(.table('events'))
         #|keep('event_id', 'value')
         #|http_post_crate(
         #  .host('c1')
         #  .table('doc_rows')
         #  .db_fields('eid', 'v')
         #  .faxe_fields('event_id', 'value'))
         #""".stripMargin('#'), spark, sf)
    val posted = Loopback.subscribe(spark, "crate:c1:4200:doc.doc_rows")
    assert(posted.count() == Tables.events(spark, sf).count())
  }

  test("influx line protocol matches the reference encoding") {
    import graft.io.InfluxLine
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("host", StringType), StructField("region", StringType),
      StructField("ts", LongType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, 2.5, "str", true, "h1", "eu", 1234567890123L),
        Row(7L, 2.0, null, false, "h2", null, 1234567890124L)),
      schema)
    val lines = df.select(InfluxLine.encode(df, lit("m"),
        Seq("x", "y", "s", "b"), Seq("host", "region"),
        Some(col("ts"))).as("l"))
      .collect().map(_.getString(0))
    // {Key, Fields, Tags, Ts} form (influx_line.erl:91-101): tags joined
    // to the key, fields space-separated, bare ints, compact floats,
    // t/f booleans, trailing newline; null field/tag dropped
    assert(lines(0) == "m,host=h1,region=eu x=1,y=2.5,s=str,b=t 1234567890123\n")
    assert(lines(1) == "m,host=h2 x=7,y=2.0,b=f 1234567890124\n")
    // encode_integer option suffixes ints with 'i' (influx_line.erl:229-238)
    val enc = df.limit(1).select(InfluxLine.encode(df, lit("m"), Seq("x"),
      encodeInteger = true).as("l")).head.getString(0)
    assert(enc == "m x=1i\n")
    // a NULL ts degrades to the reference's no-timestamp line form — it
    // must not null the whole concat and lose the row
    val dfN = spark.createDataFrame(
      java.util.List.of(Row(3L, 1.0, "s", true, "h3", "us", null)), schema)
    val lineN = dfN.select(InfluxLine.encode(dfN, lit("m"), Seq("x"),
      Seq("host"), Some(col("ts"))).as("l")).head.getString(0)
    assert(lineN == "m,host=h3 x=3\n")
  }

  test("influx_out node publishes line-protocol payloads") {
    import graft.sources.{Loopback, LoopbackBus}
    LoopbackBus.clear()
    graft.dfs.DfsEngine.runSingle(
      """#|parquet_read(.table('events'))
         #|where(lambda: "value" > 99)
         #|keep('event_type', 'value', 'ts_ms')
         #|influx_out(
         #  .host('db1')
         #  .database('metrics')
         #  .measurement('hot'))
         #""".stripMargin('#'), spark, sf)
    val got = Loopback.subscribe(spark, "influx:db1:8086:metrics")
      .select("payload").collect().map(_.getString(0))
    assert(got.nonEmpty)
    assert(got.forall(_.matches(
      "hot event_type=\\w+,value=\\d+\\.\\d+ \\d{13}\\n")))
  }

  test("csv sink/source round trip") {
    val path = "/tmp/graft-test-csv"
    val src = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value").limit(100)
    Sinks.csv(src, path)
    val back = Sources.csv(spark, path)
    assert(back.count() == 100)
    assert(back.columns.toSet == src.columns.toSet)
  }

  test("json-lines sink/source round trip preserves values") {
    val path = "/tmp/graft-test-jsonl"
    val src = Tables.events(spark, sf)
      .select("event_id", "event_type", "value").limit(50)
    Sinks.jsonLines(src, path)
    val back = Sources.jsonLines(spark, path,
      Some("event_id BIGINT, event_type STRING, value DOUBLE"))
    assert(back.count() == 50)
    assert(back.exceptAll(src).count() == 0)
  }

  test("jsonEmitter parses literal docs") {
    val df = Sources.jsonEmitter(spark, Seq(
      """{"a": 1, "b": "x"}""", """{"a": 2, "b": "y"}"""))
    assert(df.count() == 2)
    assert(df.agg(sum(col("a"))).head().getLong(0) == 3L)
  }

  test("triggeredTimeout passes traffic and manages state in batch mode") {
    import spark.implicits._
    val ds = Seq(
      Ev(1, 1, 1.0, "arm"), Ev(1, 2, 2.0, "disarm"), Ev(2, 1, 1.0, "arm"))
      .toDS()
    val out = Streaming.triggeredTimeout[Long, Ev](ds, _.user_id,
      arm = _.event_type == "arm", disarm = _.event_type == "disarm",
      timeoutMs = 60000L, alarm = k => Ev(k, -1, 0.0, "alarm")).collect()
    assert(out.count(_.event_type != "alarm") == 3)
  }

  test("timeElapsed emits -1 first then non-negative deltas") {
    import spark.implicits._
    val ds = Seq(Ev(1, 1, 1.0, "a"), Ev(1, 2, 2.0, "b"), Ev(2, 1, 3.0, "c")).toDS()
    val out = Streaming.timeElapsed[Long, Ev, (Long, Long, Long)](
      ds, _.user_id, (v, e) => (v.user_id, v.seq, e)).collect()
    val byKey = out.groupBy(_._1)
    assert(byKey(1L).count(_._3 == -1L) == 1)
    assert(byKey(1L).count(_._3 >= 0L) == 1)
    assert(byKey(2L).head._3 == -1L)
  }

  test("s7 request planning matches esp_s7read's eunit build_addresses_test") {
    import graft.io.PlcPlan._
    val addrs = Seq(
      "DB11136.DBX88.0", "DB11136.DBX88.1", "DB11136.DBX88.2", "DB11136.DBX88.3",
      "DB11136.DBX90.0", "DB11136.DBX90.1", "DB11136.DBX90.2", "DB11136.DBX90.3",
      "DB11136.DBX90.4", "DB11136.DBX90.5", "DB11136.DBX90.6", "DB11136.DBX90.7",
      "DB11136.DBX91.0", "DB11136.DBX91.1", "DB11136.DBX91.2", "DB11136.DBX91.3",
      "DB11136.DBX91.7", "DB11136.DBX92.0", "DB11136.DBX92.1", "DB11136.DBX92.2",
      "DB11136.DBX92.3", "DB11136.DBX92.4", "DB11136.DBX92.5", "DB11136.DBX92.6",
      "DB11136.DBX92.7", "DB11136.DBX93.0", "DB11136.DBX93.1", "DB11136.DBX93.2",
      "DB11136.DBX93.3", "DB11136.DBX93.4", "DB11136.DBX93.5", "DB11136.DBX93.6",
      "DB11136.DBX93.7", "DB11136.DBX94.0", "DB11136.DBX94.1", "DB11136.DBW96",
      "DB11136.DBW98", "DB11136.DBX100.0", "DB11136.DBX100.1", "DB11136.DBX100.2",
      "DB11136.DBX100.4", "DB11136.DBX100.5", "DB11136.DBX100.6", "DB11136.DBX100.7",
      "DB11136.DBX101.0", "DB11136.DBX101.1", "DB11136.DBX101.2", "DB11136.DBX101.3",
      "DB11136.DBX101.4", "DB11136.DBX101.6", "DB11136.DBX101.7", "DB11136.DBX102.0",
      "DB11136.DBX102.1",
      "DB8034.DBS66.30")
    val as = addrs.map(_.replace(".", "_"))
    val parsed = addrs.map(a => parseS7(a).getOrElse(fail(s"parse $a")))
    val (parts, aliases) = buildS7(parsed, as)
    // the reference's exact expected partitions (eunit Res)
    assert(parts == Seq(
      S7Part("db", 11136, 88, 1, "byte"),
      S7Part("db", 11136, 90, 5, "byte"),
      S7Part("db", 11136, 100, 3, "byte"),
      S7Part("db", 11136, 96, 2, "word"),
      S7Part("db", 8034, 66, 30, "byte")))
    // alias mapping: run-relative bit indices for bools (eunit AliasesList)
    assert(aliases(0) == S7Aliases(as.take(4), Seq.fill(4)("bool_byte"),
      Seq(0, 1, 2, 3)))
    assert(aliases(1).bits == Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 15,
      16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33))
    assert(aliases(2).bits == Seq(0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14,
      15, 16, 17))
    assert(aliases(3) == S7Aliases(
      Seq("DB11136_DBW96", "DB11136_DBW98"), Seq("word", "word"), Nil))
    assert(aliases(4) == S7Aliases(
      Seq("DB8034_DBS66_30"), Seq("string"), Nil))
    // the comma form the reference scripts use parses too
    assert(parseS7("DB4,DInt22").contains(S7Address(4, "d_int", 22, 1)))
    assert(parseS7("DB4,R1").contains(S7Address(4, "float", 1, 1)))
    assert(parseS7("not an address").isEmpty)
  }

  test("modbus coalescing matches esp_modbus_read's eunit build_find_contiguous_test") {
    import graft.io.PlcPlan._
    def req(alias: String, start: Int) =
      ModbusReq(alias, "read_hregs", start, 2, "float32")
    val reqs = Seq(
      req("ActiveEnergyRcvd", 2701), req("ActiveEnergyDelvd", 2699),
      req("ReactiveEnergyRcvd", 2709), req("ReactiveEnergyDelvd", 2707),
      req("ApparentEnergyRcvd", 2717), req("ApparentEnergyDelvd", 2715),
      req("MaximalCurrentValue", 3009))
    val parts = findContiguousModbus(reqs)
    assert(parts == Seq(
      ModbusPart("MaximalCurrentValue", Seq("MaximalCurrentValue"),
        "read_hregs", 3009, 2, 1, "float32"),
      ModbusPart("ActiveEnergyDelvd",
        Seq("ActiveEnergyDelvd", "ActiveEnergyRcvd"),
        "read_hregs", 2699, 4, 2, "float32"),
      ModbusPart("ReactiveEnergyDelvd",
        Seq("ReactiveEnergyDelvd", "ReactiveEnergyRcvd"),
        "read_hregs", 2707, 4, 2, "float32"),
      ModbusPart("ApparentEnergyDelvd",
        Seq("ApparentEnergyDelvd", "ApparentEnergyRcvd"),
        "read_hregs", 2715, 4, 2, "float32")))
    // non-uniform amounts: the gate is the reference's verbatim
    // lastStart + INCOMING amount == start (esp_modbus_read.erl:279) —
    // (0,2)+(2,1) does NOT merge (0+1 != 2), (0,2)+(3,3) DOES (0+3 == 3)
    val noMerge = findContiguousModbus(Seq(
      ModbusReq("a", "read_hregs", 0, 2, ""),
      ModbusReq("b", "read_hregs", 2, 1, "")))
    assert(noMerge.map(_.aliases) == Seq(Seq("b"), Seq("a")))
    val refMerge = findContiguousModbus(Seq(
      ModbusReq("a", "read_hregs", 0, 2, ""),
      ModbusReq("b", "read_hregs", 3, 3, "")))
    assert(refMerge == Seq(ModbusPart("a", Seq("a", "b"),
      "read_hregs", 0, 6, 2, "")))
    // numerically absurd addresses are invalid, never a crash
    assert(parseS7("DB99999999999999.DBX1.0").isEmpty)
  }
}
