package graft

import graft.core.{Sessions, Tables}
import graft.dfs.DfsEngine
import graft.sources.{Loopback, LoopbackBus}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Loopback connector tests: DSv2 batch/streaming read + write over the
  * in-memory bus, ack≈offset-commit resume, topic-from-column routing,
  * and the DFS broker nodes end-to-end.
  */
class LoopbackSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "loopback-test")
  val sf = "/root/testdata/sf0.001"

  test("batch write + read round trip") {
    LoopbackBus.clear()
    import spark.implicits._
    val df = Seq(("k1", "p1"), ("k2", "p2"), ("k3", "p3"))
      .toDF("key", "payload")
    Loopback.publish(df, "t1")
    val back = Loopback.subscribe(spark, "t1")
    assert(back.count() == 3)
    assert(back.select("payload").collect().map(_.getString(0)).toSet ==
      Set("p1", "p2", "p3"))
    // offsets are the log positions
    assert(back.select("offset").collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L))
  }

  test("topic column routes per row (esp_mqtt_publish topic_lambda)") {
    LoopbackBus.clear()
    import spark.implicits._
    val df = Seq(("ta", "x"), ("tb", "y"), ("ta", "z"))
      .toDF("topic", "payload")
    Loopback.publish(df, "fallback")
    assert(Loopback.subscribe(spark, "ta").count() == 2)
    assert(Loopback.subscribe(spark, "tb").count() == 1)
    assert(Loopback.subscribe(spark, "fallback").count() == 0)
  }

  test("micro-batch stream: offsets advance, ack commits, group resumes") {
    LoopbackBus.clear()
    (1 to 3).foreach(i => LoopbackBus.publish("s1", s"k$i", s"v$i"))

    def drain(queryName: String): Long = {
      val q = Loopback.subscribeStream(spark, "s1", group = "g1")
        .writeStream.format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql(s"SELECT count(*) FROM $queryName").head.getLong(0)
    }
    // the ack listener fires on QueryProgressEvent, which is async to
    // awaitTermination — poll briefly for the committed mark
    def awaitCommitted(expect: Long): Long = {
      val deadline = System.currentTimeMillis + 10000
      while (LoopbackBus.committed("s1", "g1") != expect &&
          System.currentTimeMillis < deadline) Thread.sleep(50)
      LoopbackBus.committed("s1", "g1")
    }
    assert(drain("lb_first") == 3)
    // committed mark recorded for the group (ack-after-process)
    assert(awaitCommitted(2L) == 2L)
    // two more arrive; the same group resumes AFTER the committed offset
    (4 to 5).foreach(i => LoopbackBus.publish("s1", s"k$i", s"v$i"))
    assert(drain("lb_second") == 2)
    assert(awaitCommitted(4L) == 4L)
    // a fresh group re-reads from the start (nothing acked yet)
    val all = Loopback.subscribeStream(spark, "s1", group = "g2")
      .writeStream.format("memory").queryName("lb_all")
      .trigger(Trigger.AvailableNow()).start()
    all.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM lb_all").head.getLong(0) == 5)
  }

  test("DFS round trip: mqtt_publish then mqtt_subscribe + parser") {
    LoopbackBus.clear()
    // publish a projected event stream into the bus through the front-end
    DfsEngine.runSingle(
      """|parquet_read(.table('events'))
        #|where(lambda: "value" > 95)
        #|keep('event_id', 'user_id', 'value')
        #|mqtt_publish(.topic('events_hot'))
        #""".stripMargin('#'), spark, sf)
    val expected = Tables.events(spark, sf).filter(col("value") > 95).count()
    assert(LoopbackBus.latest("events_hot") == expected - 1)

    // consume + parse the JSON payloads back into typed fields
    val back = DfsEngine.runSingle(
      """|mqtt_subscribe(.topic('events_hot'))
        #|parser(.field('payload').schema('event_id STRING, user_id BIGINT, value DOUBLE').as('p'))
        #|where(lambda: "p.value" > 95)
        #""".stripMargin('#'), spark, sf)
    assert(back.count() == expected)
  }

  test("DFS .stream(true) plans the chain onto the MicroBatchStream") {
    LoopbackBus.clear()
    (1 to 3).foreach(i => LoopbackBus.publish("sd", s"k$i", s"""{"v":$i}"""))
    val df = DfsEngine.runSingle(
      """|mqtt_subscribe(.topic('sd').stream(true))
        #|parser(.field('payload').schema('v BIGINT').as('p'))
        #|where(lambda: "p.v" >= 2)
        #""".stripMargin('#'), spark, sf)
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").queryName("lb_dfs_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM lb_dfs_stream").head.getLong(0) == 2)
  }

  test("http_post to http_listen round trip on the endpoint topic") {
    LoopbackBus.clear()
    DfsEngine.runSingle(
      """|parquet_read(.table('events'))
        #|where(lambda: "value" > 99)
        #|keep('event_id', 'value')
        #|http_post(.host('localhost').port(8899).path('/ingest'))
        #""".stripMargin('#'), spark, sf)
    val expected =
      Tables.events(spark, sf).filter(col("value") > 99).count()
    val back = DfsEngine.runSingle(
      """|http_listen(.port(8899).path('/ingest').payload_type('json'))
        #|parser(.field('payload').schema('event_id STRING, value DOUBLE').as('p'))
        #""".stripMargin('#'), spark, sf)
    assert(back.count() == expected)
  }

  test("amqp aliases bind to the same bus") {
    LoopbackBus.clear()
    // .routing_key is required by esp_amqp_publish/consume's
    // one_of_params check (now compile-enforced); it is envelope
    // metadata on the loopback bus
    DfsEngine.runSingle(
      """|parquet_read(.table('events'))
        #|keep('event_id')
        #|amqp_publish(.exchange('q1').routing_key('rk'))
        #""".stripMargin('#'), spark, sf)
    val n = DfsEngine.runSingle(
      "|amqp_consume(.queue('q1').routing_key('#'))", spark, sf).count()
    assert(n == Tables.events(spark, sf).count())
  }

  test("dt_field/dt_format: payload timestamp becomes event time") {
    // esp_mqtt_subscribe.erl:65-70,155-170 — the subscribed payload's
    // own timestamp field overrides the transport time; float_micro is
    // seconds.microseconds rounded to ms (lambda_tests.erl grip_rewrite:
    // "1574067119.037648" -> ts 1574067119038)
    LoopbackBus.clear()
    LoopbackBus.publish("dt/t1", null,
      """{"UTC-Time": "1574067119.037648", "v": 1}""", 1L)
    LoopbackBus.publish("dt/t1", null, """{"v": 2}""", 7L)
    val out = DfsEngine.runSingle(
      """|mqtt_subscribe(.topic('dt/t1')
        #  .dt_field('UTC-Time').dt_format('float_micro'))
        #""".stripMargin('#'), spark, sf)
    val byV = out.select("v", "ts_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV(1L) == 1574067119038L) // parsed payload time, rounded
    assert(byV(2L) == 7L) // no payload field -> transport time kept
    // default dt_field 'ts' in milliseconds — and the DEFAULT ts key is
    // CONSUMED, removed from the fields (from_json_basic_test), while
    // the explicit form above kept UTC-Time as a field
    LoopbackBus.publish("dt/t2", null, """{"ts": 123456, "v": 9}""", 1L)
    val out2 = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('dt/t2'))", spark, sf)
    assert(out2.select("ts_ms").head.getLong(0) == 123456L)
    assert(!out2.columns.contains("ts"))
    assert(out.columns.contains("UTC-Time"))
  }

  test("wire format: published JSON carries top-level ts; round-trip " +
      "preserves the point") {
    // flowdata_tests.erl json_basic_test — to_json(P) = fields + "ts"
    LoopbackBus.clear()
    import spark.implicits._
    val p = Seq((1568029511598L, "01.002", 323424L))
      .toDF("ts_ms", "df", "value1")
    graft.sources.Loopback.publish(p, "wire/t1")
    val raw = LoopbackBus.read("wire/t1", -1L,
      LoopbackBus.latest("wire/t1"))
    assert(raw.size == 1)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(raw.head.payload)
    assert(node.get("ts").asLong() == 1568029511598L)
    assert(node.get("df").asText() == "01.002")
    assert(node.get("value1").asLong() == 323424L)
    assert(!node.has("ts_ms"))
    // the subscribe side consumes "ts" back into event time
    val back = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('wire/t1'))", spark, sf)
    assert(back.select("ts_ms").head.getLong(0) == 1568029511598L)
    assert(back.select("df", "value1").head.toSeq ==
      Seq("01.002", 323424L))
    assert(!back.columns.contains("ts"))
  }

  test("batch publish: one JSON-array message per batch (batch_to_json)") {
    // flowdata_tests.erl batch_to_json_test — a data_batch serializes
    // as ONE message holding a JSON array of point objects, each with
    // its own top-level ts; the array landing explodes it back
    LoopbackBus.clear()
    DfsEngine.runSingle(
      """|parquet_read(.table('region'))
        #|keep('r_regionkey')
        #|batch(3)
        #|mqtt_publish(.topic('bp/t1'))
        #""".stripMargin('#'), spark, sf)
    val raw = LoopbackBus.read("bp/t1", -1L, LoopbackBus.latest("bp/t1"))
    assert(raw.size == 2) // 5 regions in batches of 3 -> 2 messages
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val sizes = raw.map(m => om.readTree(m.payload))
      .map { t => assert(t.isArray); t.size }
    assert(sizes.sorted == Seq(2, 3))
    // round trip: the array landing restores one row per point
    val back = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('bp/t1'))", spark, sf)
    assert(back.count() == 5)
    assert(back.select("r_regionkey").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("JSON-array payload lands as a batch of points (from_json_list)") {
    // flowdata from_json_list_test: one message holding a JSON array
    // decodes into multiple points; objects stay single; unparsable
    // payloads keep their envelope row
    LoopbackBus.clear()
    LoopbackBus.publish("arr/t1", null,
      """[{"v": 1}, {"v": 2}, {"v": 3}]""", 5L)
    LoopbackBus.publish("arr/t1", null, """{"v": 9}""", 6L)
    val out = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('arr/t1'))", spark, sf)
    assert(out.count() == 4)
    assert(out.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 9L))
    // all three array points share the message's transport time
    assert(out.filter(col("ts_ms") === 5L).count() == 3)
  }

  test("subscribe .as / .clean_field_names: set_root + clean_keys pins") {
    // flowdata_tests.erl set_root_not_present[_deep]_test,
    // set_root_present_test, clean_keys_test — flowdata.erl lives in the
    // un-vendored faxe_common, so the eunit cases are the spec
    LoopbackBus.clear()
    LoopbackBus.publish("sr/t1", null, """{"field1": 33}""", 1L)
    val nested = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('sr/t1').as('new_root'))", spark, sf)
    assert(nested.select("new_root.field1").head.getLong(0) == 33L)
    assert(!nested.columns.contains("field1"))
    val deep = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('sr/t1').as('new_root.new_sub_root'))",
      spark, sf)
    assert(deep.select("new_root.new_sub_root.field1").head
      .getLong(0) == 33L)
    // set_root_present_test: the payload already carries the root —
    // re-rooting must not double-nest
    LoopbackBus.publish("sr/t2", null, """{"root": {"field1": 33}}""", 1L)
    val already = DfsEngine.runSingle(
      "|mqtt_subscribe(.topic('sr/t2').as('root'))", spark, sf)
    assert(already.select("root.field1").head.getLong(0) == 33L)
    assert(already.schema("root").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("field1"))
    // clean_keys_test mapping: dots in KEYS become underscores; values
    // keep their dots
    LoopbackBus.publish("sr/t3", null,
      """{"df.": "02.005", "double_val": 10.220761769454324,
        | "this.is.a.key.with.points": "val.with.points"}""".stripMargin,
      1L)
    val cleaned = DfsEngine.runSingle(
      "|amqp_consume(.queue('sr/t3').routing_key('#')" +
        ".clean_field_names(true))", spark, sf)
    assert(cleaned.columns.contains("df_"))
    assert(cleaned.columns.contains("this_is_a_key_with_points"))
    assert(cleaned.select("this_is_a_key_with_points").head
      .getString(0) == "val.with.points")
    assert(cleaned.select("df_").head.getString(0) == "02.005")
  }

  test("mqtt_amqp_bridge: dotted routing keys, per-topic order preserved") {
    LoopbackBus.clear()
    (1 to 50).foreach(i => LoopbackBus.publish("plant/a", s"k$i", s"a$i"))
    (1 to 30).foreach(i => LoopbackBus.publish("plant/b", s"k$i", s"b$i"))
    DfsEngine.runSingle(
      """|mqtt_amqp_bridge(
        #  .topics('plant/a', 'plant/b')
        #  .amqp_exchange('bx'))
        #""".stripMargin('#'), spark, sf)
    // exchange address carries the '/'→'.' routing key
    // (esp_mqtt_amqp_bridge.erl:302-303)
    val a = Loopback.subscribe(spark, "bx:plant.a")
      .orderBy("offset").select("payload").collect().map(_.getString(0))
    assert(a.toSeq == (1 to 50).map(i => s"a$i"))
    val b = Loopback.subscribe(spark, "bx:plant.b")
      .orderBy("offset").select("payload").collect().map(_.getString(0))
    assert(b.toSeq == (1 to 30).map(i => s"b$i"))
  }
}
