package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.stateless.{ParserOps, Transforms}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for SURVEY §2.1 stateless operators.
  *
  * Oracle-parity notes: row-level double arithmetic is IEEE-identical across
  * engines, so no rounding is applied there. Timestamps are emitted as epoch
  * milliseconds (BIGINT) to avoid tz/precision representation differences.
  */
object TransformPack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    "where_filter" -> QueryDef(
      (s, dir) => Transforms.where(Tables.lineitem(s, dir), col("l_quantity") > 45),
      Some("SELECT * FROM lineitem WHERE l_quantity > 45")),

    "eval_chain" -> QueryDef(
      (s, dir) =>
        Transforms.eval(
          Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber",
            "l_extendedprice", "l_discount", "l_tax"),
          Seq(
            "revenue" -> (d => d("l_extendedprice") * (lit(1.0) - d("l_discount"))),
            "taxed"   -> (d => d("revenue") * (lit(1.0) + d("l_tax")))))
          .select("l_orderkey", "l_linenumber", "revenue", "taxed"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) AS revenue,
             |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS taxed
             |FROM lineitem""".stripMargin)),

    "set_fields" -> QueryDef(
      (s, dir) =>
        Transforms.setFields(
          Tables.events(s, dir),
          Seq(
            "ms"     -> col("ts_ms"),
            "engine" -> lit("graft"),
            "scaled" -> col("value") * 2.0))
          .select("event_id", "ms", "engine", "scaled"),
      Some("""SELECT event_id, epoch_ms(ts) AS ms, 'graft' AS engine,
             |  value * 2.0 AS scaled FROM events""".stripMargin)),

    "default_fill" -> QueryDef(
      (s, dir) =>
        Transforms.default(
          Tables.events(s, dir)
            .withColumn("maybe", when(col("event_type") === "error", lit(null)
              .cast("string")).otherwise(col("event_type"))),
          "maybe", lit("unknown"))
          .select("event_id", "maybe"),
      Some("""SELECT event_id, coalesce(
             |  CASE WHEN event_type = 'error' THEN NULL ELSE event_type END,
             |  'unknown') AS maybe FROM events""".stripMargin)),

    "keep_project" -> QueryDef(
      (s, dir) =>
        Transforms.keep(
          Tables.lineitem(s, dir),
          Seq("l_orderkey" -> Some("okey"), "l_quantity" -> Some("qty"),
            "l_returnflag" -> None)),
      Some("SELECT l_orderkey AS okey, l_quantity AS qty, l_returnflag FROM lineitem")),

    "rename_cols" -> QueryDef(
      (s, dir) =>
        Transforms.rename(
          Tables.events(s, dir).select("event_id", "user_id", "value"),
          Seq("user_id" -> "uid", "value" -> "v")),
      Some("SELECT event_id, user_id AS uid, value AS v FROM events")),

    "delete_cols" -> QueryDef(
      (s, dir) =>
        Transforms.delete(
          Tables.lineitem(s, dir),
          Seq("l_partkey", "l_suppkey", "l_shipdate", "l_tax")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |  l_discount, l_returnflag, l_linestatus FROM lineitem""".stripMargin)),

    "case_when" -> QueryDef(
      (s, dir) =>
        Transforms.caseWhen(
          Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
          "band",
          Seq(
            (col("l_quantity") < 10)  -> lit("low"),
            (col("l_quantity") < 30)  -> lit("mid"),
            (col("l_quantity") < 45)  -> lit("high")),
          lit("extreme")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  CASE WHEN l_quantity < 10 THEN 'low'
             |       WHEN l_quantity < 30 THEN 'mid'
             |       WHEN l_quantity < 45 THEN 'high'
             |       ELSE 'extreme' END AS band
             |FROM lineitem""".stripMargin)),

    "if_ternary" -> QueryDef(
      (s, dir) =>
        Transforms.ifThen(
          Tables.events(s, dir).select("event_id", "value"),
          "sign", col("value") >= 50.0, lit(1L), lit(-1L)),
      Some("""SELECT event_id, value,
             |  CASE WHEN value >= 50.0 THEN 1 ELSE -1 END AS sign
             |FROM events""".stripMargin)),

    "sample_nth" -> QueryDef(
      (s, dir) =>
        Transforms.sampleEveryN(
          Tables.events(s, dir), 10, Seq(col("ts_ns"), col("event_id")))
          .select(col("event_id"), col("ts_ms").as("ms")),
      Some("""SELECT event_id, epoch_ms(ts) AS ms FROM (
             |  SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE (rn - 1) % 10 = 0""".stripMargin)),

    "shift_ts" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"),
            timestamp_millis(col("ts_ms")).as("ts"))
        Transforms.shift(ev, "ts", 3600L * 1000L)
          .select(col("event_id"), unix_millis(col("ts")).as("ms"))
      },
      Some("SELECT event_id, epoch_ms(ts) + 3600000 AS ms FROM events")),

    "jsonsize_bytes" -> QueryDef(
      (s, dir) =>
        Transforms.jsonSize(
          Tables.events(s, dir).select("event_id", "props"), col("props"), "jsize"),
      Some("SELECT event_id, props, strlen(props) AS jsize FROM events")),

    // parser: declared-schema JSON payload parse (ref: esp_parser.erl:29-93).
    "parser_json" -> QueryDef(
      (s, dir) =>
        ParserOps.parseJsonFlat(
          Tables.events(s, dir).select("event_id", "props"),
          col("props"), "k INT"),
      Some("""SELECT event_id, props,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events""".stripMargin)),

    // parser `changed` mode: digest dedup vs the previous payload
    // (ref: esp_parser.erl:70-84 crc32 change-dedup).
    "parser_changed" -> QueryDef(
      (s, dir) =>
        ParserOps.changedOnly(
          Tables.events(s, dir).select(col("event_id"), col("user_id"),
            col("props"), col("ts_ns")),
          col("props"), Seq(col("user_id")), Seq(col("ts_ns"), col("event_id")))
          .drop("ts_ns"),
      Some("""SELECT event_id, user_id, props FROM events
             |QUALIFY lag(props) OVER
             |    (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
             |  OR lag(props) OVER
             |    (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) <> props""".stripMargin)),

    "union_merge" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        ev.filter(col("event_type") === "click")
          .unionByName(ev.filter(col("event_type") === "view"))
      },
      Some("""SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
             |UNION ALL
             |SELECT event_id, event_type, value FROM events WHERE event_type = 'view'""".stripMargin))
  )
}
