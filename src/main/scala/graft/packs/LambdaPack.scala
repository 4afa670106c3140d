package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.functions.Lambdas
import org.apache.spark.sql.functions._

/** Driver-verifiable queries exercising the DFS lambda scalar surface
  * (SURVEY §2.8) — each query composes 5+ translated functions so the
  * oracle pins the whole library's semantics, not isolated calls.
  */
object LambdaPack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    "lambda_scalar" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir).select(
          col("event_id"),
          Lambdas.toInt(col("value")).as("v_int"),
          Lambdas.roundFloat(col("value"), 2).as("v_round"),
          Lambdas.strConcat(col("event_type"), lit("_"),
            Lambdas.toStringCol(col("user_id"))).as("tag"),
          Lambdas.strUpcase(Lambdas.strReverse(col("event_type"))).as("rev_up"),
          Lambdas.ifThen(
            Lambdas.member(col("event_type"), Seq(lit("click"), lit("view"))),
            lit(1L), lit(0L)).as("is_cv"),
          Lambdas.strLength(col("event_type")).as("tlen"),
          Lambdas.mapGet(
            from_json(col("props"), "map<string,int>", Map.empty[String, String]),
            lit("k"), lit(-1)).as("k")),
      Some("""SELECT event_id,
             |  CAST(trunc(value) AS BIGINT) AS v_int,
             |  round(value, 2) AS v_round,
             |  event_type || '_' || CAST(user_id AS VARCHAR) AS tag,
             |  upper(reverse(event_type)) AS rev_up,
             |  CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS is_cv,
             |  CAST(len(event_type) AS INTEGER) AS tlen,
             |  coalesce(CAST(json_extract_string(props, '$.k') AS INTEGER), -1) AS k
             |FROM events""".stripMargin)),

    "lambda_time" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir).select(
          col("event_id"),
          Lambdas.timeAlign(col("ts_ms"), 60000L).as("ts_min"),
          Lambdas.timeAlign(col("ts_ms"), 3600000L).as("ts_hour"),
          Lambdas.toIso8601(col("ts_ms")).as("iso"),
          Lambdas.toDateString(col("ts_ms")).as("d"),
          Lambdas.hourOf(col("ts_ms")).as("h"),
          Lambdas.minuteOf(col("ts_ms")).as("m")),
      Some("""SELECT event_id,
             |  epoch_ms(ts) - epoch_ms(ts) % 60000 AS ts_min,
             |  epoch_ms(ts) - epoch_ms(ts) % 3600000 AS ts_hour,
             |  strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%dT%H:%M:%S.%gZ') AS iso,
             |  strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%d') AS d,
             |  CAST(hour(make_timestamp(epoch_ms(ts) * 1000)) AS INTEGER) AS h,
             |  CAST(minute(make_timestamp(epoch_ms(ts) * 1000)) AS INTEGER) AS m
             |FROM events""".stripMargin))
  )
}
