package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.restructure.Restructure
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for SURVEY §2.2 restructuring operators.
  * All are generator/projection plans — no shuffle except batchify's
  * per-key ranking.
  */
object RestructurePack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    // array_explode over the embeddings vectors: 1-based idx
    // (ref: esp_array_explode.erl:28-84; jsn 1-based indexing).
    "restr_array_explode" -> QueryDef(
      (s, dir) =>
        Restructure.arrayExplode(
          Tables.embeddings(s, dir), Seq("embedding"), Seq("vec_id"))
          .select(col("vec_id"), col("idx"), col("embedding").as("emb")),
      Some("""SELECT vec_id, CAST(i AS INTEGER) AS idx,
             |  embedding[CAST(i AS INTEGER)] AS emb
             |FROM embeddings,
             |  UNNEST(generate_series(1, len(embedding))) AS t(i)""".stripMargin)),

    // fields_to_array: listed fields → array of {name,value} structs
    // (ref: esp_fields_to_array.erl:33-70). The compared column is the
    // array canonicalized to one scalar string (name:scaled-int joined) —
    // array cells crash the driver's pandas sort, and floor(x*10000) is the
    // engine-stable double rendering (both engines run identical IEEE ops;
    // raw double→string differs on sci-notation thresholds).
    "restr_fields_to_array" -> QueryDef(
      (s, dir) =>
        Restructure.fieldsToArray(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
          Seq("l_quantity", "l_discount", "l_tax"), "kv")
          .select(col("l_orderkey"), col("l_linenumber"),
            array_join(transform(col("kv"), x =>
              concat(x.getField("name"), lit(":"),
                floor(x.getField("value") * 10000).cast("long").cast("string"))),
              ",").as("kv")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  'l_quantity:' || CAST(floor(l_quantity * 10000) AS BIGINT) ||
             |  ',l_discount:' || CAST(floor(l_discount * 10000) AS BIGINT) ||
             |  ',l_tax:' || CAST(floor(l_tax * 10000) AS BIGINT) AS kv
             |FROM lineitem""".stripMargin)),

    // relational form: one row per field.
    "restr_fields_to_rows" -> QueryDef(
      (s, dir) =>
        Restructure.fieldsToRows(
          Tables.lineitem(s, dir),
          Seq("l_quantity", "l_discount", "l_tax"),
          Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS name, l_quantity AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin)),

    // path_split: one row per key of a map column
    // (ref: esp_path_split.erl:22-57).
    "restr_path_split" -> QueryDef(
      (s, dir) =>
        Restructure.pathSplit(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"),
              map(lit("qty"), col("l_quantity"), lit("tax"), col("l_tax")).as("m")),
          col("m"), Seq("l_orderkey", "l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, 'qty' AS key, l_quantity AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem""".stripMargin)),

    // extract_path: deep paths to flat fields with defaults
    // (ref: esp_extract_path.erl:24-53).
    "restr_extract_path" -> QueryDef(
      (s, dir) => {
        val nested = Tables.events(s, dir).select(
          col("event_id"),
          struct(
            col("user_id").as("uid"),
            when(col("event_type") === "error", lit(null).cast("double"))
              .otherwise(col("value")).as("v")).as("payload"))
        Restructure.extractPath(nested, Seq(
          (col("event_id"), lit(-1L), "event_id"),
          (col("payload.uid"), lit(-1L), "uid"),
          (col("payload.v"), lit(-1.0), "v")))
      },
      Some("""SELECT event_id, user_id AS uid,
             |  coalesce(CASE WHEN event_type = 'error' THEN NULL
             |                ELSE value END, -1.0) AS v
             |FROM events""".stripMargin)),

    // unbatch: explode a collected batch back to rows — round-trips
    // collect_list(struct) (refs: esp_batch.erl, esp_unbatch.erl:26-50).
    "restr_unbatch" -> QueryDef(
      (s, dir) => {
        val batched = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(collect_list(struct(col("event_id"), col("value"))).as("pts"))
        Restructure.unbatch(batched, col("pts"), Seq("user_id"))
      },
      Some("SELECT event_id, value, user_id FROM events")),

    // batchify: 0-based batch id every 20 rows per user
    // (ref: esp_batch.erl:30-119 count mode).
    "restr_batchify" -> QueryDef(
      (s, dir) =>
        Restructure.batchify(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_ns")),
          20, Seq(col("ts_ns"), col("event_id")), Seq(col("user_id")))
          .drop("ts_ns"),
      Some("""SELECT event_id, user_id, CAST((rn - 1) // 20 AS BIGINT) AS batch_id
             |FROM (SELECT event_id, user_id, row_number() OVER
             |        (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
             |      FROM events)""".stripMargin))
  )
}
