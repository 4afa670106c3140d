package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.join.{Joins, Mem}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries for SURVEY §2.3 joins / stream combination.
  *
  * Two streams are carved from `events` (clicks = left, views = right).
  * Join timestamps are epoch milliseconds: (user_id, ms) is collision-free
  * in the corpus, so every as-of/nearest pick is deterministic — and ms
  * BIGINTs survive the oracle compare exactly (DuckDB truncates these
  * parquet ns timestamps to µs, so raw-ns outputs could never match).
  */
object JoinPack extends QueryPack {

  private def stream(s: SparkSession, dir: String, typ: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === typ)
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("value"))

  private val lCte =
    """WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
      |           FROM events WHERE event_type = 'click'),
      |     r AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
      |           FROM events WHERE event_type = 'view')""".stripMargin

  def entries: Map[String, QueryDef] = Map(
    // as-of enrich, no tolerance (ref: esp_combine.erl:55-145 — trigger
    // point + latest value from the second stream).
    "join_asof" -> QueryDef(
      (s, dir) =>
        Joins.asOfLatest(stream(s, dir, "click"), stream(s, dir, "view"),
          Seq("user_id"), "ts_ms", "ts_ms", Seq("value", "event_id"), "r_"),
      Some(s"""$lCte
              |SELECT l.event_id, l.user_id, l.ts_ms, l.value,
              |  r.ts_ms AS r_ts_ms, r.value AS r_value,
              |  r.event_id AS r_event_id
              |FROM l ASOF LEFT JOIN r
              |  ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms""".stripMargin)),

    // as-of with tolerance: match nulled when older than 6h
    // (ref: esp_join.erl tolerance option).
    "join_asof_tol" -> QueryDef(
      (s, dir) =>
        Joins.asOfLatest(stream(s, dir, "click"), stream(s, dir, "view"),
          Seq("user_id"), "ts_ms", "ts_ms", Seq("value", "event_id"), "r_",
          toleranceMs = Some(21600000L)),
      Some(s"""$lCte
              |SELECT l.event_id, l.user_id, l.ts_ms, l.value,
              |  CASE WHEN l.ts_ms - r.ts_ms <= 21600000 THEN r.ts_ms END AS r_ts_ms,
              |  CASE WHEN l.ts_ms - r.ts_ms <= 21600000 THEN r.value END AS r_value,
              |  CASE WHEN l.ts_ms - r.ts_ms <= 21600000 THEN r.event_id END AS r_event_id
              |FROM l ASOF LEFT JOIN r
              |  ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms""".stripMargin)),

    // bidirectional nearest-ts (ref: esp_join.erl:197-206 nearest_ts;
    // earlier row wins ties).
    "join_nearest" -> QueryDef(
      (s, dir) =>
        Joins.asOfNearest(stream(s, dir, "click"), stream(s, dir, "view"),
          Seq("user_id"), "ts_ms", "ts_ms", Seq("value", "event_id"), "r_"),
      Some(s"""$lCte,
              |b AS (SELECT l.event_id AS lid, r.ts_ms AS bts, r.value AS bval,
              |        r.event_id AS bid
              |      FROM l ASOF LEFT JOIN r
              |        ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms),
              |f AS (SELECT l.event_id AS lid, r.ts_ms AS fts, r.value AS fval,
              |        r.event_id AS fid
              |      FROM l ASOF LEFT JOIN r
              |        ON l.user_id = r.user_id AND l.ts_ms < r.ts_ms)
              |SELECT l.event_id, l.user_id, l.ts_ms, l.value,
              |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
              |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
              |       ELSE bts END AS r_ts_ms,
              |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
              |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fval
              |       ELSE bval END AS r_value,
              |  CASE WHEN bts IS NULL THEN fid WHEN fts IS NULL THEN bid
              |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fid
              |       ELSE bid END AS r_event_id
              |FROM l JOIN b ON l.event_id = b.lid
              |       JOIN f ON l.event_id = f.lid""".stripMargin)),

    // all-pairs within tolerance (ref: esp_join.erl:50-248 / esp_join2
    // multiplicity): clicks × views within 1h on the same user.
    "join_tolerance" -> QueryDef(
      (s, dir) =>
        Joins.toleranceJoin(stream(s, dir, "click"), stream(s, dir, "view"),
          Seq("user_id"), "ts_ms", "ts_ms", 3600000L, "r_"),
      Some("""SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms, l.value,
             |  r.event_id AS r_event_id, epoch_ms(r.ts) AS r_ts_ms,
             |  r.value AS r_value
             |FROM events l JOIN events r ON l.user_id = r.user_id
             |  AND l.event_type = 'click' AND r.event_type = 'view'
             |  AND abs(epoch_ms(l.ts) - epoch_ms(r.ts)) <= 3600000""".stripMargin)),

    // collect: latest row per key (ref: esp_collect.erl:63-637).
    "join_collect_latest" -> QueryDef(
      (s, dir) =>
        Joins.collectLatest(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ms"), col("value")),
          Seq(col("user_id")), Seq(col("ts_ms"))),
      Some("""SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
             |FROM events
             |QUALIFY row_number() OVER
             |  (PARTITION BY user_id ORDER BY ts DESC) = 1""".stripMargin)),

    // collect with add/remove upsert semantics: a key's entry is its
    // latest qualifying add after its latest remove
    // (ref: esp_collect.erl add/remove lambdas).
    "join_collect_upsert" -> QueryDef(
      (s, dir) =>
        Joins.collectUpsert(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_ms"),
              col("value"), col("event_type")),
          Seq("user_id"), "ts_ms",
          add = col("value") > 20, remove = col("event_type") === "error")
          .select("event_id", "user_id", "ts_ms", "value"),
      Some("""WITH rm AS (SELECT user_id, max(epoch_ms(ts)) AS rms
             |            FROM events WHERE event_type = 'error' GROUP BY 1),
             |a AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
             |      FROM events WHERE value > 20)
             |SELECT event_id, user_id, ts_ms, value
             |FROM a LEFT JOIN rm USING (user_id)
             |WHERE rms IS NULL OR ts_ms > rms
             |QUALIFY row_number() OVER
             |  (PARTITION BY user_id ORDER BY ts_ms DESC) = 1""".stripMargin)),

    // collect_fields: latest value per (user, event_type) pivoted to one
    // row per user (ref: esp_collect_fields.erl:33-102).
    "join_collect_fields" -> QueryDef(
      (s, dir) =>
        Joins.collectFields(
          Tables.events(s, dir), col("user_id"), "event_type",
          Seq("click", "view", "purchase", "signup", "error"),
          "value", "ts_ms"),
      Some("""SELECT user_id,
             |  arg_max(value, ts) FILTER (WHERE event_type = 'click') AS click,
             |  arg_max(value, ts) FILTER (WHERE event_type = 'view') AS view,
             |  arg_max(value, ts) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  arg_max(value, ts) FILTER (WHERE event_type = 'signup') AS signup,
             |  arg_max(value, ts) FILTER (WHERE event_type = 'error') AS error
             |FROM events GROUP BY user_id""".stripMargin)),

    // mem / jsn_select: broadcast lookup enrichment (refs: esp_mem.erl,
    // esp_jsn_select.erl:33-62).
    "join_mem_lookup" -> QueryDef(
      (s, dir) =>
        Mem.lookup(
          Tables.events(s, dir).select(col("event_id"), col("user_id")),
          Tables.load(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
          col("user_id") % 25 === col("n_nationkey"))
          .select(col("event_id"), col("user_id"), col("n_name")),
      Some("""SELECT e.event_id, e.user_id, n.n_name
             |FROM events e LEFT JOIN nation n
             |  ON e.user_id % 25 = n.n_nationkey""".stripMargin)),

    // salted shuffle join (SCALE.md skew playbook): the skewed side
    // spreads each key over 8 row-derived sub-keys, the dim side is
    // replicated per salt, and the (key, salt) join must reproduce the
    // plain join ROW-FOR-ROW — the hash pin proves salting is purely a
    // partitioning transform, never a semantic one.
    "join_salted" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
        graft.operators.join.Skew.saltedJoin(li, ord, Seq("l_orderkey"), 8)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, o_custkey
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin)),

    // bloom-gated semi join (SCALE.md bloom pruning): the fact side is
    // filtered by a Bloom sketch of the dimension keys BEFORE its
    // shuffle, then the exact join runs behind the gate — the hash pin
    // proves the gate is a pure shuffle reducer, never a semantic
    // change (no false negatives; false positives die in the join).
    "join_bloom_semi" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val hot = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"))
        graft.operators.join.BloomPrune.prunedJoin(
          li, col("l_orderkey"), hot, col("o_orderkey"),
          "left_semi", expectedItems = 10000L, fpp = 0.01)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_totalprice > 400000)""".stripMargin))
  )
}
