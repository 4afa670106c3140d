package graft.packs

import graft.{QueryDef, QueryPack}
import graft.dfs.DfsEngine

/** Driver-verifiable queries built FROM DFS SCRIPTS — the front-end runs
  * inside the correctness gate: script → parse → validate → plan →
  * DataFrame, hash-matched against DuckDB.
  */
object DfsPack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    // macro expansion under the correctness gate (faxe_dfs.erl:49-57):
    // the macro's body chain splices at the ||call site with the .thresh
    // override substituted — the expanded plan must hash-match plain SQL.
    "dfs_macro" -> QueryDef(
      (s, dir) => {
        graft.dfs.Macros.register("hot_filter",
          """#def thresh = 90
             #|where(lambda: "value" > thresh)
             #|eval(lambda: "value" - thresh)
             #  .as('over_by')
             #""".stripMargin('#'))
        try DfsEngine.runSingle(
          """#|parquet_read(.table('events'))
             #||hot_filter()
             #  .thresh(95)
             #|keep('event_id', 'value', 'over_by')
             #""".stripMargin('#'), s, dir)
        finally graft.dfs.Macros.clear()
      },
      Some("""SELECT event_id, value, value - 95 AS over_by
             |FROM events WHERE value > 95""".stripMargin)),

    // SURVEY §7.2 minimum slice: scan → filter → keyed window → aggregate.
    "dfs_pipeline" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|where(lambda: "value" > 45)
          #|group_by('user_id')
          #|win_time(.period(1d))
          #|aggregate(.fields('value','value','value').functions('count','min','max').as('n','vmin','vmax'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id,
             |  (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
             |  (epoch_ms(ts) // 86400000) * 86400000 + 86400000 AS window_end_ms,
             |  count(value) AS n, min(value) AS vmin, max(value) AS vmax
             |FROM events WHERE value > 45
             |GROUP BY 1, 2, 3""".stripMargin)),

    // count window + state op through the front-end: group_by → win_event
    // tumbling 10 rows → aggregate.
    "dfs_count_window" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|win_event(.period(10).every(10))
          #|aggregate(.fields('value','value').functions('count','max').as('n','vmax'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
             |  count(value) AS n, max(value) AS vmax
             |FROM (SELECT user_id, value, row_number() OVER
             |        (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS rn
             |      FROM events)
             |GROUP BY 1, 2""".stripMargin)),

    // count_change through the front-end: lag pre-pass over the
    // un-windowed stream, then the weekly window sums the markers
    // (keep_tail continuity, esp_aggregate.erl:41,106).
    "dfs_count_change" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|win_time(.period(7d))
          #|aggregate(.fields('event_type','event_type').functions('count_change','count').as('n_changes','n'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id,
             |  (epoch_ms(ts) // 604800000) * 604800000 AS window_start_ms,
             |  (epoch_ms(ts) // 604800000) * 604800000 + 604800000 AS window_end_ms,
             |  CAST(sum(chg) AS BIGINT) AS n_changes, count(event_type) AS n
             |FROM (
             |  SELECT user_id, ts, event_type,
             |    CASE WHEN lag(event_type) OVER
             |        (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NOT NULL
             |      AND lag(event_type) OVER
             |        (PARTITION BY user_id ORDER BY epoch_ms(ts)) <> event_type
             |    THEN 1 ELSE 0 END AS chg
             |  FROM events)
             |GROUP BY 1, 2, 3""".stripMargin)),

    // top-N per key through the front-end (stats/esp_top.erl).
    "dfs_top" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|top(.field('value').n(2))
          #|keep('event_id', 'user_id', 'value')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT event_id, user_id, value FROM (
             |  SELECT event_id, user_id, value, row_number() OVER
             |    (PARTITION BY user_id ORDER BY value DESC, epoch_ms(ts)) AS rnk
             |  FROM events) WHERE rnk <= 2""".stripMargin)),

    // case node through the front-end (first-true branch list).
    "dfs_case" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|case(lambda: "value" < 25, lambda: "value" < 50, lambda: "value" < 75)
          #  .values('q1', 'q2', 'q3')
          #  .default('q4')
          #  .as('quartile')
          #|keep('event_id', 'quartile')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT event_id,
             |  CASE WHEN value < 25 THEN 'q1' WHEN value < 50 THEN 'q2'
             |       WHEN value < 75 THEN 'q3' ELSE 'q4' END AS quartile
             |FROM events""".stripMargin)),

    // jsn_select broadcast lookup through the front-end.
    "dfs_lookup" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|eval(lambda: mod("user_id", 25)).as('nk')
          #|jsn_select(.table('nation').keys('nk', 'n_nationkey').fields('n_name'))
          #|keep('event_id', 'n_name')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT e.event_id, n.n_name
             |FROM events e LEFT JOIN nation n ON e.user_id % 25 = n.n_nationkey""".stripMargin)),

    // DFS `join` node, prefix mode (ref: esp_join.erl:50-248): two
    // parquet-backed chains conflated on nearest-ts within .tolerance,
    // complete rows only (full=true default).
    "dfs_join" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def views =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'view')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #clicks
          #|group_by('user_id')
          #|join(views).prefix('r_').tolerance(1h)
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id
             |           FROM events WHERE event_type = 'view'),
             |b AS (SELECT l.event_id AS lid, r.ts_ms AS bts, r.value AS bval,
             |        r.event_id AS bid
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms),
             |f AS (SELECT l.event_id AS lid, r.ts_ms AS fts, r.value AS fval,
             |        r.event_id AS fid
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms < r.ts_ms),
             |n AS (SELECT l.user_id, l.ts_ms, l.value, l.event_id,
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
             |       JOIN f ON l.event_id = f.lid)
             |SELECT * FROM n
             |WHERE r_ts_ms IS NOT NULL
             |  AND abs(ts_ms - r_ts_ms) <= 3600000""".stripMargin)),

    // DFS `join` .merge_field mode (esp_join.erl:166-179,232-241): matched
    // rows merge the field — numbers add.
    "dfs_join_merge" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def views =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'view')
          #|keep('user_id', 'ts_ms', 'value')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #clicks
          #|group_by('user_id')
          #|join(views).merge_field('value').tolerance(30m)
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value
             |           FROM events WHERE event_type = 'view'),
             |b AS (SELECT l.event_id AS lid, r.ts_ms AS bts, r.value AS bval
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms),
             |f AS (SELECT l.event_id AS lid, r.ts_ms AS fts, r.value AS fval
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms < r.ts_ms),
             |n AS (SELECT l.user_id, l.ts_ms, l.event_id, l.value AS lval,
             |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
             |       ELSE bts END AS mts,
             |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fval
             |       ELSE bval END AS mval
             |FROM l JOIN b ON l.event_id = b.lid
             |       JOIN f ON l.event_id = f.lid)
             |SELECT user_id, ts_ms, event_id, lval + mval AS value
             |FROM n
             |WHERE mts IS NOT NULL AND abs(ts_ms - mts) <= 1800000""".stripMargin)),

    // DFS `join` with .full(false) (esp_join.erl:61-70 fill): partial rows
    // pass with nulls — the outer form.
    "dfs_join_outer" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def views =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'view')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #clicks
          #|group_by('user_id')
          #|join(views).prefix('r_').tolerance(10m).full(false)
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value, event_id
             |           FROM events WHERE event_type = 'view'),
             |b AS (SELECT l.event_id AS lid, r.ts_ms AS bts, r.value AS bval,
             |        r.event_id AS bid
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms),
             |f AS (SELECT l.event_id AS lid, r.ts_ms AS fts, r.value AS fval,
             |        r.event_id AS fid
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms < r.ts_ms),
             |n AS (SELECT l.user_id, l.ts_ms, l.value, l.event_id,
             |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
             |       ELSE bts END AS nts,
             |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fval
             |       ELSE bval END AS nval,
             |  CASE WHEN bts IS NULL THEN fid WHEN fts IS NULL THEN bid
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fid
             |       ELSE bid END AS nid
             |FROM l JOIN b ON l.event_id = b.lid
             |       JOIN f ON l.event_id = f.lid)
             |SELECT user_id, ts_ms, value, event_id,
             |  CASE WHEN abs(ts_ms - nts) <= 600000 THEN nts END AS r_ts_ms,
             |  CASE WHEN abs(ts_ms - nts) <= 600000 THEN nval END AS r_value,
             |  CASE WHEN abs(ts_ms - nts) <= 600000 THEN nid END AS r_event_id
             |FROM n""".stripMargin)),

    // The join landing truth table in one script: partial emission (fill
    // implies full=false), an own-name TYPE COLLISION ('tag' is string on
    // the left, bigint on the right — unmatched rows keep the left value,
    // both sides string-rendered; esp_join.erl:182-196 folds present
    // ports only), and the .fill value standing in on the non-colliding
    // numeric column ('extra'). Views restricted to user_id < 8 so both
    // matched and unmatched rows exist at every scale factor.
    "dfs_join_fill_collide" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def views =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'view' AND "user_id" < 8)
          #|eval(lambda: 1, lambda: "value" * 2).as('tag', 'extra')
          #|keep('user_id', 'ts_ms', 'tag', 'extra')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|eval(lambda: 'L').as('tag')
          #|keep('user_id', 'ts_ms', 'tag', 'event_id')
          #
          #clicks
          #|group_by('user_id')
          #|join(views).tolerance(30m).fill(-1)
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, 'L' AS tag,
             |             event_id
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
             |             CAST(1 AS BIGINT) AS tag, value * 2 AS extra
             |           FROM events
             |           WHERE event_type = 'view' AND user_id < 8),
             |b AS (SELECT l.event_id AS lid, r.ts_ms AS bts, r.tag AS btag,
             |        r.extra AS bextra
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms),
             |f AS (SELECT l.event_id AS lid, r.ts_ms AS fts, r.tag AS ftag,
             |        r.extra AS fextra
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND l.ts_ms < r.ts_ms),
             |n AS (SELECT l.user_id, l.ts_ms, l.tag AS ltag, l.event_id,
             |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
             |       ELSE bts END AS nts,
             |  CASE WHEN bts IS NULL THEN ftag WHEN fts IS NULL THEN btag
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN ftag
             |       ELSE btag END AS ntag,
             |  CASE WHEN bts IS NULL THEN fextra WHEN fts IS NULL THEN bextra
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fextra
             |       ELSE bextra END AS nextra
             |FROM l JOIN b ON l.event_id = b.lid
             |       JOIN f ON l.event_id = f.lid)
             |SELECT user_id, ts_ms, event_id,
             |  CASE WHEN nts IS NOT NULL AND abs(ts_ms - nts) <= 1800000
             |       THEN CAST(ntag AS VARCHAR) ELSE ltag END AS tag,
             |  CASE WHEN nts IS NOT NULL AND abs(ts_ms - nts) <= 1800000
             |       THEN nextra ELSE CAST(-1 AS DOUBLE) END AS extra
             |FROM n""".stripMargin)),

    // DFS `combine` through the front-end: as-of-latest enrich with the
    // reference's cold-buffer rule — a click before the user's first view
    // emits NOTHING (esp_combine.erl:94-95 "No output is given, if there
    // has never arrived a value on port 2"); .prefix composes with the
    // default '_' delimiter (esp_combine.erl:60 PREFIX_DEL).
    "dfs_combine_cold" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def views =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'view')
          #|keep('user_id', 'ts_ms', 'value')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #clicks
          #|combine(views)
          #  .keys('user_id')
          #  .fields('value')
          #  .prefix('v')
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value,
             |             event_id
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value
             |           FROM events WHERE event_type = 'view')
             |SELECT l.user_id, l.ts_ms, l.value, l.event_id,
             |  r.value AS v_value
             |FROM l ASOF JOIN r
             |  ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms""".stripMargin)),

    // DFS `join2` with two joined streams (esp_join2.erl): per-stream
    // nearest-ts within the shared .tolerance, default empty prefixes
    // land own names, and full=true (the default) keeps only rows where
    // EVERY joined stream matched (:61,136-138 is_full_row).
    "dfs_join2_full" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def purchases =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'purchase')
          #|eval(lambda: "value").as('pval')
          #|keep('user_id', 'ts_ms', 'pval')
          #
          #def errors =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'error')
          #|eval(lambda: "value").as('errval')
          #|keep('user_id', 'ts_ms', 'errval')
          #
          #def clicks =
          #|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|keep('user_id', 'ts_ms', 'value', 'event_id')
          #
          #clicks
          #|group_by('user_id')
          #|join2(purchases, errors)
          #  .tolerance(4h)
          #""".stripMargin('#'), s, dir),
      Some("""WITH l AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value,
             |             event_id
             |           FROM events WHERE event_type = 'click'),
             |     p AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
             |             value AS pval
             |           FROM events WHERE event_type = 'purchase'),
             |     e AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
             |             value AS errval
             |           FROM events WHERE event_type = 'error'),
             |pb AS (SELECT l.event_id AS lid, p.ts_ms AS bts, p.pval AS bval
             |       FROM l ASOF LEFT JOIN p
             |         ON l.user_id = p.user_id AND l.ts_ms >= p.ts_ms),
             |pf AS (SELECT l.event_id AS lid, p.ts_ms AS fts, p.pval AS fval
             |       FROM l ASOF LEFT JOIN p
             |         ON l.user_id = p.user_id AND l.ts_ms < p.ts_ms),
             |pn AS (SELECT l.event_id AS lid,
             |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
             |       ELSE bts END AS nts,
             |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fval
             |       ELSE bval END AS nval
             |FROM l JOIN pb ON l.event_id = pb.lid
             |       JOIN pf ON l.event_id = pf.lid),
             |eb AS (SELECT l.event_id AS lid, e.ts_ms AS bts,
             |         e.errval AS bval
             |       FROM l ASOF LEFT JOIN e
             |         ON l.user_id = e.user_id AND l.ts_ms >= e.ts_ms),
             |ef AS (SELECT l.event_id AS lid, e.ts_ms AS fts,
             |         e.errval AS fval
             |       FROM l ASOF LEFT JOIN e
             |         ON l.user_id = e.user_id AND l.ts_ms < e.ts_ms),
             |en AS (SELECT l.event_id AS lid,
             |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fts
             |       ELSE bts END AS nts,
             |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
             |       WHEN (fts - l.ts_ms) < (l.ts_ms - bts) THEN fval
             |       ELSE bval END AS nval
             |FROM l JOIN eb ON l.event_id = eb.lid
             |       JOIN ef ON l.event_id = ef.lid)
             |SELECT l.user_id, l.ts_ms, l.value, l.event_id,
             |  pn.nval AS pval, en.nval AS errval
             |FROM l JOIN pn ON l.event_id = pn.lid
             |       JOIN en ON l.event_id = en.lid
             |WHERE pn.nts IS NOT NULL AND abs(l.ts_ms - pn.nts) <= 14400000
             |  AND en.nts IS NOT NULL
             |  AND abs(l.ts_ms - en.nts) <= 14400000""".stripMargin)),

    // collect_fields through the front-end: latest value of each listed
    // field per stream key (esp_collect_fields.erl:33-102).
    "dfs_collect_fields" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|collect_fields(.fields('value', 'event_type'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id, arg_max(value, ts) AS value,
             |  arg_max(event_type, ts) AS event_type
             |FROM events GROUP BY user_id""".stripMargin)),

    // collect_unique through the front-end: latest row per (key, field
    // discriminant) (esp_collect_unique.erl:51-122).
    "dfs_collect_unique" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|collect_unique(.field('event_type'))
          #|keep('user_id', 'event_type', 'ts_ms', 'value', 'event_id')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, value, event_id
             |FROM events
             |QUALIFY row_number() OVER
             |  (PARTITION BY user_id, event_type ORDER BY ts DESC) = 1""".stripMargin)),

    // triggered_timeout through the front-end: click not followed by a
    // purchase within 2h on the same user (esp_triggered_timeout.erl:46-56).
    "dfs_triggered_timeout" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|triggered_timeout(lambda: "event_type" == 'click')
          #  .cancel_trigger(lambda: "event_type" == 'purchase')
          #  .timeout(2h)
          #|keep('user_id', 'event_id', 'ts_ms')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id, event_id, ts_ms FROM (
             |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
             |      OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
             |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nc
             |  FROM events)
             |WHERE event_type = 'click'
             |  AND (nc IS NULL OR nc - ts_ms > 7200000)""".stripMargin)),

    // mem + env lambdas through the front-end: a mem node gathers a SET
    // from one chain; ls_mem_member()/env() filter another
    // (esp_mem.erl:1-13; dfs/test/env.dfs).
    "dfs_mem_env" -> QueryDef(
      (s, dir) => {
        graft.core.MemStore.clear()
        graft.core.EngineConf.set("GRAFT_TEST_CUTOFF", "40")
        DfsEngine.runSingle(
          """def hot =
            #|parquet_read(.table('events'))
            #|where(lambda: "value" > 99)
            #|mem(.field('user_id').type('set').key('hot_users'))
            #
            #def base =
            #|parquet_read(.table('events'))
            #
            #base
            #|where(lambda: ls_mem_member("user_id", 'hot_users') AND "value" > float(env('GRAFT_TEST_CUTOFF', '0')))
            #|keep('event_id', 'user_id', 'event_type', 'value')
            #""".stripMargin('#'), s, dir)
      },
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE user_id IN
             |    (SELECT DISTINCT user_id FROM events WHERE value > 99)
             |  AND value > 40""".stripMargin)),

    // value_diff with plural .fields through the front-end (the
    // group_by.dfs option shape): per-user deltas of two fields at once.
    "dfs_value_diff" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|value_diff(.fields('value', 'ts_ms').as('dv', 'dt').mode('c-p'))
          #|keep('event_id', 'user_id', 'dv', 'dt')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT event_id, user_id,
             |  coalesce(value - lag(value) OVER w, value) AS dv,
             |  coalesce(epoch_ms(ts) - lag(epoch_ms(ts)) OVER w, epoch_ms(ts)) AS dt
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))""".stripMargin)),

    // single-function stats node through the front-end (components/stats):
    // median per user per weekly window.
    "dfs_median_node" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|win_time(.period(7d))
          #|median(.field('value').as('med'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT user_id,
             |  (epoch_ms(ts) // 604800000) * 604800000 AS window_start_ms,
             |  (epoch_ms(ts) // 604800000) * 604800000 + 604800000 AS window_end_ms,
             |  median(value) AS med
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // statistics bundle node through the front-end
    // (esp_statistics.erl:24-29).
    "dfs_statistics_node" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('event_type')
          #|win_time(.period(30d))
          #|statistics(.field('value').modules('avg', 'min', 'max', 'count'))
          #""".stripMargin('#'), s, dir),
      Some("""SELECT event_type,
             |  (epoch_ms(ts) // 2592000000) * 2592000000 AS window_start_ms,
             |  (epoch_ms(ts) // 2592000000) * 2592000000 + 2592000000 AS window_end_ms,
             |  round(avg(value), 6) AS avg, min(value) AS min,
             |  max(value) AS max, count(value) AS count
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // stateless lambda pipeline through the front-end: eval chain with
    // sequential visibility + scalar library calls.
    "dfs_eval" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """def cutoff = 20
          #|parquet_read(.table('events'))
          #|where(lambda: "value" >= cutoff)
          #|eval(lambda: int("value" * 10), lambda: str_concat("event_type", '_', string("user_id")))
          #  .as('v10', 'tag')
          #|keep('event_id', 'v10', 'tag')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT event_id, CAST(trunc(value * 10) AS BIGINT) AS v10,
             |  event_type || '_' || CAST(user_id AS VARCHAR) AS tag
             |FROM events WHERE value >= 20""".stripMargin)),

    // value_emitter under the oracle (esp_value_emitter.erl:26-66): the
    // deterministic synthetic source — monotonic value sequence, paced
    // event time BASE + i*every — hash-pinned against a constant relation.
    "dfs_emitter" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|value_emitter(.count(20).every(1s).mode(monotonic_int))
          #|eval(lambda: "val" * 2 + 1).as('doubled')
          #|where(lambda: "doubled" > 9)
          #|keep('id', 'val', 'doubled', 'ts_ms')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT id, id AS val, id * 2 + 1 AS doubled,
             |  1577836800000 + id * 1000 AS ts_ms
             |FROM range(20) t(id) WHERE id * 2 + 1 > 9""".stripMargin)),

    // json_emitter under the oracle (esp_json_emitter.erl:37-66): literal
    // docs → ordered rows (_seq pins arrival order), downstream lambda
    // math on the parsed payload.
    "dfs_emitter_json" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """#|json_emitter('{"k": "a", "v": 1}', '{"k": "b", "v": 2}', '{"k": "a", "v": 5}')
           #|eval(lambda: "v" * 10).as('v10')
           #""".stripMargin('#'), s, dir),
      Some("""SELECT *, 1577836800000 + _seq * 1000 AS ts FROM (VALUES
             |  (CAST(0 AS BIGINT), 'a', CAST(1 AS BIGINT), CAST(10 AS BIGINT)),
             |  (CAST(1 AS BIGINT), 'b', CAST(2 AS BIGINT), CAST(20 AS BIGINT)),
             |  (CAST(2 AS BIGINT), 'a', CAST(5 AS BIGINT), CAST(50 AS BIGINT)))
             |AS t(_seq, k, v, v10)""".stripMargin)),

    // debug + log are pass-through taps (esp_debug.erl; df_component
    // item-forwarding default): the chain's data must be bit-identical
    // with the taps spliced in.
    "dfs_debug" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('nation'))
          #|debug(.level('info'))
          #|where(lambda: "n_regionkey" < 2)
          #|log(.level('warn'))
          #|keep('n_nationkey', 'n_name', 'n_regionkey')
          #""".stripMargin('#'), s, dir),
      Some("""SELECT n_nationkey, n_name, n_regionkey
             |FROM nation WHERE n_regionkey < 2""".stripMargin)),

    // group_union (esp_group_union.erl): merges the keyed branches back
    // into ONE stream — proven observably, not just structurally: the
    // second window aggregates ACROSS users (a single global weekly
    // rollup), which only happens if group_union really dropped the keys.
    "dfs_group_union" -> QueryDef(
      (s, dir) => DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #|group_by('user_id')
          #|win_time(.period(1d))
          #|aggregate(.fields('value').functions('max').as('vmax'))
          #|group_union()
          #|win_time(.period(7d))
          #|aggregate(.fields('vmax','vmax').functions('count','max').as('n_days','vmax_wk'))
          #""".stripMargin('#'), s, dir),
      Some("""WITH g AS (
             |  SELECT user_id,
             |    (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
             |    max(value) AS vmax
             |  FROM events GROUP BY 1, 2)
             |SELECT (window_start_ms // 604800000) * 604800000 AS window_start_ms,
             |  (window_start_ms // 604800000) * 604800000 + 604800000 AS window_end_ms,
             |  count(vmax) AS n_days, max(vmax) AS vmax_wk
             |FROM g GROUP BY 1, 2""".stripMargin)),

    // custom-node registration (the @python component analog,
    // faxe_dfs.erl:12-16): a user-registered Scala NodeDef plans like a
    // built-in and its output is hash-pinned like any other operator.
    "dfs_custom_node" -> QueryDef(
      (s, dir) => {
        import graft.dfs.{Ir, Planner}
        Planner.registerNode("val_band", Planner.NodeDef(
          Some(Ir.Point), Ir.Point, Set("width"),
          (c, n, env) => {
            val ctx = c.getOrElse(throw Ir.DfsError("val_band needs input"))
            ctx.copy(df = ctx.df.withColumn("band",
              org.apache.spark.sql.functions.floor(
                org.apache.spark.sql.functions.col("value") / 10) * 10))
          }))
        DfsEngine.runSingle(
          """|parquet_read(.table('events'))
            #|val_band()
            #|where(lambda: "band" >= 80)
            #|keep('event_id', 'value', 'band')
            #""".stripMargin('#'), s, dir)
      },
      Some("""SELECT event_id, value,
             |  CAST(floor(value / 10) * 10 AS BIGINT) AS band
             |FROM events WHERE floor(value / 10) * 10 >= 80""".stripMargin))
  )
}
