package graft.packs

import graft.{QueryDef, QueryPack}
import graft.dfs.DfsEngine

/** Driver-verifiable queries built FROM DFS SCRIPTS — the front-end runs
  * inside the correctness gate: script → parse → validate → plan →
  * DataFrame, hash-matched against DuckDB.
  */
object DfsPack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
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
          #|win_event(.period(10))
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
             |FROM events WHERE value >= 20""".stripMargin))
  )
}
