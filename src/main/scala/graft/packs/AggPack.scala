package graft.packs

import graft.{QueryDef, QueryPack}
import graft.core.Tables
import graft.operators.agg.{AggFunctions, Aggregate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver-verifiable queries for SURVEY §2.4 aggregation functions.
  *
  * Float policy: group sums of arbitrary doubles are order-dependent, so
  * money arithmetic goes through exact DECIMAL and casts back to DOUBLE;
  * statistical moments are rounded to 6-8 significant decimals on both
  * sides. Integer-valued doubles (l_quantity) sum exactly — no rounding.
  */
object AggPack extends QueryPack {

  def entries: Map[String, QueryDef] = Map(
    // Flagship: the aggregate node's core functions over a grouped batch
    // (ref: esp_aggregate.erl:14-33).
    "q1_agg" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
              .cast("double").as("revenue"),
            count(col("l_quantity")).as("n"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            (max(col("l_quantity")) - min(col("l_quantity"))).as("range_qty"),
            avg(col("l_quantity")).as("avg_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
             |  count(l_quantity) AS n,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty,
             |  max(l_quantity) - min(l_quantity) AS range_qty,
             |  avg(l_quantity) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Statistical family: variance/stddev/median/geometric_mean
    // (ref: esp_aggregate.erl:227-246, stats/*.erl).
    "agg_stats" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(var_samp(col("l_quantity")), 6).as("var_qty"),
            round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
            median(col("l_quantity")).as("med_qty"),
            round(exp(avg(log(col("l_quantity")))), 6).as("geo_qty")),
      Some("""SELECT l_returnflag,
             |  round(var_samp(l_quantity), 6) AS var_qty,
             |  round(stddev_samp(l_quantity), 6) AS std_qty,
             |  median(l_quantity) AS med_qty,
             |  round(exp(avg(ln(l_quantity))), 6) AS geo_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Exact distinct (ref: esp_aggregate.erl:247-248 — exact, not HLL).
    "agg_count_distinct" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            count_distinct(col("l_partkey")).as("nd_part"),
            count_distinct(col("l_quantity")).as("nd_qty")),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS nd_part,
             |  count(DISTINCT l_quantity) AS nd_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // count_change: lag-marker pre-pass + group sum (ref:
    // esp_aggregate.erl:193-206,249-250). Per-user changes of event_type.
    "agg_count_change" -> QueryDef(
      (s, dir) => {
        val prepped = AggFunctions.countChangePrep(
          Tables.events(s, dir),
          col("event_type"),
          Seq(col("ts_ns"), col("event_id")),
          Seq(col("user_id")),
          "chg")
        prepped.groupBy(col("user_id"))
          .agg(sum(col("chg")).as("n_changes"), count(lit(1)).as("n"))
      },
      // CAST: DuckDB widens sum(INTEGER) to HUGEINT; Spark emits BIGINT —
      // values are identical, the driver hash needs matching int64.
      Some("""SELECT user_id, CAST(sum(chg) AS BIGINT) AS n_changes, count(*) AS n FROM (
             |  SELECT user_id,
             |    CASE WHEN lag(event_type) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
             |     AND lag(event_type) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
             |    THEN 1 ELSE 0 END AS chg
             |  FROM events) GROUP BY user_id""".stripMargin)),

    // Exact percentile node (ref: esp_percentile.erl:26-80). Array form:
    // one group-sort computes both quantiles on both engines.
    "agg_percentile" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_linestatus"))
          .agg(AggFunctions.percentiles(col("l_extendedprice"), Seq(0.25, 0.9))
            .as("_ps"))
          .select(col("l_linestatus"),
            element_at(col("_ps"), 1).as("p25"),
            element_at(col("_ps"), 2).as("p90")),
      Some {
        // the oracle replays esp_percentile.erl:62-72 verbatim (rank
        // R = p·n, 1-based trunc/interpolate — NOT quantile_cont's
        // p·(n−1)); same double op order as the Spark side. The p
        // literal MUST be cast: DuckDB parses bare 0.9 as DECIMAL and
        // decimal-exact rank arithmetic diverges from Spark's double in
        // the last bit
        def pct(p0: String) = { val p = s"CAST($p0 AS DOUBLE)"
          s"""(CASE WHEN CAST(floor($p * n) AS INT) < 1 THEN s[1]
             | ELSE s[CAST(floor($p * n) AS INT)]
             |   + (s[LEAST(CAST(floor($p * n) AS INT) + 1, n)]
             |      - s[CAST(floor($p * n) AS INT)])
             |     * ($p * n - floor($p * n)) END)""".stripMargin }
        // count(col)/FILTER keep n and s null-free like Spark's
        // collect_list — count(*) would count null rows and shift every
        // rank on a nullable column
        s"""SELECT l_linestatus, ${pct("0.25")} AS p25, ${pct("0.9")} AS p90
           |FROM (SELECT l_linestatus,
           |        list_sort(list(l_extendedprice)
           |          FILTER (l_extendedprice IS NOT NULL)) AS s,
           |        CAST(count(l_extendedprice) AS INT) AS n
           |      FROM lineitem GROUP BY l_linestatus)""".stripMargin
      }),

    // first/last by timestamp (ref: stats/esp_first.erl, c_agg.erl:19-26).
    "agg_first_last" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            min_by(col("event_type"), col("ts_ns")).as("first_type"),
            max_by(col("event_type"), col("ts_ns")).as("last_type"),
            min(col("ts_ms")).as("first_ms"),
            max(col("ts_ms")).as("last_ms")),
      Some("""SELECT user_id,
             |  arg_min(event_type, ts) AS first_type,
             |  arg_max(event_type, ts) AS last_type,
             |  epoch_ms(min(ts)) AS first_ms,
             |  epoch_ms(max(ts)) AS last_ms
             |FROM events GROUP BY user_id""".stripMargin)),

    // skew/kurtosis with the explicit moment formulas Spark implements, so
    // the oracle states the same arithmetic (ref: stats/esp_skew.erl,
    // esp_kurtosis.erl via mathex).
    "agg_skew_kurtosis" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(skewness(col("l_quantity")), 6).as("skew_qty"),
            round(kurtosis(col("l_quantity")), 6).as("kurt_qty")),
      Some("""WITH mu AS (
             |  SELECT l_returnflag, avg(l_quantity) AS m, count(*) AS n
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l.l_returnflag,
             |  round(avg(pow(l.l_quantity - mu.m, 3)) /
             |        pow(avg(pow(l.l_quantity - mu.m, 2)), 1.5), 6) AS skew_qty,
             |  round(avg(pow(l.l_quantity - mu.m, 4)) /
             |        pow(avg(pow(l.l_quantity - mu.m, 2)), 2) - 3.0, 6) AS kurt_qty
             |FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
             |GROUP BY l.l_returnflag""".stripMargin)),

    // top-N with timestamps (ref: stats/esp_top.erl:16-24) — the classic
    // per-group top-k via row_number; scale path: rank inside each window
    // partition, no global sort.
    "agg_topn" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))
        Tables.events(s, dir)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("user_id"), col("rnk"), col("value"),
            col("ts_ms").as("ms"))
      },
      Some("""SELECT user_id, CAST(rnk AS INTEGER) AS rnk, value, epoch_ms(ts) AS ms FROM (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
             |  FROM events) WHERE rnk <= 3""".stripMargin)),

    "agg_bottomn" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").asc, col("event_id"))
        Tables.events(s, dir)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("user_id"), col("rnk"), col("value"),
            col("ts_ms").as("ms"))
      },
      Some("""SELECT user_id, CAST(rnk AS INTEGER) AS rnk, value, epoch_ms(ts) AS ms FROM (
             |  SELECT *, row_number() OVER
             |    (PARTITION BY user_id ORDER BY value ASC, event_id) AS rnk
             |  FROM events) WHERE rnk <= 3""".stripMargin)),

    // distinct: the distinct value *list* (ref: stats/esp_distinct.erl:14,
    // collect_set) — sorted + joined to a canonical string so the oracle
    // compare stays scalar (array cells are hasher-hostile).
    "agg_distinct" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
            .as("types")),
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
             |FROM events GROUP BY user_id""".stripMargin)),

    // elapsed / difference stats nodes: per-batch delta lists (refs:
    // stats/esp_elapsed.erl:14, esp_stats_difference.erl:14-27) as
    // canonical comma-joined strings.
    "agg_elapsed_difference" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(AggFunctions.sortedTsValues(col("value"), col("ts_ms")).as("_l"))
          .select(col("user_id"),
            AggFunctions.elapsedFrom(col("_l")).as("elapsed"),
            AggFunctions.differenceFrom(col("_l")).as("diffs")),
      Some("""SELECT user_id,
             |  CASE WHEN len(tl) >= 2 THEN array_to_string(
             |    [(tl[i] - tl[i-1])::VARCHAR for i in range(2, len(tl)+1)], ',')
             |  ELSE '' END AS elapsed,
             |  CASE WHEN len(vl) >= 2 THEN array_to_string(
             |    [CAST(floor((vl[i] - vl[i-1]) * 1000) AS BIGINT)::VARCHAR
             |     for i in range(2, len(vl)+1)], ',')
             |  ELSE '' END AS diffs
             |FROM (SELECT user_id,
             |        list_sort(list(epoch_ms(ts))) AS tl,
             |        list(value ORDER BY ts) AS vl
             |      FROM events GROUP BY user_id)""".stripMargin)),

    // dist_count: per-distinct-value occurrence counts
    // (ref: stats/esp_stats_dist_count.erl).
    "agg_dist_count" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n")),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type")),

    // statistics node: a list of stats over one field merged into one row
    // (ref: esp_statistics.erl:24-54).
    "agg_statistics" -> QueryDef(
      (s, dir) =>
        Aggregate(
          Tables.events(s, dir),
          Seq(col("event_type")),
          Seq(
            Aggregate.Spec("value", "count", "n"),
            Aggregate.Spec("value", "min", "vmin"),
            Aggregate.Spec("value", "max", "vmax"),
            Aggregate.Spec("value", "median", "vmed")),
          ts = "ts_ns"),
      Some("""SELECT event_type, count(value) AS n, min(value) AS vmin,
             |  max(value) AS vmax, median(value) AS vmed
             |FROM events GROUP BY event_type""".stripMargin))
  )
}
