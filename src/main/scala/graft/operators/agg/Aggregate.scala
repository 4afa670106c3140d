package graft.operators.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `aggregate` node's function registry (SURVEY §2.4; ref:
  * esp_aggregate.erl:14-33 whitelist, esp_stats framework aliases
  * faxe_dfs.erl:568-589).
  *
  * All functions are Catalyst built-ins or compositions — they get partial
  * (map-side) aggregation and whole-stage codegen for free, which is the
  * property that matters at 100 TB: a shuffle moves one pre-aggregated row
  * per (partition, group), never raw rows.
  *
  * `count_change` is the one cross-row function: it is formulated as a
  * lag-comparison pre-pass + sum (see [[countChangePrep]]), exactly the
  * decomposition that keeps it partial-aggregatable after the pre-pass.
  */
object AggFunctions {
  val names: Seq[String] = Seq(
    "count", "sum", "min", "max", "avg", "mean", "range", "geometric_mean",
    "median", "variance", "stddev", "count_distinct", "skew", "kurtosis",
    "first", "last", "percentile", "count_change")

  /** Build the aggregation column for `func` over `field`.
    * `ts` orders first/last (ref: stats/c_agg.erl:19-26 keeps timestamps).
    * `approx = true` swaps the two sort/set-heavy functions for their
    * sketch forms (t-digest percentile_approx, HyperLogLog++
    * approx_count_distinct) — the 100 TB knob (docs/SCALE.md): exact
    * median/count_distinct hold full per-group state; the sketches are
    * fixed-size and partial-aggregatable.
    */
  def column(func: String, field: Column, ts: Column = col("ts"),
      approx: Boolean = false): Column =
    func match {
      case "median" if approx         => percentile_approx(field, lit(0.5), lit(10000))
      case "count_distinct" if approx => approx_count_distinct(field)
      case "count"          => count(field)
      case "sum"            => sum(field)
      case "min"            => min(field)
      case "max"            => max(field)
      case "avg" | "mean"   => avg(field)
      case "range"          => max(field) - min(field)
      case "geometric_mean" => exp(avg(log(field)))
      case "median"         => median(field)
      case "variance"       => var_samp(field)
      case "stddev"         => stddev_samp(field)
      case "count_distinct" => count_distinct(field)
      case "skew"           => skewness(field)
      case "kurtosis"       => kurtosis(field)
      case "first"          => min_by(field, ts)
      case "last"           => max_by(field, ts)
      case other => throw new IllegalArgumentException(s"unknown agg function: $other")
    }

  /** Exact percentile at `p` in [0,1], REFERENCE-exact
    * (esp_percentile.erl:62-72, pinned by its eunit basic_perc_test):
    * rank R = p·n over the 1-based sorted group, linearly interpolating
    * between positions trunc(R) and trunc(R)+1. This is NOT SQL
    * percentile_cont, whose rank is p·(n−1) — at p=0.7 over
    * [12.2,12.4,16.8,23,23.9,25.9] the reference yields 23.18 where
    * percentile_cont yields 23.45. Divergence guard: for R < 1 the
    * reference's lists:nth(0) crashes outright; a SQL aggregate cannot
    * crash per-group, so we return the minimum (the p=0 rule). Exact by
    * default for oracle parity; use [[approxPercentile]] at extreme
    * scale.
    */
  def percentile(field: Column, p: Double): Column =
    percentileFromSorted(sort_array(collect_list(field)), p)

  /** Multi-quantile form: ONE sorted-list aggregate serves every
    * requested percentile (Catalyst dedups the identical collect_list
    * aggregates), vs one full group-sort per scalar call — the
    * difference between one and N shuffles'-worth of sort work per group
    * at scale. Returns an array; extract with `element_at` in a
    * post-projection.
    */
  def percentiles(field: Column, ps: Seq[Double]): Column = {
    val s = sort_array(collect_list(field))
    array(ps.map(percentileFromSorted(s, _)): _*)
  }

  private def percentileFromSorted(s: Column, p: Double): Column = {
    val n = size(s)
    val r = lit(p) * n
    val f = floor(r).cast("int")
    val interp = element_at(s, f) +
      (element_at(s, least(f + 1, n)) - element_at(s, f)) * (r - f)
    when(n === 0, lit(0.0))                        // empty → 0
      .otherwise(when(lit(p) <= 0.0 || f < 1, element_at(s, 1)) // p=0 rule + nth(0) guard
        .otherwise(when(lit(p) >= 1.0, element_at(s, n))        // p=1 → max
          .otherwise(interp)))
  }

  def approxPercentile(field: Column, p: Double): Column =
    percentile_approx(field, lit(p), lit(10000))

  /** One ts-ordered `(ts, value)` struct list per group — the shared input
    * of the `elapsed` and `difference` stats nodes, collected ONCE (the
    * r2 bench's slowest query was two independent collect_list+sort passes
    * over the same group). Per-group list memory is inherent to the
    * stats-node batch semantics; paying it twice was not.
    */
  def sortedTsValues(value: Column, tsMs: Column): Column =
    array_sort(collect_list(struct(tsMs.as("_t"), value.as("_v"))))

  /** `elapsed` stats node — deltas between consecutive timestamps of the
    * sorted list from [[sortedTsValues]] (ref: stats/esp_elapsed.erl:14),
    * emitted as a comma-joined string (canonical scalar form for the
    * oracle hash). `l` must be a materialized column, not an inline agg —
    * Spark HOFs are interpreted without CSE.
    */
  def elapsedFrom(l: Column): Column =
    when(size(l) >= 2,
      array_join(transform(sequence(lit(2), size(l)),
        i => (element_at(l, i).getField("_t") - element_at(l, i - 1).getField("_t"))
          .cast("string")), ","))
      .otherwise(lit(""))

  /** `difference` stats node — pairwise consecutive differences of the
    * ts-ordered values (ref: stats/esp_stats_difference.erl:14-27),
    * scaled to milli-units so the joined string is engine-stable.
    */
  def differenceFrom(l: Column): Column =
    when(size(l) >= 2,
      array_join(transform(sequence(lit(2), size(l)),
        i => floor((element_at(l, i).getField("_v") - element_at(l, i - 1).getField("_v")) * 1000)
          .cast("long").cast("string")), ","))
      .otherwise(lit(""))

  /** Pre-pass for `count_change` (ref: esp_aggregate.erl:193-206): marks rows
    * whose value differs from the previous row (ordered by `order` within
    * `keys`); then `sum` of the marker inside any window/group gives the
    * change count, including across-window continuity (keep_tail semantics,
    * esp_aggregate.erl:41,106).
    */
  def countChangePrep(
      df: DataFrame,
      field: Column,
      order: Seq[Column],
      keys: Seq[Column],
      as: String): DataFrame = {
    // keyless = the reference's single-stream form (single ordered task —
    // what the single-node reference pays); group_by is the scale switch
    val w =
      if (keys.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(keys: _*).orderBy(order: _*)
    val prev = lag(field, 1).over(w)
    df.withColumn(
      as,
      when(prev.isNotNull && prev =!= field, lit(1L)).otherwise(lit(0L)))
  }
}

/** The `aggregate` operator: parallel `fields`/`functions`/`as` lists over a
  * grouped frame (ref: esp_aggregate.erl options :46-58).
  */
object Aggregate {
  final case class Spec(field: String, func: String, as: String)

  def apply(df: DataFrame, keys: Seq[Column], specs: Seq[Spec], ts: String = "ts"): DataFrame = {
    val aggs = specs.map(s => AggFunctions.column(s.func, col(s.field), col(ts)).as(s.as))
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
