package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-combination operators (SURVEY §2.3) — faxe's joins are time-based
  * (as-of / nearest-ts) merges, not equi-joins.
  *
  * Scale design:
  *  - [[asOfLatest]] uses the union + running-last formulation: ONE shuffle
  *    on the stream key, one sorted pass — no range-join row explosion, no
  *    per-key state blowup. This is the 100 TB-safe as-of join.
  *  - [[toleranceJoin]] buckets time by the tolerance and joins on
  *    (key, bucket±1): candidate pairs are bounded by bucket population,
  *    never the cross product.
  */
object Joins {

  /** As-of enrich: each left row gains the latest right row whose ts ≤ left
    * ts (within `toleranceMs` if given), per `keys` (refs: esp_join.erl:93,
    * 199-206 nearest_ts; esp_combine.erl:55-145 latest-value enrich —
    * combine == asOfLatest with no tolerance).
    *
    * `valueCols` are the right-side columns carried over, renamed with
    * `prefix` (esp_join prefix option, esp_join.erl:182-196).
    */
  def asOfLatest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsMs: String,
      rightTsMs: String,
      valueCols: Seq[String],
      prefix: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val lCols = left.columns.toSeq
    val rStruct = struct(col(rightTsMs).as("_rts") +: valueCols.map(col): _*)

    val lSide = left
      .withColumn("_ts", col(leftTsMs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(right.select(rStruct).schema.head.dataType))
    val rSide = right
      .select(keyCols :+ col(rightTsMs).as("_ts") :+ rStruct.as("_r"): _*)
      .withColumn("_side", lit(0))
    val aligned = lSide.select(
      (keys.map(col) :+ col("_ts") :+ col("_side") :+ col("_r")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    val rAligned = lCols.filterNot(keys.contains).foldLeft(rSide) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(aligned.columns.map(col): _*)

    // right rows sort before left rows at equal ts (side 0 < 1): ties are
    // joinable, matching DuckDB ASOF's inclusive `>=`.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = aligned.unionByName(rAligned)
      .withColumn("_last_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val withinTol = toleranceMs match {
      case Some(tol) =>
        when(col("_last_r").isNotNull &&
          col("_ts") - col("_last_r.._rts") <= tol, col("_last_r"))
      case None => col("_last_r")
    }
    val out = joined.withColumn("_match", withinTol)
    valueCols.foldLeft(
      out.withColumn(s"${prefix}ts_ms", col("_match").getField("_rts"))
    )((d, c) => d.withColumn(s"$prefix$c", col("_match").getField(c)))
      .drop("_ts", "_side", "_r", "_last_r", "_match")
  }

  /** `join` with tolerance — all pairs within |lts - rts| ≤ toleranceMs on
    * the same key (ref: esp_join.erl:50-248, join2 multiplicity
    * esp_join2.erl:108-180). Time-bucketed to keep candidates local.
    */
  def toleranceJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsMs: String,
      rightTsMs: String,
      toleranceMs: Long,
      rightPrefix: String): DataFrame = {
    val rRenamed = right.columns.foldLeft(right) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val lB = left.withColumn("_lb", expr(s"$leftTsMs div ${toleranceMs}"))
    val rB = rRenamed.withColumn("_rb", expr(s"$rightPrefix$rightTsMs div ${toleranceMs}"))
    val lExp = lB.withColumn("_jb", explode(array(col("_lb") - 1, col("_lb"), col("_lb") + 1)))
    lExp
      .join(rB, keys.map(col) :+ (col("_jb") === col("_rb")) reduce (_.asInstanceOf[Column] && _) match {
        case c: Column => c
      }, "inner")
      .filter(abs(col(leftTsMs) - col(s"$rightPrefix$rightTsMs")) <= toleranceMs)
      .drop("_lb", "_rb", "_jb")
  }

  /** `collect` latest-per-key materialized view, batch analog
    * (ref: esp_collect.erl:63-637 keyed upsert cache).
    */
  def collectLatest(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** `collect_fields` — latest value of `value` per (key, field discriminant)
    * pivoted to one row per key (ref: esp_collect_fields.erl:33-102).
    */
  def collectFields(
      df: DataFrame,
      key: Column,
      disc: String,
      discValues: Seq[String],
      value: String,
      orderMs: String): DataFrame =
    df.groupBy(key)
      .pivot(disc, discValues)
      .agg(expr(s"max_by($value, $orderMs)"))

  /** `collect_unique` — latest row per (key, discriminant) as rows
    * (ref: esp_collect_unique.erl:51-122).
    */
  def collectUnique(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    collectLatest(df, keys, order)
}
