package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-combination operators (SURVEY §2.3) — faxe's joins are time-based
  * (as-of / nearest-ts) merges, not equi-joins.
  *
  * Scale design:
  *  - [[asOfLatest]] / [[asOfNearest]] use the union + running-last
  *    formulation: ONE shuffle on the stream key, one sorted pass — no
  *    range-join row explosion, no per-key state blowup. This is the
  *    100 TB-safe as-of join.
  *  - [[toleranceJoin]] buckets time by the tolerance and joins on
  *    (key, bucket±1): candidate pairs are bounded by bucket population,
  *    never the cross product.
  */
object Joins {

  /** Union-align scaffolding shared by the as-of joins: left rows keep their
    * payload; right rows contribute a struct `_r` = (_rts, valueCols…).
    * Output columns: keys, _ts, _side (right=0 < left=1 so equal-ts right
    * rows sort first and are backward-joinable, matching DuckDB ASOF `>=`),
    * _r, then the non-key left payload.
    */
  private def aligned(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsMs: String,
      rightTsMs: String,
      valueCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val lCols = left.columns.toSeq
    // value fields resolve through Paths.ref: deep paths work, and under
    // the DFS lenient scope a field the right stream does not carry
    // becomes NULL (faxe undefined-field semantics) instead of failing
    val rStruct = struct(col(rightTsMs).as("_rts") +:
      valueCols.map(c => graft.core.Paths.ref(c).as(c)): _*)
    val rType = right.select(rStruct).schema.head.dataType

    val lSide = left
      .withColumn("_ts", col(leftTsMs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rType))
    val rSide = right
      .select(keyCols :+ col(rightTsMs).as("_ts") :+ rStruct.as("_r"): _*)
      .withColumn("_side", lit(0))
    val lAligned = lSide.select(
      (keys.map(col) :+ col("_ts") :+ col("_side") :+ col("_r")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    val rAligned = lCols.filterNot(keys.contains).foldLeft(rSide) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lAligned.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
    lAligned.unionByName(rAligned)
  }

  /** Project the matched right-side struct out to prefixed columns; the
    * matched right timestamp lands in `prefix + rightTsMs`.
    */
  private def emit(
      joined: DataFrame,
      matchCol: Column,
      valueCols: Seq[String],
      prefix: String,
      rightTsMs: String): DataFrame =
    valueCols.foldLeft(
      joined.withColumn(s"$prefix$rightTsMs", matchCol.getField("_rts"))
    )((d, c) => d.withColumn(s"$prefix$c", matchCol.getField(c)))
      .drop("_ts", "_side", "_r", "_back", "_fwd", "_match")

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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = aligned(left, right, keys, leftTsMs, rightTsMs, valueCols)
      .withColumn("_back", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val withinTol = toleranceMs match {
      case Some(tol) =>
        when(col("_back").isNotNull &&
          col("_ts") - col("_back").getField("_rts") <= tol, col("_back"))
      case None => col("_back")
    }
    emit(joined.withColumn("_match", withinTol), col("_match"), valueCols,
      prefix, rightTsMs)
  }

  /** Bidirectional nearest-ts enrich (ref: esp_join.erl:197-206 — the join
    * picks the buffered row with minimal |Δts|; ties break to the earlier
    * row). Same single-shuffle union formulation: a backward running-last
    * and a forward running-first over one sort, then pick the nearer side.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsMs: String,
      rightTsMs: String,
      valueCols: Seq[String],
      prefix: String,
      toleranceMs: Option[Long] = None): DataFrame = {
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
    val wBack = base.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = base.rowsBetween(0, Window.unboundedFollowing)
    val joined = aligned(left, right, keys, leftTsMs, rightTsMs, valueCols)
      .withColumn("_back", last(col("_r"), ignoreNulls = true).over(wBack))
      // equal-ts right rows sort before the left row, so the forward frame
      // holds strictly-later rights only — the Δ=0 case lives in _back and
      // wins every tie, giving the earlier-on-tie rule.
      .withColumn("_fwd", first(col("_r"), ignoreNulls = true).over(wFwd))
      .filter(col("_side") === 1)
    val dBack = col("_ts") - col("_back").getField("_rts")
    val dFwd = col("_fwd").getField("_rts") - col("_ts")
    val nearer = when(col("_back").isNull, col("_fwd"))
      .when(col("_fwd").isNull, col("_back"))
      .when(dFwd < dBack, col("_fwd"))
      .otherwise(col("_back"))
    val withinTol = toleranceMs match {
      case Some(tol) =>
        when(nearer.isNotNull &&
          abs(col("_ts") - nearer.getField("_rts")) <= tol, nearer)
      case None => nearer
    }
    emit(joined.withColumn("_match", withinTol), col("_match"), valueCols,
      prefix, rightTsMs)
  }

  /** `join` with tolerance — all pairs within |lts - rts| ≤ toleranceMs on
    * the same key (ref: esp_join.erl:50-248, join2 multiplicity
    * esp_join2.erl:108-180). Time-bucketed to keep candidates local: a row
    * only meets rows in its own and adjacent buckets, so the join condition
    * is a pure equi-join on (keys…, bucket) — shuffle-partitionable, no
    * range-join explosion.
    */
  def toleranceJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsMs: String,
      rightTsMs: String,
      toleranceMs: Long,
      rightPrefix: String): DataFrame = {
    // rename ALL right columns (keys included) so every join-condition side
    // is unambiguous; drop the duplicate keys after the join.
    val rRenamed = right.columns.foldLeft(right) { (d, c) =>
      d.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val lB = left.withColumn("_lb", expr(s"$leftTsMs div $toleranceMs"))
    val rB = rRenamed.withColumn("_rb",
      expr(s"$rightPrefix$rightTsMs div $toleranceMs"))
    val lExp = lB.withColumn("_jb",
      explode(array(col("_lb") - 1, col("_lb"), col("_lb") + 1)))
    val cond = (keys.map(k => col(k) === col(s"$rightPrefix$k")) :+
      (col("_jb") === col("_rb"))).reduce(_ && _)
    lExp.join(rB, cond, "inner")
      .filter(abs(col(leftTsMs) - col(s"$rightPrefix$rightTsMs")) <= toleranceMs)
      .drop("_lb", "_rb", "_jb")
      .drop(keys.map(k => s"$rightPrefix$k"): _*)
  }

  /** faxe `merge` output mode for joined columns (ref: esp_join.erl
    * merge/2:232-241 — numbers add, strings concatenate, maps deep-merge
    * with later-value-wins leaves :244-248). Type dispatch happens at
    * plan time from the column's dataType; the reference's nested-map
    * deep merge becomes a recursive field-wise struct merge.
    */
  def mergeValues(df: DataFrame, a: String, b: String, as: String): DataFrame = {
    import org.apache.spark.sql.types._
    def deep(ac: Column, bc: Column, at: StructType, bt: StructType): Column = {
      val bOnly = bt.fields.filterNot(f => at.fieldNames.contains(f.name))
      struct((at.fields.toIndexedSeq.map { f =>
        (bt.fields.find(_.name == f.name) match {
          case Some(bf) => (f.dataType, bf.dataType) match {
            case (an: StructType, bn: StructType) =>
              deep(ac.getField(f.name), bc.getField(f.name), an, bn)
            // merge_fun leaves: the later (right) value wins when present
            case _ => coalesce(bc.getField(f.name), ac.getField(f.name))
          }
          case None => ac.getField(f.name)
        }).as(f.name)
      } ++ bOnly.toIndexedSeq.map(f => bc.getField(f.name).as(f.name))): _*)
    }
    (df.schema(a).dataType, df.schema(b).dataType) match {
      case (at: StructType, bt: StructType) =>
        // union-typed output: leaf-wise null handling is already inside
        // deep(), and the merged struct's type differs from both inputs
        df.withColumn(as, deep(col(a), col(b), at, bt))
      case (t, _) =>
        val merged = t match {
          case _: NumericType => col(a) + col(b)
          case _: StringType => concat(col(a), col(b))
          case _: MapType => map_concat(col(a), col(b))
          case other => throw new IllegalArgumentException(
            s"cannot merge columns of type $other")
        }
        df.withColumn(as, coalesce(merged, col(a), col(b)))
    }
  }

  /** `collect` latest-per-key materialized view, batch analog
    * (ref: esp_collect.erl:63-637 keyed upsert cache).
    */
  def collectLatest(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** `collect` with add/remove semantics, batch analog (ref:
    * esp_collect.erl:63-637 keyed upsert cache): a key's entry is its
    * latest add-row AFTER the key's latest remove-row — rows are admitted
    * by `add`, the key is evicted by `remove`, re-adds after eviction
    * resurrect it. Two keyed aggregations, no per-row state.
    */
  def collectUpsert(
      df: DataFrame,
      keys: Seq[String],
      orderMs: String,
      add: Column,
      remove: Column): DataFrame = {
    // keys may be deep paths (collect.dfs 'data.code.id'): materialize
    // them as flat join columns, restore the original shape at the end
    val ck = keys.indices.map(i => s"_ck$i")
    val keyed = keys.zip(ck).foldLeft(df) { case (d, (k, c)) =>
      d.withColumn(c, graft.core.Paths.ref(k))
    }
    val rm = keyed.filter(remove).groupBy(ck.map(col): _*)
      .agg(max(col(orderMs)).as("_rm_ms"))
    val live = keyed.filter(add)
      .join(rm, ck, "left")
      .filter(col("_rm_ms").isNull || col(orderMs) > col("_rm_ms"))
      .drop("_rm_ms")
    collectLatest(live, ck.map(col), Seq(col(orderMs)))
      .drop(ck: _*)
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
