package graft.operators.restructure

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Restructuring operators (SURVEY §2.2) — the UNNEST family.
  *
  * All are Catalyst generators/projections: explode parallelizes per input
  * partition with no shuffle; count-batching shuffles once on its keys.
  */
object Restructure {

  /** `array_explode` — N parallel array fields → one row per index
    * (ref: esp_array_explode.erl:28-84). Output `idx` is 1-based (jsn
    * semantics); synthetic timestamp = base + (idx-1)·offset.
    */
  def arrayExplode(
      df: DataFrame,
      arrays: Seq[String],
      keep: Seq[String],
      idxAs: String = "idx",
      tsMsCol: Option[String] = None,
      tsOffsetMs: Long = 1000L): DataFrame = {
    val zipped = if (arrays.size == 1) col(arrays.head) else arrays_zip(arrays.map(col): _*)
    val base = df.select((keep.map(col) :+ posexplode(zipped).as(Seq("_pos", "_val"))): _*)
    val withIdx = base.withColumn(idxAs, col("_pos") + 1)
    val withVals =
      if (arrays.size == 1) withIdx.withColumn(arrays.head, col("_val"))
      else arrays.foldLeft(withIdx)((d, a) => d.withColumn(a, col("_val").getField(a)))
    val withTs = tsMsCol match {
      case Some(ts) => withVals.withColumn(ts, col(ts) + col("_pos") * tsOffsetMs)
      case None     => withVals
    }
    withTs.drop("_pos", "_val")
  }

  /** `fields_to_array` — pivot listed fields into an array of
    * {name, value} structs (ref: esp_fields_to_array.erl:33-70).
    */
  def fieldsToArray(df: DataFrame, fields: Seq[String], as: String): DataFrame =
    df.withColumn(
      as,
      // names carry *-escapes back-replaced to dots, values resolve as
      // paths (esp_fields_to_array.erl:60; dfs/test/http_post.dfs flat
      // 'SHx*OpHrRet' keys)
      array(fields.map(f => struct(lit(f.replace('*', '.')).as("name"),
        graft.core.Paths.ref(f).as("value"))): _*))

  /** Relational (exploded) form of fields_to_array: one row per field. */
  def fieldsToRows(df: DataFrame, fields: Seq[String], keep: Seq[String]): DataFrame =
    fieldsToArray(df, fields, "_arr")
      .select((keep.map(col) :+ explode(col("_arr")).as("_kv")): _*)
      .select((keep.map(col) :+ col("_kv.name").as("name")) :+ col("_kv.value").as("value"): _*)

  /** `path_split` — one row per key of a map column, value flattened
    * (ref: esp_path_split.erl:22-57).
    */
  def pathSplit(df: DataFrame, mapCol: Column, keep: Seq[String]): DataFrame =
    df.select((keep.map(col) :+ explode(mapCol).as(Seq("key", "value"))): _*)

  /** `extract_path` — deep paths to flat fields with defaults
    * (ref: esp_extract_path.erl:24-53).
    */
  def extractPath(df: DataFrame, paths: Seq[(Column, Column, String)]): DataFrame =
    df.select(paths.map { case (c, default, as) => coalesce(c, default).as(as) }: _*)

  /** `batch` (count mode) — assign a 0-based batch id every `n` rows in
    * `order` within `keys` (ref: esp_batch.erl:30-119; streaming
    * flush-timeout form: graft.streaming.Streaming.countBatch). The keyless form uses
    * the two-pass partition-offset numbering — no global single-task sort.
    */
  def batchify(
      df: DataFrame,
      n: Int,
      order: Seq[Column],
      keys: Seq[Column],
      as: String = "batch_id"): DataFrame = {
    val numbered =
      if (keys.isEmpty)
        graft.operators.stateless.GlobalOrder.rowNumber(df, order, "_rn")
      else {
        val w = Window.partitionBy(keys: _*).orderBy(order: _*)
        df.withColumn("_rn", row_number().over(w))
      }
    numbered.withColumn(as, ((col("_rn") - 1) / n).cast("long")).drop("_rn")
  }

  /** `unbatch` — inverse of a collected batch: explode an array-of-structs
    * column back to rows (ref: esp_unbatch.erl:26-50).
    */
  def unbatch(df: DataFrame, batchCol: Column, keep: Seq[String]): DataFrame =
    df.select((keep.map(col) :+ explode(batchCol).as("_p")): _*)
      .select(col("_p.*") +: keep.map(col): _*)
}
