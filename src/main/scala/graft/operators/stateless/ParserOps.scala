package graft.operators.stateless

import graft.operators.state.StateOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `parser` — pluggable payload → fields conversion (ref:
  * esp_parser.erl:29-93: binary_msg_parser:convert + crc32 `changed`
  * dedup). The Spark-native format is from_json with a declared schema
  * (SURVEY §7.4: parser outputs need declared schemas); the `changed`
  * mode drops rows whose raw payload digest equals the previous row's —
  * the crc32 dedup as a keyed lag, not per-process state.
  */
object ParserOps {

  /** Parse a JSON string column into fields of `ddl` (e.g. "k INT, v
    * STRING"), each field flattened next to the original columns.
    */
  def parseJson(df: DataFrame, field: Column, ddl: String, as: String): DataFrame =
    df.withColumn(as, from_json(field, ddl, Map.empty[String, String]))

  /** Parse + flatten: struct fields land at top level. */
  def parseJsonFlat(df: DataFrame, field: Column, ddl: String): DataFrame =
    parseJson(df, field, ddl, "_parsed").select(col("*"), col("_parsed.*"))
      .drop("_parsed")

  /** `changed` option: pass only rows whose payload differs from the
    * previous row's (digest compare, per key in event order).
    */
  def changedOnly(df: DataFrame, payload: Column,
      keys: Seq[Column], order: Seq[Column]): DataFrame =
    StateOps.changeDetect(df, Seq(md5(payload.cast("string"))), keys, order)
}
