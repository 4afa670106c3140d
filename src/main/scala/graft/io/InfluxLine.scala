package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Influx line-protocol encoding as pure Column logic (ref:
  * lib/influx_line.erl; used by esp_influx_out.erl:203-209 as
  * `{Measurement, Fields, Tags, Ts}` → `m[,tag=v…] f=v[,f=v…] ts\n`).
  *
  * Value encoding mirrors encode_value (influx_line.erl:229-257):
  * integers bare (suffixed `i` when encode_integer), floats compact with
  * ≤12 decimals, strings raw (the reference does NOT escape spaces or
  * commas — parity means neither do we), booleans `t`/`f`. Null fields
  * are dropped per row, the relational analog of filter_fields
  * (esp_influx_out.erl:212-214 dropping non-scalar values).
  *
  * Everything codegens: the formatter is a single projection, so a sink
  * batch encodes in one whole-stage pass with no per-row UDF.
  */
object InfluxLine {

  /** Compact float form: fixed 12 decimals, trailing zeros trimmed, at
    * least one decimal digit kept — Erlang's
    * `float_to_list(F, [compact, {decimals, 12}])`.
    */
  private def compactFloat(c: Column): Column = {
    val trimmed = regexp_replace(
      format_string("%.12f", c.cast("double")), "0+$", "")
    when(trimmed.endsWith("."), concat(trimmed, lit("0"))).otherwise(trimmed)
  }

  def encodeValue(c: Column, dt: DataType, encodeInteger: Boolean): Column =
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val s = c.cast("string")
        if (encodeInteger) concat(s, lit("i")) else s
      case FloatType | DoubleType | _: DecimalType => compactFloat(c)
      case BooleanType => when(c, lit("t")).otherwise(lit("f"))
      case _ => c.cast("string")
    }

  /** One line-protocol string per row (trailing `\n` included, so a
    * concatenated batch is byte-identical to the reference's iolist).
    * `ts = None` omits the timestamp clause (the reference's
    * no-timestamp tuple forms).
    */
  def encode(df: DataFrame, measurement: Column, fields: Seq[String],
      tags: Seq[String] = Nil, ts: Option[Column] = None,
      encodeInteger: Boolean = false): Column = {
    require(fields.nonEmpty, "influx line needs at least one field")
    def dt(n: String) = df.schema(n).dataType
    val fieldsPart = concat_ws(",", fields.map(f =>
      when(col(f).isNotNull,
        concat(lit(f + "="), encodeValue(col(f), dt(f), encodeInteger)))): _*)
    val tagsPart =
      if (tags.isEmpty) lit("")
      else concat(tags.map(t => coalesce(
        when(col(t).isNotNull,
          concat(lit("," + t + "="), col(t).cast("string"))),
        lit(""))): _*)
    // a NULL timestamp value must degrade to the reference's
    // no-timestamp line form, not null out the whole concat
    val tsPart = ts.map(c => coalesce(
        concat(lit(" "), c.cast("long").cast("string")), lit("")))
      .getOrElse(lit(""))
    concat(measurement, tagsPart, lit(" "), fieldsPart, tsPart, lit("\n"))
  }
}
