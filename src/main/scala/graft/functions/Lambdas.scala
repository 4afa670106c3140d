package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The DFS lambda scalar-function surface (SURVEY §2.8) as Catalyst
  * `Column` builders — faxe's faxe_lambda_lib/dfs_std_lib whitelist
  * (refs: test/faxe_lambdalib_tests.erl:20-31, test/lambda_tests.erl:72-80,
  * dfs scripts under dfs/ — to_iso8601/time_align in dfs/test/time_align.dfs,
  * map_get in dfs/debug/map_get.dfs, if/undefined in dfs/test/collect.dfs).
  *
  * No UDFs: every function is a built-in composition, so lambdas stay in
  * whole-stage codegen and translate 1:1 into the DFS front-end.
  */
object Lambdas {

  // ---- type conversions (dfs_std_lib:int truncates toward zero) --------
  def toInt(x: Column): Column = x.cast("long")
  def toFloat(x: Column): Column = x.cast("double")
  def toStringCol(x: Column): Column = x.cast("string")
  def toBool(x: Column): Column = x.cast("boolean")

  // ---- basics -----------------------------------------------------------
  /** faxe_lambda_lib:round_float/2 (125.455679, 3) -> 125.456. */
  def roundFloat(x: Column, digits: Int): Column = round(x, digits)
  def ifThen(cond: Column, a: Column, b: Column): Column =
    when(cond, a).otherwise(b)
  /** undefined("f") — field absent/null (flowdata undefined semantics). */
  def undefined(x: Column): Column = x.isNull
  def maxOf(xs: Column*): Column = greatest(xs: _*)
  def minOf(xs: Column*): Column = least(xs: _*)
  def absOf(x: Column): Column = abs(x)
  def member(x: Column, xs: Seq[Column]): Column =
    xs.map(_ === x).reduce(_ || _)

  /** map_get with faxe's <<"undefined">>-style miss default. */
  def mapGet(m: Column, key: Column, default: Column): Column =
    coalesce(element_at(m, key), default)

  // ---- strings ----------------------------------------------------------
  def strConcat(xs: Column*): Column = concat(xs: _*)
  def strReplace(s: Column, from: String, to: String): Column =
    regexp_replace(s, java.util.regex.Pattern.quote(from), to)
  /** Dynamic-replacement form (`str_replace(s, 'lit', expr)` —
    * dfs/test/group_by.dfs:29). Caveat: `$` in the computed replacement
    * is regexp-group syntax, as in the underlying regexp_replace.
    */
  def strReplaceDyn(s: Column, from: String, to: Column): Column =
    regexp_replace(s, lit(java.util.regex.Pattern.quote(from)), to)
  def strEndsWith(s: Column, suffix: Column): Column = s.endsWith(suffix)
  def strStartsWith(s: Column, prefix: Column): Column = s.startsWith(prefix)
  /** 1-based slice, matching Erlang string:slice+1 conventions. */
  // Erlang string:slice is 0-BASED (the generic-table str_slice path
  // already is) — this literal-arg fast path was substring(s, start,
  // len), silently 1-based for any nonzero start (start 0 masked it:
  // Spark treats substring pos 0 as 1). Caught by the sentence-fixture
  // round trip, round 16.
  def strSlice(s: Column, start: Int, len: Int): Column =
    substring(s, start + 1, len)
  def strReverse(s: Column): Column = reverse(s)
  def strLength(s: Column): Column = length(s)
  def strDowncase(s: Column): Column = lower(s)
  def strUpcase(s: Column): Column = upper(s)
  def strTrim(s: Column): Column = trim(s)

  // ---- time (epoch-ms based, faxe_time semantics) -----------------------
  /** time_align: floor the ms timestamp to a duration boundary — pure
    * integer arithmetic (ms - ms % d), no double-division rounding.
    */
  def timeAlign(ms: Column, durationMs: Long): Column =
    ms.cast("long") - pmod(ms.cast("long"), lit(durationMs))
  /** to_iso8601 of an epoch-ms value (UTC, millisecond precision). */
  def toIso8601(ms: Column): Column =
    date_format(timestamp_millis(ms.cast("long")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
  def toDateString(ms: Column): Column =
    date_format(timestamp_millis(ms.cast("long")), "yyyy-MM-dd")
  /** Calendar component extractors on epoch-ms. */
  def second(ms: Column): Column = second_of(ms)
  private def second_of(ms: Column): Column =
    org.apache.spark.sql.functions.second(timestamp_millis(ms.cast("long")))
  def minuteOf(ms: Column): Column = minute(timestamp_millis(ms.cast("long")))
  def hourOf(ms: Column): Column = hour(timestamp_millis(ms.cast("long")))
  def dayOfWeek(ms: Column): Column = dayofweek(timestamp_millis(ms.cast("long")))

  // ---- math -------------------------------------------------------------
  def sqrtOf(x: Column): Column = sqrt(x)
  def powOf(x: Column, y: Column): Column = pow(x, y)
  def floorOf(x: Column): Column = floor(x)
  def ceilOf(x: Column): Column = ceil(x)
  def modOf(x: Column, y: Column): Column = pmod(x, y)
  def lnOf(x: Column): Column = log(x)

  // ---- non-deterministic (excluded from oracle queries by design) -------
  def now(): Column = unix_millis(current_timestamp())
  def randomInt(n: Int): Column = (rand() * n).cast("long") + 1
  def randomReal(): Column = rand()
  /** random_latin_string(n): n random lowercase letters per row. */
  def randomLatinString(n: Int): Column =
    array_join(
      transform(sequence(lit(1), lit(n)),
        _ => element_at(split(lit("abcdefghijklmnopqrstuvwxyz"), ""),
          (rand() * 26).cast("int") + 1)), "")

  /** Registry for the DFS front-end: name -> arity-checked builder.
    * Literal-argument forms (replace/slice/align) take their literals from
    * the translated argument columns at plan time.
    */
  val registry: Map[String, Seq[Column] => Column] = Map(
    "int" -> { a => toInt(a.head) },
    "float" -> { a => toFloat(a.head) },
    "string" -> { a => toStringCol(a.head) },
    "bool" -> { a => toBool(a.head) },
    "abs" -> { a => absOf(a.head) },
    "max" -> { a => maxOf(a: _*) },
    "min" -> { a => minOf(a: _*) },
    "undefined" -> { a => undefined(a.head) },
    "if" -> { a => ifThen(a(0), a(1), a(2)) },
    "str_concat" -> { a => strConcat(a: _*) },
    "str_ends_with" -> { a => strEndsWith(a(0), a(1)) },
    "str_starts_with" -> { a => strStartsWith(a(0), a(1)) },
    "str_reverse" -> { a => strReverse(a.head) },
    "str_length" -> { a => strLength(a.head) },
    // str_slice(s, start[, len]) — Erlang string:slice, 0-based start,
    // to-end when len is omitted (dev/path_split.dfs)
    "str_slice" -> { a =>
      if (a.size >= 3) a(0).substr(a(1).cast("int") + 1, a(2).cast("int"))
      else a(0).substr(a(1).cast("int") + 1, length(a(0)))
    },
    "str_downcase" -> { a => strDowncase(a.head) },
    "str_upcase" -> { a => strUpcase(a.head) },
    "str_trim" -> { a => strTrim(a.head) },
    "to_iso8601" -> { a => toIso8601(a.head) },
    "to_date_string" -> { a => toDateString(a.head) },
    "second" -> { a => second_of(a.head) },
    "minute" -> { a => minuteOf(a.head) },
    "hour" -> { a => hourOf(a.head) },
    "day_of_week" -> { a => dayOfWeek(a.head) },
    "sqrt" -> { a => sqrtOf(a.head) },
    "pow" -> { a => powOf(a(0), a(1)) },
    "floor" -> { a => floorOf(a.head) },
    "ceil" -> { a => ceilOf(a.head) },
    "mod" -> { a => modOf(a(0), a(1)) },
    // map_get(Key, Map[, Default]) — faxe arg order
    // (faxe_lambdalib_tests.erl:29-31); a miss yields the default, or NULL
    // (the columnar analog of faxe's <<"undefined">>).
    "map_get" -> { a =>
      if (a.length >= 3) mapGet(a(1), a(0), a(2))
      else element_at(a(1), a(0))
    },
    "ln" -> { a => lnOf(a.head) },
    "round" -> { a => round(a.head, 0) },
    "now" -> { _ => now() },
    "random" -> { _ => randomReal() },
    // vector lambdas (graft LLM-pipeline extension, not in the reference
    // lambdalib): codegen'd folds over Array[Float] embedding columns —
    // the same FloatDot/FloatSqDist path the similarity operators use
    "vec_dot" -> { a =>
      VectorExpressions.floatDot(asFloatArray(a(0)), asFloatArray(a(1))) },
    "vec_sq_dist" -> { a =>
      VectorExpressions.floatSqDist(asFloatArray(a(0)), asFloatArray(a(1))) },
    "vec_norm" -> { a =>
      sqrt(VectorExpressions.floatDot(asFloatArray(a.head), asFloatArray(a.head))) },
    "vec_cosine" -> { a =>
      val (x, y) = (asFloatArray(a(0)), asFloatArray(a(1)))
      VectorExpressions.floatDot(x, y) /
        (sqrt(VectorExpressions.floatDot(x, x)) *
          sqrt(VectorExpressions.floatDot(y, y)))
    }
  )

  /** DFS literals arrive as int/double arrays; embeddings are FLOAT
    * arrays. Coerce so both meet FloatDot's input type.
    */
  private def asFloatArray(c: Column): Column = c.cast("array<float>")
}
