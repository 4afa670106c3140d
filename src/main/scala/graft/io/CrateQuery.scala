package graft.io

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `crate_query` periodic-SQL node's time-bucket rewrite (ref:
  * esp_crate_query.erl:144-171 `build_query`, eunit-pinned at :216-225):
  * the user's SELECT is rewritten to prepend an epoch-bucket key, append
  * a poll-window range predicate, and GROUP BY the bucket (+ any
  * `.group_by` fields), ORDER BY bucket DESC.
  *
  * Two dialects:
  *  - [[buildQuery]] — the reference's exact output string (CrateDB /
  *    PostgreSQL dialect, `$1`/`$2` bind params). Pure string logic; this
  *    is what a real JDBC deployment binding would prepare.
  *  - [[sparkQuery]] — the same shape in Spark SQL over the corpus
  *    tables, with two deliberate changes: integral `div` arithmetic on
  *    ms epochs (no double round-trip) and HALF-OPEN windows. The
  *    reference issues `>= $1 AND <= $2` for consecutive marks
  *    [mark-period, mark], so a row exactly at a mark is read by two
  *    successive polls; the poll planner's `[from, to)` windows partition
  *    the timeline instead, which is what makes N polls + bucket-agg
  *    reproduce one global bucket query exactly.
  */
object CrateQuery {

  /** `faxe_util:check_select_statement/1` — the `.query` option
    * validator of crate_query / oracle_query (esp_crate_query.erl:67,
    * esp_oracle_query.erl:59). faxe_util itself is not vendored in the
    * reference tree; the semantics are pinned by test/df_graph_test.erl:
    * a statement with SELECT and a FROM passes (WITH-prefixed CTEs
    * included, check_select_with_test), a projection with no FROM is
    * rejected (check_select_with_no_from_test). Template placeholders
    * ({{...}}, $__timefilter) are opaque text at this stage.
    */
  def checkSelectStatement(sql: String): Boolean = {
    import java.util.regex.Pattern
    val sel = Pattern.compile("(?is)\\bselect\\b(.*)", Pattern.DOTALL)
      .matcher(sql)
    sel.find() &&
      Pattern.compile("(?i)\\bfrom\\b").matcher(sel.group(1)).find()
  }

  /** Reference-exact bucket expression (esp_crate_query.erl:157-163):
    * the bucket unit is whole SECONDS of the group_by_time duration.
    */
  def timeGroup(groupByTimeMs: Long, timeField: String): String = {
    val dur = math.round(groupByTimeMs / 1000.0)
    s"floor(EXTRACT(epoch FROM $timeField)/$dur)*$dur AS ${timeField}_gb"
  }

  private def rangeJoin(rest: String): String =
    // deliberately CASE-SENSITIVE: the reference's own detection is
    // binary:match(Query, <<"WHERE">>) (esp_crate_query.erl:188-193,
    // eunit-pinned) — a lowercase `where` double-appends there too;
    // bug-for-bug parity keeps the rewrite string-identical
    if (rest.contains("WHERE")) " AND " else " WHERE "

  /** Reference-exact rewrite (esp_crate_query.erl:144-155; eunit
    * build_simple_query_test pins the full output).
    */
  def buildQuery(query: String, groupByTimeMs: Long, timeField: String,
      groupBys: Seq[String]): String = {
    val rest = query.drop(6) // the leading "SELECT"
    val groupClause = groupBys.map(g => s", $g").mkString
    s"SELECT ${timeGroup(groupByTimeMs, timeField)}, ${rest.trim}" +
      s"${rangeJoin(rest)}$timeField >= $$1 AND $timeField <= $$2" +
      s" GROUP BY ${timeField}_gb$groupClause ORDER BY ${timeField}_gb DESC"
  }

  /** ms epoch → a Spark `TIMESTAMP_NTZ '...'` literal (UTC wall-clock —
    * the session tz is pinned UTC, so this is the exact re-tag of the
    * bound; explicit ms pattern because LocalDateTime.toString drops
    * trailing units and Spark's parser wants full fields).
    */
  private def ntzLit(ms: Long): String = {
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
    val s = ldt.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    s"TIMESTAMP_NTZ '$s'"
  }

  /** Spark-dialect rewrite for one poll window (see class doc for the
    * two deliberate divergences). The range predicate must land on a
    * RAW scan column — `unix_millis(tf)` is a derived expression the
    * parquet reader cannot push (only IsNotNull survives), so every
    * poll would full-scan at 100 TB:
    *  - `ntzRawField` (raw NTZ timestamp): NTZ-literal bounds, exact;
    *  - `nsField` (raw epoch-ns long, legacy nanosAsLong read):
    *    `ms ∈ [a,b) ⟺ ns ∈ [a·10⁶, b·10⁶)` exactly (integer
    *    truncation);
    *  - neither: derived unix_millis fallback (correct, unpushed).
    */
  def sparkQuery(query: String, groupByTimeMs: Long, timeField: String,
      groupBys: Seq[String], w: PollSource.PollWindow,
      nsField: Option[String] = None,
      ntzRawField: Option[String] = None): String = {
    val sec = math.max(1L, math.round(groupByTimeMs / 1000.0))
    val rest = query.drop(6).trim
    val groupClause = groupBys.map(g => s", $g").mkString
    val range = (ntzRawField, nsField) match {
      // raw NTZ scan column: the bound lands as an NTZ literal — a
      // direct attribute-vs-literal comparison the reader pushes down
      case (Some(raw), _) =>
        s"$raw >= ${ntzLit(w.fromMs)} AND $raw < ${ntzLit(w.toMs)}"
      case (None, Some(ns)) =>
        s"$ns >= ${w.fromMs * 1000000L} AND $ns < ${w.toMs * 1000000L}"
      case (None, None) =>
        s"unix_millis($timeField) >= ${w.fromMs}" +
          s" AND unix_millis($timeField) < ${w.toMs}"
    }
    s"SELECT (unix_millis($timeField) div 1000 div $sec) * $sec" +
      s" AS ${timeField}_gb, $rest" +
      s"${rangeJoin(rest)}$range" +
      s" GROUP BY ${timeField}_gb$groupClause ORDER BY ${timeField}_gb DESC"
  }

  private val FromTable = "(?i)\\bfrom\\s+([A-Za-z_]\\w*)".r

  private def fromMatch(query: String): Option[scala.util.matching.Regex.Match] = {
    var depth = 0
    FromTable.findAllMatchIn(query).collectFirst {
      case m if {
        depth = query.take(m.start).count(_ == '(') -
          query.take(m.start).count(_ == ')')
        depth == 0
      } => m
    }
  }

  /** The FROM-clause table: first `from <ident>` at paren depth 0 —
    * a `from` inside parentheses (EXTRACT(epoch FROM ts), subqueries in
    * expressions) is not the source table.
    */
  private def fromTable(query: String): Option[String] =
    fromMatch(query).map(_.group(1))

  /** Backtick the FROM table for the Spark dialect: foreign-DB scripts
    * legally use identifiers Spark's parser reserves (pg_query.dfs's
    * `FROM table`); backticks are a no-op for any other simple name.
    */
  private def quoteFrom(query: String): String =
    fromMatch(query).map { m =>
      query.take(m.start(1)) + s"`${m.group(1)}`" + query.drop(m.end(1))
    }.getOrElse(query)

  /** Run the node in batch form: derive the poll timeline from the data
    * bounds (the reference's setup_query behavior), then issue one
    * rewritten query per poll window and union the batches.
    *
    * The mark timeline is aligned DOWN to a bucket boundary and the
    * period rounded UP to a whole number of buckets, so no bucket ever
    * straddles two polls — the condition under which N polls + bucket-agg
    * ≡ one global bucket query (the `align` option's spirit,
    * esp_crate_query.erl init_timer).
    */
  def runPolls(spark: SparkSession, dir: String, query0: String,
      groupByTimeMs: Long, timeField: String, groupBys: Seq[String],
      periodMs: Long): DataFrame = {
    // heredoc queries arrive whitespace-framed; the rewrite drops the
    // leading "SELECT" positionally, so trim first
    val query = query0.trim
    val table = fromTable(query)
      .getOrElse(throw new IllegalArgumentException(
        s"crate_query: no FROM table in '$query'"))
    val sq = quoteFrom(query) // Spark-dialect: reserved-word FROM tables
    // catalog-first: a registered view of the same name binds the query
    // (foreign-DB tables with no parquet twin); otherwise corpus parquet
    val df =
      if (table == "events") { val d = Tables.eventsWithRaw(spark, dir)
        d.createOrReplaceTempView(table); d }
      else if (spark.catalog.tableExists(table)) spark.table(table)
      else { val d = Tables.load(spark, dir, table)
        d.createOrReplaceTempView(table); d }

    // raw NTZ column → NTZ-literal range (pushable); raw epoch-ns long →
    // ns range (ts_ns IS the scan attribute under the legacy long read)
    val ntzRawField = Some(s"${timeField}_raw").filter(n =>
      df.columns.contains(n) &&
        df.schema(n).dataType ==
          org.apache.spark.sql.types.TimestampNTZType)
    val nsField = Some(s"${timeField}_ns").filter(n =>
      df.columns.contains(n) &&
        df.schema(n).dataType == org.apache.spark.sql.types.LongType &&
        ntzRawField.isEmpty)
    val bucketMs = math.max(1000L, math.round(groupByTimeMs / 1000.0) * 1000L)
    val bounds = df.agg(min(unix_millis(col(timeField))),
      max(unix_millis(col(timeField)))).head
    if (bounds.isNullAt(0)) return spark.sql(sparkQuery(sq, groupByTimeMs,
      timeField, groupBys, PollSource.PollWindow(0L, 0L), nsField,
      ntzRawField))
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val start = mn - java.lang.Math.floorMod(mn, bucketMs)
    val reqPeriod = math.max(bucketMs,
      ((periodMs + bucketMs - 1) / bucketMs) * bucketMs)
    // Bound the union fan-in: this batch binding folds every poll into
    // ONE plan, and a long corpus with a short period (30 days / 30 min
    // = 1440 windows) explodes plan width — analysis cost alone
    // dominates. A deployment runs each poll as its own micro-query on a
    // timer, so the period only shapes batch boundaries here; widen it
    // (to a bucket multiple) until ≤8 windows cover the span (the
    // N-polls ≡ one-query proof is N-independent; at small SF the plan
    // count, not the data, is the cost).
    val maxWindows = 8L
    val minPeriod0 = (mx - start) / maxWindows + 1
    val minPeriod = ((minPeriod0 + bucketMs - 1) / bucketMs) * bucketMs
    val period = math.max(reqPeriod, minPeriod)
    val poller = new PollSource.IncrementalPoll(startMs = start,
      periodMs = period, offsetMs = 0L, minIntervalMs = 0L,
      stopMs = Some(mx + period))
    val frames = poller.catchUp(nowMs = mx + 2 * period).map(w =>
      spark.sql(sparkQuery(sq, groupByTimeMs, timeField, groupBys, w,
        nsField, ntzRawField)))
    frames.reduceOption(_ union _).getOrElse(
      throw new IllegalStateException("crate_query: no poll windows"))
  }
}
