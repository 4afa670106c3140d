package graft.dfs

import graft.core.{Paths, Tables}
import graft.functions.Lambdas
import graft.operators.agg.Aggregate
import graft.operators.join.Joins
import graft.operators.state.StateOps
import graft.operators.stateless.Transforms
import graft.operators.window.Windows
import Ir._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DFS DAG → DataFrame planner (SURVEY §3 lifecycle mapping): linear
  * chains fold into one Catalyst plan; fan-out reuses the named chain's
  * DataFrame; windows/group_by thread a grouping context into the next
  * aggregation node instead of cloning subgraphs (faxe's group_by runtime
  * cloning, esp_group_by.erl:105-111, becomes a shuffle key).
  *
  * Edge typing mirrors faxe_dfs.erl:165-183: every node declares wants /
  * emits (point | batch | both) and connections type-check at compile
  * time with the reference's error message shape.
  */
object Planner {

  /** Plan-time context flowing down a chain. */
  final case class Win(kind: String, periodMs: Long, everyMs: Long,
      fillPeriod: Boolean, alignMs: Option[Long] = None)
  final case class Ctx(df: DataFrame, keys: Seq[String], win: Option[Win],
      io: IoType, ts: String, tsMs: String)

  final case class Env(spark: SparkSession, dir: String,
      defs: Map[String, Value], frames: String => Ctx,
      hasFrame: String => Boolean = _ => false)

  final case class NodeDef(
      wants: Option[IoType], // None = source
      emits: IoType,
      opts: Set[String],
      plan: (Option[Ctx], NodeSpec, Env) => Ctx,
      // true = may also START a chain with no upstream (a side-effect
      // node like mem pre-populating flow memory, picking_tracking.dfs:6)
      optionalInput: Boolean = false)

  // ---- value / lambda translation ---------------------------------------

  private def interp(s: String, defs: Map[String, Value]): String = {
    // unknown {{placeholders}} stay verbatim: they are row-level
    // string_template references (e.g. email .subject('{{data.err}}'),
    // esp_email.erl string_template options), resolved per point by the
    // node — only declared defs interpolate at plan time. Substitution
    // runs to a (bounded) fixpoint: a def's string may itself reference
    // defs (s7_read_test1.dfs `def db = 'DB{{db_number}}.DB'`).
    var out = s
    var i = 0
    var changed = true
    while (changed && i < 8) {
      val next = "\\{\\{(\\w+)\\}\\}".r.replaceAllIn(out, m =>
        defs.get(m.group(1))
          .map(v => java.util.regex.Matcher.quoteReplacement(valueString(v)))
          .getOrElse(java.util.regex.Matcher.quoteReplacement(m.matched)))
      changed = next != out
      out = next
      i += 1
    }
    out
  }

  private def valueString(v: Value): String = v match {
    case VStr(s) => s
    case VNum(d, true) => d.toLong.toString
    case VNum(d, false) => d.toString
    case VLong(l) => l.toString
    case VBool(b) => b.toString
    case VDur(_, raw) => raw
    case other => throw DfsError(s"cannot interpolate $other")
  }

  private[dfs] def resolve(v: Value, defs: Map[String, Value]): Value = v match {
    // a bare word with no def behind it is an enum atom
    // (.type(point), .parser(parser_lrep_v1) — the reference's option
    // atoms), not an error: it resolves to its own name
    case VRef(name) => defs.getOrElse(name, VStr(name))
    case VStr(s) => VStr(interp(s, defs))
    case other => other
  }

  def lambdaColumn(e: LExpr, defs: Map[String, Value]): Column = e match {
    case LField(p) => Paths.ref(p)
    case LStr(s) => lit(interp(s, defs))
    case LNum(v, true) => lit(v.toLong)
    case LNum(v, false) => lit(v)
    case LLong(l) => lit(l)
    case LBool(b) => lit(b)
    case LNot(x) => !lambdaColumn(x, defs)
    case LBin(op, l, r) =>
      val (a, b) = (lambdaColumn(l, defs), lambdaColumn(r, defs))
      op match {
        case "AND" => a && b
        case "OR" => a || b
        case ">" => a > b
        case "<" => a < b
        case ">=" => a >= b
        case "<=" => a <= b
        case "==" => a === b
        case "!=" => a =!= b
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case o => throw DfsError(s"unknown operator '$o'")
      }
    case LCall("__ref__", Seq(LStr(name))) =>
      defs.get(name) match {
        case Some(VNum(v, true)) => lit(v.toLong)
        case Some(VNum(v, false)) => lit(v)
        case Some(VLong(l)) => lit(l)
        case Some(VStr(s)) => lit(s)
        case Some(VBool(b)) => lit(b)
        case Some(VDur(ms, _)) => lit(ms)
        case Some(VLambda(inner)) => lambdaColumn(inner, defs)
        case _ => throw DfsError(s"undefined reference '$name' in lambda")
      }
    // literal-argument special forms
    case LCall("round_float", Seq(x, LNum(d, _))) =>
      Lambdas.roundFloat(lambdaColumn(x, defs), d.toInt)
    case LCall("str_replace", Seq(s, LStr(from), LStr(to))) =>
      Lambdas.strReplace(lambdaColumn(s, defs), interp(from, defs), interp(to, defs))
    case LCall("str_replace", Seq(s, LStr(from), to)) =>
      Lambdas.strReplaceDyn(lambdaColumn(s, defs), interp(from, defs),
        lambdaColumn(to, defs))
    case LCall("str_slice", Seq(s, LNum(st, _), LNum(len, _))) =>
      Lambdas.strSlice(lambdaColumn(s, defs), st.toInt, len.toInt)
    case LCall("time_align", Seq(ms, LNum(d, _))) =>
      Lambdas.timeAlign(lambdaColumn(ms, defs), d.toLong)
    case LCall("random_latin_string", Seq(LNum(n, _))) =>
      Lambdas.randomLatinString(n.toInt)
    case LCall("random", Seq(LNum(n, _))) =>
      Lambdas.randomInt(n.toInt)
    // random_real(N): uniform float in [0, N) (faxe_lambda_lib random_real)
    case LCall("random_real", Seq(LNum(n, _))) =>
      rand() * lit(n)
    case LCall("random_real", Nil) =>
      rand()
    // membership against a stored list column (mem_test.dfs
    // member("f", ls_mem_list(key))) — array containment, not isin
    case LCall("member", Seq(x, l @ LCall("ls_mem" | "ls_mem_list", _))) =>
      array_contains(
        transform(lambdaColumn(l, defs), e => e.cast("string")),
        lambdaColumn(x, defs).cast("string"))
    case LCall("member", x +: rest) if rest.nonEmpty =>
      val elems = rest.flatMap {
        case LCall("__list__", es) => es
        case a => Seq(a)
      }
      Lambdas.member(lambdaColumn(x, defs), elems.map(lambdaColumn(_, defs)))
    // engine-conf / flow-memory access, resolved at PLAN time into
    // literals (graft.core.{EngineConf, MemStore}; refs: dfs/test/env.dfs,
    // esp_mem.erl:1-13 lambda-visible ETS values).
    case LCall("env", Seq(LStr(name))) =>
      graft.core.EngineConf.envColumn(interp(name, defs), lit(null))
    case LCall("env", Seq(LStr(name), d)) =>
      graft.core.EngineConf.envColumn(interp(name, defs), lambdaColumn(d, defs))
    case LCall("env", Seq(nameExpr, d)) =>
      graft.core.EngineConf.envColumnDynamic(
        lambdaColumn(nameExpr, defs), lambdaColumn(d, defs))
    // map_get over a JSON-object string (a def holding a JSON map —
    // dfs/test/mqtt_topic_field_test.dfs:1,17): the literal parses to a
    // map literal at plan time
    case LCall("map_get", Seq(k, m)) if jsonMapLiteral(m, defs).isDefined =>
      element_at(jsonMapLiteral(m, defs).get, lambdaColumn(k, defs))
    case LCall("map_get", Seq(k, m, d)) if jsonMapLiteral(m, defs).isDefined =>
      coalesce(
        element_at(jsonMapLiteral(m, defs).get, lambdaColumn(k, defs)),
        lambdaColumn(d, defs))
    case LCall("mem", Seq(LStr(key))) =>
      graft.core.MemStore.memColumn(interp(key, defs))
    case LCall("mem", Seq(LStr(key), d)) =>
      graft.core.MemStore.memColumn(interp(key, defs), lambdaColumn(d, defs))
    case LCall("ls_mem" | "ls_mem_list", Seq(e)) if constStr(e, defs).isDefined =>
      graft.core.MemStore.lsMemColumn(constStr(e, defs).get)
    case LCall("ls_mem_member", Seq(x, LStr(key))) =>
      graft.core.MemStore.lsMemMember(lambdaColumn(x, defs), interp(key, defs))
    case LCall(name, args0) =>
      val args = args0.flatMap {
        case LCall("__list__", es) => es // [a, b, c] into vararg position
        case a => Seq(a)
      }
      Lambdas.registry.get(name) match {
        case Some(b) => b(args.map(lambdaColumn(_, defs)))
        case None => throw DfsError(
          s"unknown lambda function '$name'.${suggest(name, Lambdas.registry.keys)}")
      }
  }

  /** A lambda argument that is (a ref to) a JSON-object string becomes a
    * string→string map literal; None if it isn't one.
    */
  /** A lambda argument that is a compile-time string: a literal or a
    * string def reference (mem_test.dfs `ls_mem_list(mem_key)`).
    */
  private def constStr(e: LExpr, defs: Map[String, Value]): Option[String] =
    e match {
      case LStr(v) => Some(interp(v, defs))
      case LCall("__ref__", Seq(LStr(name))) => defs.get(name).collect {
        case VStr(v) => interp(v, defs)
      }
      case _ => None
    }

  private def jsonMapLiteral(e: LExpr, defs: Map[String, Value]): Option[Column] = {
    val str = e match {
      case LStr(s) => Some(interp(s, defs))
      case LCall("__ref__", Seq(LStr(name))) => defs.get(name) collect {
        case VStr(s) => interp(s, defs)
      }
      case _ => None
    }
    str.filter(_.trim.startsWith("{")).flatMap { j =>
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = om.readTree(j)
        if (!node.isObject) None
        else {
          val b = Seq.newBuilder[Column]
          node.fields().forEachRemaining(en => {
            b += lit(en.getKey); b += lit(en.getValue.asText)
          })
          Some(map(b.result(): _*))
        }
      } catch { case _: Exception => None }
    }
  }

  // ---- option helpers ----------------------------------------------------

  private def optVals(n: NodeSpec, name: String, env: Env): Seq[Value] =
    n.options.getOrElse(name, Seq.empty).map(resolve(_, env.defs))

  /** An `any`-typed option value as a comparable literal column — one
    * conversion path with the set/default nodes (valueToLit + the lambda
    * compiler, with the script's defs in scope), so literal semantics
    * cannot diverge between them.
    */
  private def valueLit(v: Value, env: Env): Column =
    lambdaColumn(valueToLit(v), env.defs)

  // ---- shared join/join2 fill + landing machinery ------------------------
  // esp_join.erl:7-10, esp_join2.erl header: fill none/false = disabled
  // (inner join); 'null' = outer with NULLs; any other literal = outer
  // with the value standing in for the absent point's fields.
  private def fillDisabledValue(v: Value): Boolean = v match {
    case VStr("none") | VBool(false) => true
    case _ => false
  }

  /** (fillActive, full, fillVal) — the FullFill truth table
    * (`FullFill = case Full of false -> false; true -> not fill(Fill)`):
    * .full(false) is always partial; otherwise an ACTIVE fill forces
    * partial emission even under explicit .full(true).
    */
  private def fillAndFull(n: NodeSpec, env: Env)
      : (Boolean, Boolean, Option[Value]) = {
    val fillOpt = optVals(n, "fill", env).headOption
    val fillActive = fillOpt.exists(v => !fillDisabledValue(v))
    val full = optVals(n, "full", env).headOption match {
      case Some(VBool(false)) => false
      case _ => !fillActive
    }
    (fillActive, full, fillOpt.filter(v =>
      !fillDisabledValue(v) && v != VStr("null")))
  }

  /** The fill literal for one column, applied only where the type can
    * hold it (the reference's maps are schemaless; typed columns take a
    * numeric fill on numeric columns, string on string, bool on bool).
    */
  private def fillFor(fillVal: Option[Value], env: Env,
      dt: org.apache.spark.sql.types.DataType): Option[Column] =
    fillVal.flatMap { v =>
      val ok = (v, dt) match {
        case (VNum(_, _) | VLong(_) | VDur(_, _),
          _: org.apache.spark.sql.types.NumericType) => true
        case (VStr(_), org.apache.spark.sql.types.StringType) => true
        case (VBool(_), org.apache.spark.sql.types.BooleanType) => true
        case _ => false
      }
      if (ok) Some(valueLit(v, env).cast(dt)) else None
    }

  /** Own-name landing shared by join and join2: each right field lands
    * on its exact column name (later streams overwrite — the reference's
    * set_fields fold). Under full=true every surviving row matched, so
    * the landing is a plain overwrite; under partial emission, colliding
    * columns keep the left value where CaseWhen coercion is sound (same
    * type or both numeric) and non-colliding ones take the fill value.
    */
  private def landOwnCols(d0: DataFrame, ownCols: Seq[String], tmp: String,
      matched: Column, full: Boolean, fillVal: Option[Value],
      env: Env): DataFrame =
    ownCols.foldLeft(d0) { (d, f) =>
      val rCol = col(s"`$tmp$f`")
      val rightType = d.schema(s"$tmp$f").dataType
      def unifiable(lt: org.apache.spark.sql.types.DataType) =
        org.apache.spark.sql.graftbridge.ColumnBridge.sameType(lt, rightType) ||
          (lt.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
            rightType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      val newCol: Column =
        if (full) rCol
        else if (d.columns.contains(f) && unifiable(d.schema(f).dataType))
          when(matched, rCol).otherwise(col(s"`$f`"))
        else if (d.columns.contains(f))
          // non-unifiable type collision: the reference keeps the left
          // value when the joined port is absent (esp_join.erl:182-196 —
          // set_fields only folds over PRESENT ports), so render both
          // sides to string rather than nulling the unmatched left
          when(matched, rCol.cast("string"))
            .otherwise(col(s"`$f`").cast("string"))
        else when(matched, rCol)
          .otherwise(fillFor(fillVal, env, rightType).getOrElse(lit(null)))
      d.withColumn(f, newCol).drop(s"$tmp$f")
    }

  private def optStr(n: NodeSpec, name: String, env: Env): Option[String] =
    optVals(n, name, env).headOption.map {
      case VStr(s) => s
      case v => valueString(v)
    }

  private def optStrs(n: NodeSpec, name: String, env: Env): Seq[String] =
    optVals(n, name, env).map {
      case VStr(s) => s
      case v => valueString(v)
    }

  private def optDurMs(n: NodeSpec, name: String, env: Env): Option[Long] =
    optVals(n, name, env).headOption.map {
      case VDur(ms, _) => ms
      case VNum(v, _) => v.toLong
      case VLong(l) => l
      case v => throw DfsError(s"option '$name': expected duration, got $v")
    }

  private def optNum(n: NodeSpec, name: String, env: Env): Option[Double] =
    optVals(n, name, env).headOption.map {
      case VNum(v, _) => v
      case VLong(l) => l.toDouble
      case v => throw DfsError(s"option '$name': expected number, got $v")
    }

  /** is_set-style flag: present (bare `.name()` or `.name(true)`) unless
    * explicitly `.name(false)`.
    */
  private def optFlag(n: NodeSpec, name: String, env: Env): Boolean =
    n.options.contains(name) && !optStr(n, name, env).contains("false")

  // def-held lambdas resolve through the ref (template_test.dfs
  // `def rewrite_fun = lambda: …` then `eval(rewrite_fun)`)
  private def optLambdas(n: NodeSpec, name: String, env: Env): Seq[LExpr] =
    optVals(n, name, env).map(resolve(_, env.defs))
      .collect { case VLambda(e) => e }

  private def argLambdas(n: NodeSpec, env: Env): Seq[LExpr] =
    n.args.map(resolve(_, env.defs)).collect { case VLambda(e) => e }

  private def argStrs(n: NodeSpec, env: Env): Seq[String] =
    n.args.map(resolve(_, env.defs)).collect { case VStr(s) => s }

  private def keyCols(ctx: Ctx): Seq[Column] = ctx.keys.map(col)
  private def orderCols(ctx: Ctx): Seq[Column] = Seq(col(ctx.tsMs))

  private def requireCtx(c: Option[Ctx], node: String): Ctx =
    c.getOrElse(throw DfsError(s"node '$node' needs an upstream input"))

  // ---- node registry -----------------------------------------------------

  private def pt(opts: Set[String])(
      f: (Ctx, NodeSpec, Env) => DataFrame): NodeDef =
    NodeDef(Some(Point), Point, opts, (c, n, e) => {
      val ctx = requireCtx(c, n.name)
      ctx.copy(df = f(ctx, n, e))
    })

  /** Default node typing: components that do not declare wants/emits get
    * `both` in the reference (df_component defaults — e.g. where, eval,
    * keep accept points or batches and pass the item kind through).
    */
  private def bt(opts: Set[String])(
      f: (Ctx, NodeSpec, Env) => DataFrame): NodeDef =
    NodeDef(Some(Both), Both, opts, (c, n, e) => {
      val ctx = requireCtx(c, n.name)
      ctx.copy(df = f(ctx, n, e))
    })

  /** Custom-operator extension point (the faxe `@python` component analog,
    * faxe_dfs.erl:12-16,186-193 — here a registered Scala NodeDef instead
    * of a worker-process class). Registered nodes validate and plan like
    * built-ins; built-in names cannot be shadowed.
    */
  def registerNode(name: String, nd: NodeDef): Unit = {
    if (builtinNodes.contains(name) || statsNodes.contains(name))
      throw DfsError(s"cannot shadow built-in node '$name'")
    customNodes.put(name, nd)
  }

  private val customNodes =
    new java.util.concurrent.ConcurrentHashMap[String, NodeDef]()

  /** Public option accessors for registered custom components — the same
    * def-resolving readers the built-ins use ([[UserComponents]], user
    * registerNode call sites).
    */
  def optionStr(n: NodeSpec, name: String, env: Env): Option[String] =
    optStr(n, name, env)
  def optionStrs(n: NodeSpec, name: String, env: Env): Seq[String] =
    optStrs(n, name, env)
  def optionNums(n: NodeSpec, name: String, env: Env): Seq[Double] =
    optVals(n, name, env).map {
      case VNum(v, _) => v
      case VLong(l) => l.toDouble
      case v => throw DfsError(s"option '$name': expected number, got $v")
    }

  /** The single-function stats node family (components/stats/esp_*.erl —
    * each is a Batch→Point node computing one aggregate over the window;
    * esp_stats.erl:25-28 options {field, as, func}). Sugar over the same
    * aggregate path as the `aggregate` node.
    */
  private val statsNodes: Map[String, NodeDef] = Seq(
    "count", "sum", "min", "max", "avg", "mean", "range", "geometric_mean",
    "median", "variance", "stddev", "count_distinct", "skew", "kurtosis",
    "first", "last").map { fn =>
    // validation typing is both/both: the stats components don't export
    // wants/emits themselves (the batch/point pair lives in the esp_stats
    // behaviour module), so the reference's checker sees the default —
    // tcp_window.dfs chains them point-to-point
    fn -> NodeDef(Some(Both), Both, Set("field", "as", "func", "perc", "approx"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val f = optStr(n, "field", env)
          .getOrElse(throw DfsError(s"$fn: .field"))
        val as = optStr(n, "as", env).getOrElse(fn)
        val flat = if (as.contains(".")) "_st_out" else as
        val agg0 = groupedAgg(ctx, Seq(
          graft.operators.agg.AggFunctions
            .column(fn, Paths.ref(f), col(ctx.tsMs),
              optFlag(n, "approx", env)).as(flat)))
        val out = if (flat == as) agg0
          else Paths.set(agg0, as, col(flat)).drop(flat)
        ctx.copy(df = out, win = None, io = Point,
          ts = "", tsMs = aggEventTime(ctx))
      })
  }.toMap

  def nodes: Map[String, NodeDef] = {
    import scala.jdk.CollectionConverters._
    // the reference's _q components are queue-backed implementations of
    // the same window semantics (esp_win_time_q / esp_win_event_q)
    val aliases = Map(
      "win_time_q" -> builtinNodes("win_time"),
      "win_event_q" -> builtinNodes("win_event"),
      // modbus_multi is the multi-connection modbus variant
      // (modbus_multi_test.dfs); postgresql_query shares crate_query's
      // periodic time-bucket shape over the postgres wire (pg_query.dfs)
      "modbus_multi" -> builtinNodes("modbus"),
      "postgresql_query" -> builtinNodes("crate_query"))
    builtinNodes ++ statsNodes ++ aliases ++ customNodes.asScala
  }

  /** Node lookup with the user-component fallback: a '@name' node
    * (faxe_dfs.erl:14 USER_NODE_PREFIX — the python component form)
    * parses and validates like any node, with option checking deferred
    * exactly as faxe defers it to the component class; it PLANS only
    * when registered via [[registerNode]].
    */
  def lookup(name: String): NodeDef =
    nodes.getOrElse(name,
      if (name.startsWith("@"))
        NodeDef(Some(Both), Both, Set.empty,
          (_, n, _) => throw DfsError(s"user component '${n.name}' is " +
            "not registered (Planner.registerNode)"))
      else throw DfsError(s"unknown node '$name'.${suggest(name, nodes.keys)}"))

  /** Registered option surface per node — dev tooling (the option-parity
    * audit against the reference's `options()` lists).
    */
  def registeredOptions: Map[String, Set[String]] =
    nodes.map { case (k, v) => k -> v.opts }

  /** Compile-time check surface per node: the option names each check
    * covers — dev tooling (scripts/check_parity.py diffs against the
    * reference's `check_options()` lists so a reference-validated option
    * cannot silently go uncovered here).
    */
  def registeredCheckedOptions: Map[String, Set[String]] =
    optionChecks.map { case (k, cs) =>
      k -> cs.flatMap {
        case OneOf(o, _, _) => Seq(o)
        case OneOfParams(ps) => ps
        case FuncCheck(o, _, _) => Seq(o)
        case SameLength(os, _) => os
        case OnePlusOf(ps) => ps
        case RequiresIf(o, _) => Seq(o)
        case RequiresFlag(o, _) => Seq(o)
      }.toSet
    }

  private val builtinNodes: Map[String, NodeDef] = Map(
    // ---- sources (Spark-native scan nodes) ----
    "parquet_read" -> NodeDef(None, Point, Set("table", "dir"),
      (_, n, env) => {
        val table = optStr(n, "table", env)
          .orElse(argStrs(n, env).headOption)
          .getOrElse(throw DfsError("parquet_read needs .table(...)"))
        val dir = optStr(n, "dir", env).getOrElse(env.dir)
        val df =
          if (table == "events") Tables.events(env.spark, dir)
          else Tables.load(env.spark, dir, table)
        val (ts, tsMs) =
          if (table == "events") ("ts", "ts_ms") else ("", "")
        Ctx(df, Nil, None, Point, ts, tsMs)
      }),

    // streaming scan: same table, Structured Streaming file source; the
    // rest of the chain plans identically onto the streaming DataFrame
    // (windows pick up the watermark, see groupedAgg).
    "parquet_stream" -> NodeDef(None, Point,
      Set("table", "dir", "watermark"),
      (_, n, env) => {
        val table = optStr(n, "table", env)
          .orElse(argStrs(n, env).headOption)
          .getOrElse(throw DfsError("parquet_stream needs .table(...)"))
        val dir = optStr(n, "dir", env).getOrElse(env.dir)
        val schema = Tables.load(env.spark, dir, table).schema
        // file-stream sources want a directory: stream the corpus dir with
        // a glob pinned to this table's file
        val raw = env.spark.readStream.schema(schema)
          .option("pathGlobFilter", s"$table.parquet")
          .parquet(dir)
        val df =
          if (table == "events") Tables.normalizeEvents(raw)
          else raw
        val (ts, tsMs) =
          if (table == "events") ("ts", "ts_ms") else ("", "")
        Ctx(df, Nil, None, Point, ts, tsMs)
      }),

    // crate_query — periodic SQL with the time-bucket GROUP-BY rewrite
    // (ref: esp_crate_query.erl:144-171 build_query; options :44-62).
    // Engine binding runs the rewritten query per poll window over the
    // corpus table named in FROM; host/port/user/... are the
    // deployment-side connection options, accepted and unused here.
    "crate_query" -> NodeDef(None, Batch,
      Set("host", "port", "tls", "user", "pass", "database", "query",
        "time_field", "every", "period", "align", "group_by_time",
        "group_by", "limit", "result_type"),
      (_, n, env) => {
        val q = optStr(n, "query", env)
          .getOrElse(throw DfsError("crate_query: .query"))
        val tf = optStr(n, "time_field", env).getOrElse("ts")
        val gbt = optDurMs(n, "group_by_time", env).getOrElse(120000L)
        val gbs = optStrs(n, "group_by", env)
        val period = optDurMs(n, "period", env).getOrElse(3600000L)
        val df = graft.io.CrateQuery.runPolls(env.spark, env.dir, q, gbt,
          tf, gbs, period)
        // the bucket key (`<tf>_gb`, SECONDS) is the result's time axis;
        // no ms-precision event-time column survives the rewrite
        Ctx(df, Nil, None, Batch, "", "")
      }),

    // json_emitter test source: literal JSON docs → rows (ref:
    // esp_json_emitter.erl:37-66; .every/.jitter are stream pacing —
    // meaningless in batch, accepted and ignored).
    "json_emitter" -> NodeDef(None, Both,
      Set("every", "jitter", "select", "json", "as", "align", "name"),
      (_, n, env) => {
        val docs = argStrs(n, env) ++ optStrs(n, "json", env)
        if (docs.isEmpty) throw DfsError("json_emitter needs JSON documents")
        // .jitter/.align/.select are stream pacing — ignored in batch;
        // `_seq` pins arrival order as the emitter's event time, and `ts`
        // carries the paced epoch-ms the reference's point would have
        val df = graft.io.Sources.jsonEmitterOrdered(env.spark, docs,
          optStr(n, "as", env),
          everyMs = optDurMs(n, "every", env).getOrElse(1000L))
        Ctx(df, Nil, None, Point, "", "_seq")
      }),

    // value_emitter test source: n deterministic synthetic points (ref:
    // esp_value_emitter.erl:26-66; random values become a hash sequence).
    "value_emitter" -> NodeDef(None, Both,
      Set("every", "count", "type", "mode", "jitter", "fields",
        "field_values", "align", "format", "batch_size"),
      (_, n, env) => {
        val count = optNum(n, "count", env).map(_.toLong).getOrElse(100L)
        val value = optStr(n, "mode", env) match {
          case Some("monotonic_int") => col("id")
          case _ => pmod(col("id") * 2654435761L, lit(1000L))
        }
        // deterministic synthetic event time: emission i happens at
        // BASE + i * every (the batch analog of the emitter's pacing)
        val everyMs = optDurMs(n, "every", env).getOrElse(1000L)
        val base = 1577836800000L // 2020-01-01T00:00:00Z
        // `ts` is the reference's data_point.ts — an epoch-ms INTEGER
        // (lambdas compute "ts" - 60000*5, deadman_test.dfs; to_iso8601
        // accepts ms) — not a SQL timestamp; windows synthesize their
        // timestamp column from ts_ms (groupedAgg)
        val df = env.spark.range(count).toDF("id")
          .withColumn("val", value)
          .withColumn("ts", lit(base) + col("id") * everyMs)
          .withColumn("ts_ms", col("ts"))
        Ctx(df, Nil, None, Point, "", "ts")
      }),

    // ---- stateless transforms (§2.1) ----
    "where" -> bt(Set("emit_empty", "lambda")) { (ctx, n, env) =>
      val pred = (argLambdas(n, env) ++ optLambdas(n, "lambda", env))
        .headOption.getOrElse(throw DfsError("where needs a lambda"))
      Transforms.where(ctx.df, lambdaColumn(pred, env.defs))
    },
    "eval" -> bt(Set("as", "tags", "lambdas")) { (ctx, n, env) =>
      val lambdas = argLambdas(n, env) ++ optLambdas(n, "lambdas", env)
      val as = optStrs(n, "as", env)
      if (as.size != lambdas.size)
        throw DfsError("eval: .as(...) arity must match lambda count")
      // sequential semantics: each lambda sees previous results
      as.zip(lambdas).foldLeft(ctx.df) { case (d, (name, l)) =>
        Paths.set(d, name, lambdaColumn(l, env.defs))
      }
    },
    // .tags/.tag_values set faxe point TAGS — plain columns in the
    // relational model (esp_set.erl/esp_default.erl tag options)
    "default" -> bt(
      Set("field", "value", "fields", "values", "field_values",
        "tags", "tag_values")) { (ctx, n, env) =>
      val fs = optStrs(n, "field", env) ++ optStrs(n, "fields", env) ++
        optStrs(n, "tags", env)
      val vs = optVals(n, "value", env) ++ optVals(n, "values", env) ++
        optVals(n, "field_values", env) ++ optVals(n, "tag_values", env)
      if (fs.isEmpty) throw DfsError("default: .field(s)")
      if (fs.size != vs.size) throw DfsError("default: fields/values arity")
      fs.zip(vs).foldLeft(ctx.df) { case (d, (f, v)) =>
        Transforms.default(d, f, lambdaColumn(valueToLit(v), env.defs))
      }
    },
    "set" -> bt(Set("field", "value", "fields", "values", "field_values",
      "tags", "tag_values")) { (ctx, n, env) =>
      val fs = optStrs(n, "field", env) ++ optStrs(n, "fields", env) ++
        optStrs(n, "tags", env)
      val vs = optVals(n, "value", env) ++ optVals(n, "values", env) ++
        optVals(n, "field_values", env) ++ optVals(n, "tag_values", env)
      if (fs.size != vs.size) throw DfsError("set: fields/values arity")
      Transforms.setFields(ctx.df,
        fs.zip(vs.map(v => lambdaColumn(valueToLit(v), env.defs))))
    },
    // .where gates the delete per row (esp_delete.erl conditional
    // delete); tags are columns relationally
    "delete" -> bt(Set("fields", "tags", "where", "when_value")) {
      (ctx, n, env) =>
        val paths = argStrs(n, env) ++ optStrs(n, "fields", env) ++
          optStrs(n, "tags", env)
        optLambdas(n, "where", env).headOption match {
          case Some(gate) =>
            val g = lambdaColumn(gate, env.defs)
            paths.filter(graft.core.Paths.has(ctx.df, _))
              .foldLeft(ctx.df)((d, p) => Transforms.deleteWhen(d, p, g))
          case None =>
            // when_value: per-field conditional delete — field F clears
            // only on rows where F equals the value; other fields and
            // other rows keep theirs (esp_delete.erl:72-80 eval_when).
            // `where` and `when_value` are one_of in the reference.
            optVals(n, "when_value", env).headOption match {
              case Some(wv) =>
                paths.filter(graft.core.Paths.has(ctx.df, _))
                  .foldLeft(ctx.df)((d, p) => Transforms.deleteWhen(
                    d, p, graft.core.Paths.ref(p) === valueLit(wv, env)))
              case None => Transforms.delete(ctx.df, paths)
            }
        }
    },
    "keep" -> bt(Set("fields", "tags", "as")) { (ctx, n, env) =>
      // tags are ordinary columns relationally — .tags extends the kept
      // list (esp_keep.erl:22 keeps fields and tags side by side)
      val fields = argStrs(n, env) ++ optStrs(n, "fields", env)
      val tags = optStrs(n, "tags", env)
      val as = optStrs(n, "as", env)
      // .as renames FIELDS positionally and strictly — the reference
      // zips aliases against the field names (esp_keep.erl:43
      // lists:zip(Aliases, FieldVals), which errors on arity mismatch)
      // and tags ALWAYS keep their own names (line 44)
      if (as.nonEmpty && as.size != fields.size)
        throw DfsError(
          s"keep: .as has ${as.size} aliases for ${fields.size} fields")
      // relational-model note: the reference point carries ts outside its
      // field map so keep preserves it implicitly (esp_keep.erl:45); in
      // graft's mapping the time IS a column (ts_ms) and keep stays a
      // pure projection — list ts_ms explicitly to retain it (the
      // convention every DFS pack query already follows)
      val pairs =
        (if (as.isEmpty) fields.map(_ -> (None: Option[String]))
         else fields.zip(as.map(Option(_)))) ++
          tags.map(_ -> (None: Option[String]))
      Transforms.keep(ctx.df, pairs)
    },
    "rename" -> bt(Set("fields", "as", "as_fields", "tags", "as_tags")) {
      (ctx, n, env) =>
      // tag renames are column renames relationally (rename.dfs
      // .tags/.as_tags)
      val fields = optStrs(n, "fields", env) ++ optStrs(n, "tags", env)
      val asVals = optVals(n, "as", env) ++ optVals(n, "as_fields", env) ++
        optVals(n, "as_tags", env)
      if (fields.size != asVals.size)
        throw DfsError("rename: .fields/.as arity mismatch")
      val pairs = fields.zip(asVals).map {
        case (f, VStr(s)) => f -> s
        case (f, VLambda(e)) =>
          // rename-by-lambda (esp_rename.erl:72-80): the lambda sees the
          // old name as `__fieldname`. Column names are schema-level, so
          // the lambda must be row-independent and evaluates ONCE at plan
          // time (a data-field reference is rejected, not silently
          // constant-folded).
          val nameExpr = substFieldName(e, f)
          val nameCol = lambdaColumn(nameExpr, env.defs).cast("string")
          f -> env.spark.range(1).select(nameCol).head.getString(0)
        case (_, v) => throw DfsError(s"rename: bad .as value $v")
      }
      Transforms.rename(ctx.df, pairs)
    },
    "sample" -> bt(Set("every", "rate", "keys")) { (ctx, n, env) =>
      // the reference takes ONE `rate` option, int OR duration
      // (esp_sample.erl:27-34); `sample(500ms)` positional included
      val posArg = n.args.map(resolve(_, env.defs)).collectFirst {
        case VNum(v, _) => Left(v.toInt)
        case VDur(ms, _) => Right(ms)
      }
      val rateVal = optVals(n, "rate", env).headOption
      val nthOpt = rateVal.collect {
        case VNum(v, _) => v.toInt
        case VLong(l) => l.toInt
      }.orElse(posArg.collect { case Left(i) => i })
      nthOpt match {
        case Some(nth) =>
          Transforms.sampleEveryN(ctx.df, nth, orderCols(ctx), keyCols(ctx))
        case None =>
          val dur = rateVal.collect { case VDur(ms, _) => ms }
            .orElse(optDurMs(n, "every", env))
            .orElse(posArg.collect { case Right(ms) => ms })
            .getOrElse(throw DfsError("sample: .rate(n) or .every(duration)"))
          val tsc = if (ctx.ts.nonEmpty) col(ctx.ts)
            else timestamp_millis(col(ctx.tsMs))
          Transforms.sampleFirstPer(ctx.df, tsc, dur, orderCols(ctx))
      }
    },
    // .offset is the reference's option name (esp_shift.erl:14, default
    // -30s, negative = into the past); .by kept as an alias, positional
    // `shift(-3m)` too (shift2.dfs)
    "shift" -> bt(Set("by", "offset")) { (ctx, n, env) =>
      val by = optDurMs(n, "offset", env)
        .orElse(optDurMs(n, "by", env))
        .orElse(n.args.map(resolve(_, env.defs))
          .collectFirst { case VDur(ms, _) => ms })
        // a bare |shift() is legal: .offset defaults to -30s
        // (esp_shift.erl:22 options())
        .getOrElse(-30000L)
      val d1 = if (ctx.ts.nonEmpty) Transforms.shift(ctx.df, ctx.ts, by)
        else ctx.df
      if (ctx.tsMs.nonEmpty && ctx.tsMs != ctx.ts &&
          d1.columns.contains(ctx.tsMs))
        d1.withColumn(ctx.tsMs, col(ctx.tsMs) + by)
      else d1
    },
    "jsonsize" -> bt(Set("field", "as", "inject")) { (ctx, n, env) =>
      // reference semantics (esp_jsonsize.erl:22-34): the byte size of
      // the WHOLE point's json, injected under .field (default
      // 'jsonsize') only with .inject() — without the flag the reference
      // only logs and the point passes unchanged. Graft extension: with
      // BOTH .field and .as, .field names an input column to measure
      // instead of the whole point (the pre-existing surface the
      // jsonsize_bytes oracle uses through the Transforms API).
      val fieldOpt = optStr(n, "field", env)
      val asOpt = optStr(n, "as", env)
      // .inject() always wins: the extension path only applies when the
      // reference's whole-point semantics were NOT requested, so
      // .inject().field('x') follows esp_jsonsize.erl exactly
      (fieldOpt, asOpt) match {
        case (Some(f), Some(as)) if !optFlag(n, "inject", env) =>
          Transforms.jsonSize(ctx.df, col(f), as)
        case _ if optFlag(n, "inject", env) =>
          val out = fieldOpt.orElse(asOpt).getOrElse("jsonsize")
          ctx.df.withColumn(out, octet_length(to_json(struct(
            ctx.df.columns.toIndexedSeq.map(c0 => col(s"`$c0`")): _*))))
        case _ => ctx.df // log-only in the reference: bit-transparent tap
      }
    },
    // ---- restructuring (§2.2) ----
    // array_explode mirrors the reference script shape
    // (dfs/array_explode.dfs): .fields(paths) zipped to .as(out paths);
    // listed-but-absent fields are tolerated (dropped).
    "array_explode" -> pt(Set("fields", "as", "keep", "time_offset")) {
      (ctx, n, env) =>
      val fields = optStrs(n, "fields", env)
      val as = optStrs(n, "as", env)
      if (as.nonEmpty && as.size != fields.size)
        throw DfsError("array_explode: .as arity must match .fields")
      val outs = if (as.isEmpty) fields else as
      val pairs = fields.zip(outs)
        .filter { case (f, _) => graft.core.Paths.has(ctx.df, f) }
      if (pairs.isEmpty) throw DfsError("array_explode: no fields present")
      val tmpNames = pairs.indices.map(i => s"_arr$i")
      val staged = pairs.zipWithIndex.foldLeft(ctx.df) {
        case (d, ((f, _), i)) =>
          graft.operators.stateless.Transforms
            .delete(d.withColumn(s"_arr$i", graft.core.Paths.ref(f)), Seq(f))
      }
      val keep = staged.columns.filterNot(tmpNames.contains).toSeq
      // element i's point is timestamped base + i·offset (esp_array_
      // explode.erl:31 time_offset, default 1s, :49 TsStart pacing)
      val exploded = graft.operators.restructure.Restructure
        .arrayExplode(staged, tmpNames, keep,
          tsMsCol = Some(ctx.tsMs).filter(t =>
            t.nonEmpty && staged.columns.contains(t)),
          tsOffsetMs = optDurMs(n, "time_offset", env).getOrElse(1000L))
      pairs.zipWithIndex.foldLeft(exploded) { case (d, ((_, out), i)) =>
        graft.core.Paths.set(d, out, col(s"_arr$i")).drop(s"_arr$i")
      }
    },
    "fields_to_array" -> pt(
      Set("fields", "as", "keep", "value_name", "key_name", "ts_as",
        "sort", "include_missing")) { (ctx, n, env) =>
      graft.operators.restructure.Restructure.fieldsToArray(
        ctx.df, optStrs(n, "fields", env),
        optStr(n, "as", env).getOrElse("collected"))
    },
    "path_split" -> bt(Set("field", "include_as", "include_name")) { (ctx, n, env) =>
      optStr(n, "field", env) match {
        case Some(f) =>
          // engine extension: split ONE map column into (key, value) rows
          val split = graft.operators.restructure.Restructure.pathSplit(
            ctx.df, col(f), ctx.df.columns.filterNot(_ == f).toSeq)
          // .include_as: the split root name lands under the given field
          // (dev/path_split.dfs:10)
          optStr(n, "include_as", env)
            .fold(split)(as => split.withColumnRenamed("key", as))
        case None =>
          // reference form (esp_path_split.erl:39-53): one point per
          // STRUCT-typed root field, the struct's fields becoming the new
          // point; scalar roots are dropped; .include_as names the field
          // carrying the old root name (default 'name', :24)
          val as = optStr(n, "include_as", env).getOrElse("name")
          val withName = optFlag(n, "include_name", env) ||
            !n.options.contains("include_name") // default true
          val structs = ctx.df.schema.fields.collect {
            case f if f.dataType.isInstanceOf[
              org.apache.spark.sql.types.StructType] => f.name
          }
          if (structs.isEmpty)
            throw DfsError("path_split: no struct-valued root fields to split")
          structs.map { r =>
            val base = ctx.df.select(col(s"`$r`.*"))
            if (withName) base.withColumn(as, lit(r)) else base
          }.reduce(_.unionByName(_, allowMissingColumns = true))
      }
    },
    "extract_path" -> bt(Set("path", "paths", "as", "default")) {
      (ctx, n, env) =>
      // `.path` is the reference's singular form (esp_jsn_select family)
      val paths = optStrs(n, "paths", env) ++ optStrs(n, "path", env)
      val as = optStrs(n, "as", env)
      if (paths.size != as.size)
        throw DfsError("extract_path: .paths/.as arity mismatch")
      val default = optVals(n, "default", env).headOption
        .map(v => lambdaColumn(valueToLit(v), env.defs)).getOrElse(lit(null))
      graft.operators.restructure.Restructure.extractPath(ctx.df,
        paths.zip(as).map { case (p, a) =>
          (graft.core.Paths.ref(p), default, a)
        })
    },
    "unbatch" -> bt(Set("field")) { (ctx, n, env) =>
      val f = optStr(n, "field", env).getOrElse(throw DfsError("unbatch: .field"))
      graft.operators.restructure.Restructure.unbatch(
        ctx.df, col(f), ctx.df.columns.filterNot(_ == f).toSeq)
    },

    "debug" -> NodeDef(Some(Both), Both, Set("level", "message", "where"),
      (c, n, _) => requireCtx(c, n.name)),
    "log" -> NodeDef(Some(Both), Both,
      Set("file", "level", "field", "format"),
      (c, n, _) => requireCtx(c, n.name)),

    // ---- grouping / windows (§2.5) ----
    "group_by" -> NodeDef(Some(Point), Point,
      Set("fields", "lambda", "debatch", "emit_empty", "reset_timeout"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        // lambda-computed keys (esp_group_by.erl lambda option) become a
        // materialized key column so downstream state/windows shuffle on it
        val (df2, lambdaKeys) = argLambdas(n, env) ++
            optLambdas(n, "lambda", env) match {
          case Nil => (ctx.df, Nil)
          case ls => (ls.zipWithIndex.foldLeft(ctx.df) { case (d, (l, i)) =>
            d.withColumn(s"_gkey$i", lambdaColumn(l, env.defs))
          }, ls.indices.map(i => s"_gkey$i"))
        }
        // deep-path keys ('data.code') materialize to flat columns too:
        // aggregation output attributes keep only the LAST path segment,
        // so downstream nodes could not re-reference the struct path
        val named = argStrs(n, env) ++ optStrs(n, "fields", env)
        val (df3, fieldKeys) = named.foldLeft((df2, Seq.empty[String])) {
          case ((d, ks), f) if f.contains(".") =>
            val k = "_gkey_" + f.replace('.', '_')
            (d.withColumn(k, Paths.ref(f)), ks :+ k)
          case ((d, ks), f) => (d, ks :+ f)
        }
        ctx.copy(df = df3, keys = ctx.keys ++ fieldKeys ++ lambdaKeys)
      }),
    // NOTE: no .align here — esp_win_time.erl options are period/every/
    // fill_period only (alignment is win_clock's); passing it is an
    // option error exactly as in the reference
    "win_time" -> NodeDef(Some(Point), Batch,
      Set("period", "every", "fill_period"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        // each option defaults to the other (esp_win_time.erl:40 — period
        // undefined → every; every has no own default beyond period)
        val periodOpt = optDurMs(n, "period", env)
        val everyOpt = optDurMs(n, "every", env)
        val period = periodOpt.orElse(everyOpt)
          .getOrElse(throw DfsError("win_time: .period or .every"))
        val every = everyOpt.getOrElse(period)
        val fill = n.options.contains("fill_period")
        ctx.copy(win = Some(Win("time", period, every, fill)), io = Batch)
      }),
    "win_session" -> NodeDef(Some(Point), Batch,
      Set("session_timeout"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val gap = optDurMs(n, "session_timeout", env)
          .getOrElse(throw DfsError("win_session: .session_timeout"))
        ctx.copy(win = Some(Win("session", gap, gap, fillPeriod = false)),
          io = Batch)
      }),
    // fill_period on a count window is vacuous in batch (the first
    // window is full by construction) — accepted for _q script parity
    "win_event" -> NodeDef(Some(Point), Batch,
      Set("period", "every", "fill_period"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        def cnt(name: String): Option[Long] =
          optVals(n, name, env).headOption.map {
            case VNum(v, _) => v.toLong
            case VLong(l) => l
            // duration literal coerces to its ms count — some reference
            // scripts write win_event().period(5s) (tcp_conveyor_track.dfs)
            case VDur(ms, _) => ms
            case v => throw DfsError(s"option '$name': expected count, got $v")
          }
        // every defaults to 4, period defaults to every
        // (esp_win_event.erl:29 options, :35 init)
        val every = cnt("every").getOrElse(4L)
        val period = cnt("period").getOrElse(every)
        ctx.copy(win = Some(Win("count", period, every, fillPeriod = false)),
          io = Batch)
      }),
    "batch" -> NodeDef(Some(Both), Batch, Set("size", "timeout", "name"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val size = optNum(n, "size", env)
          .orElse(n.args.map(resolve(_, env.defs))
            .collectFirst { case VNum(v, _) => v; case VLong(l) => l.toDouble })
          .getOrElse(throw DfsError("batch: .size")).toLong
        ctx.copy(win = Some(Win("count", size, size, fillPeriod = false)),
          io = Batch)
      }),
    "group_union" -> NodeDef(Some(Both), Both, Set.empty,
      (c, n, _) => requireCtx(c, n.name).copy(keys = Nil)),

    // ---- aggregations (§2.4, batch → point) ----
    "aggregate" -> NodeDef(Some(Batch), Point,
      Set("fields", "functions", "as", "keep", "keep_tail", "approx"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val fields = optStrs(n, "fields", env)
        val funcs = optStrs(n, "functions", env)
        val as = optStrs(n, "as", env)
        if (fields.size != funcs.size || fields.size != as.size)
          throw DfsError("aggregate: fields/functions/as must be same length")
        // dotted output aliases nest into structs (faxe field paths):
        // aggregate under flat temp names, then Paths.set each into place
        val flat = as.zipWithIndex.map { case (a, i) =>
          if (a.contains(".")) s"_agg$i" else a
        }
        val specs = fields.lazyZip(funcs).lazyZip(flat).map(Aggregate.Spec(_, _, _))
        val agg0 = aggregateWithWindow(ctx, specs, optFlag(n, "approx", env))
        val restructured = as.zip(flat).filter { case (a, f) => a != f }
          .foldLeft(agg0) { case (d, (a, f)) =>
            Paths.set(d, a, col(s"`$f`")).drop(f)
          }
        ctx.copy(df = restructured, win = None, io = Point,
          ts = "", tsMs = aggEventTime(ctx))
      }),
    // .keep_last accepted like count_change's: batch keeps keyed
    // continuity by design (the reference flag resets it per window)
    "percentile" -> NodeDef(Some(Batch), Point,
      Set("fields", "as", "at", "approx", "keep_last"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val fields = optStrs(n, "fields", env)
        if (fields.isEmpty) throw DfsError("percentile: .fields")
        // .at defaults to 75 and .as to the field names, per
        // esp_percentile.erl:26-40 ({at, integer, 75}; As undefined →
        // Fields; lists:zip3 errors on arity mismatch)
        val as = optStrs(n, "as", env) match {
          case Nil => fields
          case a if a.size == fields.size => a
          case _ => throw DfsError("percentile: .as arity must match .fields")
        }
        val at = optNum(n, "at", env).getOrElse(75.0) / 100.0
        // .approx(true): the t-digest sketch — fixed-size per-group state
        // instead of a full group sort (the 100 TB default, SCALE.md)
        val aggs = fields.zip(as).map { case (f, a) =>
          (if (optFlag(n, "approx", env))
            graft.operators.agg.AggFunctions.approxPercentile(Paths.ref(f), at)
          else graft.operators.agg.AggFunctions.percentile(Paths.ref(f), at))
            .as(a)
        }
        ctx.copy(df = groupedAgg(ctx, aggs), win = None, io = Point,
          ts = "", tsMs = aggEventTime(ctx))
      }),

    // ---- branches (§2.1 case / if) ----
    "case" -> bt(Set("lambdas", "values", "as", "default", "json")) {
      (ctx, n, env) =>
      // branch conditions are positional or `.lambdas(...)` (esp_case
      // options lambda_list, esp_case.erl:29)
      val tests = (argLambdas(n, env) ++ optLambdas(n, "lambdas", env))
        .map(lambdaColumn(_, env.defs))
      val values = optVals(n, "values", env)
        .map(v => lambdaColumn(valueToLit(v), env.defs))
      if (tests.size != values.size)
        throw DfsError("case: lambda count must match .values arity")
      val default = optVals(n, "default", env).headOption
        .map(v => lambdaColumn(valueToLit(v), env.defs))
        .getOrElse(lit(null))
      val as = optStr(n, "as", env).getOrElse(throw DfsError("case: .as"))
      Transforms.caseWhen(ctx.df, as, tests.zip(values), default)
    },
    "if" -> bt(Set("test", "then", "else", "as")) { (ctx, n, env) =>
      // the condition is positional or `.test(lambda)` (esp_if.erl:26)
      val test = (argLambdas(n, env) ++ optLambdas(n, "test", env))
        .headOption
        .getOrElse(throw DfsError("if needs a lambda"))
      def valOf(o: String) = optVals(n, o, env).headOption
        .map(v => lambdaColumn(valueToLit(v), env.defs))
      Transforms.ifThen(ctx.df,
        optStr(n, "as", env).getOrElse(throw DfsError("if: .as")),
        lambdaColumn(test, env.defs),
        valOf("then").getOrElse(throw DfsError("if: .then")),
        valOf("else").getOrElse(lit(null))) // no .else → NULL (if.dfs)
    },

    // ---- state ops (§2.6) ----
    "state_count" -> pt(Set("as", "lambda")) { (ctx, n, env) =>
      val state = (argLambdas(n, env) ++ optLambdas(n, "lambda", env))
        .headOption.getOrElse(throw DfsError("state_count needs a lambda"))
      StateOps.stateCount(ctx.df, lambdaColumn(state, env.defs),
        optStr(n, "as", env).getOrElse("state_count"),
        keyCols(ctx), orderCols(ctx))
    },
    // .emit_total accepted: the reference stores the flag but its
    // process/3 never reads it (esp_state_duration.erl:34,49-61)
    "state_duration" -> pt(Set("as", "unit", "lambda", "emit_total")) {
      (ctx, n, env) =>
      val state = (argLambdas(n, env) ++ optLambdas(n, "lambda", env))
        .headOption.getOrElse(throw DfsError("state_duration needs a lambda"))
      StateOps.stateDuration(ctx.df, lambdaColumn(state, env.defs),
        col(ctx.tsMs), optStr(n, "as", env).getOrElse("state_duration"),
        keyCols(ctx), orderCols(ctx))
    },
    // full esp_state_change.erl:45-57 option surface accepted; the batch
    // analog emits run-length rows carrying both edges — .enter/.leave
    // narrowing and _keep/_as decoration are projections on that output
    "state_change" -> pt(Set("as", "lambda", "enter_as", "leave_as",
      "state_id_as", "enter", "leave", "enter_keep", "leave_keep", "keep",
      "prefix", "unit")) { (ctx, n, env) =>
      val state = (argLambdas(n, env) ++ optLambdas(n, "lambda", env))
        .headOption.getOrElse(throw DfsError("state_change needs a lambda"))
      StateOps.stateChange(ctx.df, lambdaColumn(state, env.defs),
        optStr(n, "as", env).getOrElse("state_change"),
        keyCols(ctx), orderCols(ctx))
    },
    // .trigger_on_value/.fields/.field_values decorate the emitted alert
    // point in the reference — the batch analog emits the gap rows
    // silent_time/repeat_*/no_forward are heartbeat pacing knobs
    // (esp_deadman.erl options) — timer-driven, accepted; the batch
    // analog stays gap detection on the event-time axis
    "deadman" -> bt(Set("trigger_on_value",
      "fields", "field_values", "timeout", "silent_time",
      "repeat_last", "repeat_with_new_ts", "repeat_interval",
      "no_forward")) { (ctx, n, env) =>
      val thr = optDurMs(n, "timeout", env)
        .orElse(n.args.map(resolve(_, env.defs))
          .collectFirst { case VDur(ms, _) => ms })
        .getOrElse(throw DfsError("deadman: .timeout"))
      StateOps.deadmanGaps(ctx.df, col(ctx.tsMs), thr,
        keyCols(ctx), orderCols(ctx))
    },
    // .keep/.emit_every/.type/.as accepted: emit pacing and buffer typing
    // are stream concerns — the batch analog always materializes the
    // final buffer state with all columns
    "collect" -> bt(Set("key_fields", "add", "remove", "update", "keep",
      "keep_as", "emit_every", "type", "as", "emit_unchanged",
      "include_removed", "max_age", "max_ts_age", "merge", "tag_added",
      "tag_removed", "tag_updated", "tag_value", "update_mode")) {
      (ctx, n, env) =>
      val keys = optStrs(n, "key_fields", env)
      if (keys.isEmpty) throw DfsError("collect: .key_fields")
      val addRem = (optLambdas(n, "add", env).headOption,
        optLambdas(n, "remove", env).headOption)
      val isUpsert = addRem._1.isDefined && addRem._2.isDefined
      val buffer = addRem match {
        case (Some(a), Some(r)) =>
          graft.operators.join.Joins.collectUpsert(ctx.df, keys, ctx.tsMs,
            lambdaColumn(a, env.defs), lambdaColumn(r, env.defs))
        case _ =>
          graft.operators.join.Joins.collectLatest(ctx.df,
            keys.map(Paths.ref), orderCols(ctx))
      }
      // .max_age evicts entries older than the NEWEST buffer entry minus
      // the age (esp_collect's timer eviction anchored at the batch
      // analog's end of time — same anchor as collect_unique). The bound
      // is a lazy 1-row max-aggregate broadcast (the fillPeriod
      // scalar-subquery form), never a driver action. For the keyed-
      // latest buffer the bound aggregates the INPUT, not the buffer —
      // the latest-per-key set contains the globally newest row, so the
      // maxima agree and the input-side max is a pure scan-side partial
      // aggregate instead of a second groupBy (measured 2x on the node,
      // BENCH_NOTES_r9). The upsert form must anchor on the buffer: a
      // trailing remove row is not a buffer entry.
      optDurMs(n, "max_age", env)
        .orElse(optDurMs(n, "max_ts_age", env)) match {
        case Some(age) =>
          val boundSrc = if (isUpsert) buffer else ctx.df
          val bound = boundSrc.agg(max(col(ctx.tsMs)).as("_newest"))
          buffer.join(broadcast(bound))
            .filter(col(ctx.tsMs) >= col("_newest") - age)
            .drop("_newest")
        case None => buffer
      }
    },
    // reference option names: .states (lambda list), .within (per-step
    // duration list), .strict, .output (esp_state_sequence.erl options);
    // positional lambdas + .timeouts kept as aliases. Stream-ref args
    // (cond_test1.dfs `state_sequence(in2, in3)`) are additional INPUT
    // streams — faxe wires them as extra in-edges; relationally they
    // union into the sequenced frame.
    "state_sequence" -> pt(Set("timeouts", "strict", "states", "within",
      "output")) { (ctx, n, env) =>
      val extraIn = n.args.collect { case VRef(r) => r }
        .filter(env.hasFrame)
      val input = extraIn.foldLeft(ctx.df)((d, r) =>
        d.unionByName(env.frames(r).df, allowMissingColumns = true))
      val preds = (argLambdas(n, env) ++ optLambdas(n, "states", env))
        .map(lambdaColumn(_, env.defs))
      val tos0 = (optVals(n, "timeouts", env) ++ optVals(n, "within", env))
        .map {
          case VDur(ms, _) => ms
          case VNum(v, _) => v.toLong
          case VLong(l) => l
          case v => throw DfsError(s"state_sequence: bad timeout $v")
        }
      // no .within → unconstrained gaps (half a year per step)
      val tos = if (tos0.nonEmpty) tos0
        else Seq.fill(math.max(0, preds.size - 1))(15778800000L)
      StateOps.stateSequence(input, preds, tos, col(ctx.tsMs),
        keyCols(ctx), orderCols(ctx))
    },
    "top" -> bt(Set("field", "n")) { (ctx, n, env) =>
      topBottom(ctx, n, env, desc = true)
    },
    "bottom" -> bt(Set("field", "n")) { (ctx, n, env) =>
      topBottom(ctx, n, env, desc = false)
    },
    "jsn_select" -> bt(Set("table", "keys", "fields", "as", "from",
      "where")) { (ctx, n, env) =>
      // reference surface (esp_jsn_select.erl:33-39): .from is a json
      // document / mem literal and .where an erlang tuple_list — both
      // are the in-actor document-select form; the engine binding selects
      // from a corpus TABLE with an equi-key instead, which is the
      // distributed (broadcast-join) shape. .fields/.as work identically.
      if (n.options.contains("from") || n.options.contains("where"))
        throw DfsError("jsn_select: .from/.where (in-actor document " +
          "select) — use .table/.keys, the engine's broadcast-lookup form")
      val table = optStr(n, "table", env)
        .getOrElse(throw DfsError("jsn_select: .table"))
      val ks = optStrs(n, "keys", env)
      if (ks.size != 2) throw DfsError("jsn_select: .keys(streamKey, lookupKey)")
      val lookup = Tables.load(env.spark, env.dir, table)
      val fs = optStrs(n, "fields", env)
      val as = optStrs(n, "as", env)
      if (as.nonEmpty && as.size != fs.size)
        throw DfsError("jsn_select: .as arity must match .fields")
      val proj = fs match {
        case Nil => lookup
        case _ if as.isEmpty =>
          lookup.select((ks(1) +: fs).distinct.map(col): _*)
        case _ => lookup.select((col(ks(1)) +:
          fs.zip(as).map { case (f, a) => col(f).as(a) }).toIndexedSeq: _*)
      }
      graft.operators.join.Mem.lookup(ctx.df, proj,
        col(ks.head) === col(ks(1)))
    },
    "change_detect" -> bt(Set("fields", "reset_timeout", "timeout")) { (ctx, n, env) =>
      // no .fields = compare the whole point (esp_change_detect.erl:42
      // fields default undefined — map equality, any change passes);
      // with .fields the semantics flip to the monitored-veto form
      // (check/4, eunit-pinned): EVERY defined monitored field must
      // change or the point is suppressed
      optStrs(n, "fields", env) match {
        case Nil =>
          val fs = ctx.df.columns.toSeq
            .filterNot(c0 => c0 == ctx.ts || c0 == ctx.tsMs).map(col)
          StateOps.changeDetect(ctx.df, fs, keyCols(ctx), orderCols(ctx))
        case some =>
          StateOps.changeDetectMonitored(ctx.df, some.map(Paths.ref),
            keyCols(ctx), orderCols(ctx))
      }
    },
    "value_diff" -> pt(Set("field", "fields", "as", "mode", "default")) { (ctx, n, env) =>
      val fs = optStrs(n, "field", env) ++ optStrs(n, "fields", env)
      if (fs.isEmpty) throw DfsError("value_diff: .field(s)")
      // .as undefined → the diff OVERWRITES each field under its own name
      // (esp_value_diff.erl:45 As1 = Fields); mode defaults to 'abs'
      // (esp_value_diff.erl:35 MODE_ABS)
      val as = optStrs(n, "as", env) match {
        case a if a.size == fs.size => a
        case Nil => fs
        case _ => throw DfsError("value_diff: .as arity must match .fields")
      }
      val mode = optStr(n, "mode", env).getOrElse("abs")
      // the first point per key has no previous value: it carries
      // .default when given, else its CURRENT field value — never NULL
      // (esp_value_diff.erl:73-74,85-86 default/2)
      val dflt = optVals(n, "default", env).headOption.map(valueLit(_, env))
      fs.zip(as).foldLeft(ctx.df) { case (d, (f, a)) =>
        val diffed = StateOps.valueDiff(d, Paths.ref(f), mode, "_vd",
          keyCols(ctx), orderCols(ctx))
        // a NULL current value has no diff field at all in the reference
        // ({K, undefined} is skipped, esp_value_diff.erl:65-66) — it must
        // stay NULL, never be fabricated into .default
        val firstOrDiff = coalesce(col("_vd"), dflt.getOrElse(Paths.ref(f)))
        Paths.set(diffed, a,
          when(Paths.ref(f).isNull, lit(null)).otherwise(firstOrDiff))
          .drop("_vd")
      }
    },
    "time_diff" -> bt(Set("as", "default")) { (ctx, n, env) =>
      // as defaults to 'timediff', the FIRST point carries .default
      // (0 unless given) instead of an absent value
      // (esp_time_diff.erl:31-43)
      val as = optStr(n, "as", env).getOrElse("timediff")
      val dflt = optVals(n, "default", env).headOption
        .map(valueLit(_, env)).getOrElse(lit(0L))
      StateOps.timeDiff(ctx.df, col(ctx.tsMs), as,
          keyCols(ctx), orderCols(ctx))
        .withColumn(as, coalesce(col(s"`$as`"), dflt))
    },

    // ---- stream combination (§2.3) ----
    "union" -> NodeDef(Some(Point), Point, Set.empty,
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val others = n.args.collect { case VRef(r) => env.frames(r).df }
        ctx.copy(df = others.foldLeft(ctx.df)(_.unionByName(_)))
      }),
    "combine" -> NodeDef(Some(Point), Point,
      Set("keys", "fields", "prefix", "prefix_delimiter", "aliases",
        "tags", "nofill", "tolerance", "merge_field"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val rightRef = n.args.collectFirst { case VRef(r) => r }
          .getOrElse(throw DfsError("combine needs a stream reference"))
        val right = env.frames(rightRef)
        val keys = optStrs(n, "keys", env)
        val tol = optDurMs(n, "tolerance", env)
        // cold-buffer rule (esp_combine.erl:94-95): a trigger point that
        // arrives before any port-2 value is DROPPED ("No output is
        // given, if there has never arrived a value on port 2") — with
        // `.nofill` it passes through UNCHANGED instead (combine/merge
        // with `undefined` return the point as-is). In batch, "cold" =
        // no right row at-or-before the trigger ts (within .tolerance —
        // a graft extension; the reference always takes the latest
        // buffered row). Landed fields therefore gate on match-ness:
        // a colliding left field is never overwritten with NULL.
        val noFill = optFlag(n, "nofill", env)
        def coldDrop(joined: DataFrame, rts: String): DataFrame =
          if (noFill) joined else joined.filter(col(s"`$rts`").isNotNull)
        def resolvable(df: org.apache.spark.sql.DataFrame, p: String) =
          try { df.select(Paths.ref(p)); true }
          catch { case _: org.apache.spark.sql.AnalysisException => false }
        optStr(n, "merge_field", env) match {
          case Some(mf) =>
            // combine_merge.dfs: enrich-then-merge the field instead of
            // prefixing (numbers add / strings concat / structs deep-merge).
            // A side that does not carry the field is `undefined` in the
            // reference — the merge degenerates to the other side's value
            // (or a pass-through when neither side has it).
            (resolvable(ctx.df, mf), resolvable(right.df, mf)) match {
              case (_, false) if noFill => ctx // nothing to merge in
              case (_, false) =>
                // still subject to the cold-buffer rule: join on the ts
                // alone to find which trigger rows had a warm buffer
                val joined = Joins.asOfLatest(ctx.df, right.df, keys,
                  ctx.tsMs, right.tsMs, Seq.empty, "_m_", tol)
                ctx.copy(df = coldDrop(joined, s"_m_${right.tsMs}")
                  .drop(s"_m_${right.tsMs}"))
              case (leftHas, true) =>
                val joined = coldDrop(Joins.asOfLatest(ctx.df, right.df,
                  keys, ctx.tsMs, right.tsMs, Seq(mf), "_m_", tol),
                  s"_m_${right.tsMs}")
                val merged =
                  if (leftHas) Joins.mergeValues(joined, mf, s"_m_$mf", mf)
                  else Paths.set(joined, mf, col(s"`_m_$mf`"))
                ctx.copy(df = merged.drop(s"_m_$mf", s"_m_${right.tsMs}"))
            }
          case None =>
            val fields = optStrs(n, "fields", env) ++ optStrs(n, "tags", env)
            // taken-field naming (esp_combine.erl:76-88): with .prefix the
            // name is prefix <> delimiter <> field (delimiter defaults to
            // "_", PREFIX_DEL); with .aliases the alias names it exactly;
            // with NEITHER the field keeps its OWN name — written into the
            // point, overwriting a same-named left field
            val aliases = optStrs(n, "aliases", env)
            val prefixOpt = optStr(n, "prefix", env)
              .map(_ + optStr(n, "prefix_delimiter", env).getOrElse("_"))
            prefixOpt match {
              case Some(prefix) =>
                ctx.copy(df = coldDrop(Joins.asOfLatest(ctx.df, right.df,
                  keys, ctx.tsMs, right.tsMs, fields, prefix, tol),
                  s"$prefix${right.tsMs}")
                  .drop(s"$prefix${right.tsMs}"))
              case None =>
                // land under a temp prefix, then set into the final name
                // (own name or alias) so same-named left fields overwrite
                val joined = coldDrop(Joins.asOfLatest(ctx.df, right.df,
                  keys, ctx.tsMs, right.tsMs, fields, "_cmb_", tol),
                  s"_cmb_${right.tsMs}")
                val matched = col(s"`_cmb_${right.tsMs}`").isNotNull
                val names =
                  if (aliases.nonEmpty) aliases.padTo(fields.size, "").zip(fields)
                    .map { case (a, f) => if (a.nonEmpty) a else f }
                  else fields
                val renamed = names.zip(fields).foldLeft(joined) {
                  case (d, (out, f)) =>
                    val rCol = col(s"`_cmb_$f`")
                    // under .nofill unmatched rows survive — gate the
                    // landing so a colliding left field keeps its value
                    // (pass-through semantics), same scheme as
                    // [[landOwnCols]]
                    val v =
                      if (noFill && resolvable(ctx.df, out)) {
                        val lt = d.select(Paths.ref(out)).schema.head.dataType
                        val rt = d.schema(s"_cmb_$f").dataType
                        val unifiable =
                          org.apache.spark.sql.graftbridge.ColumnBridge
                            .sameType(lt, rt) ||
                            (lt.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
                              rt.isInstanceOf[org.apache.spark.sql.types.NumericType])
                        if (unifiable) when(matched, rCol)
                          .otherwise(Paths.ref(out))
                        else when(matched, rCol.cast("string"))
                          .otherwise(Paths.ref(out).cast("string"))
                      } else rCol
                    Paths.set(d, out, v).drop(s"_cmb_$f")
                }
                ctx.copy(df = renamed.drop(s"_cmb_${right.tsMs}"))
            }
        }
      }),

    // `join` — conflate rows from two streams whose timestamps align within
    // .tolerance on the stream key (ref: esp_join.erl:50-248; the actor's
    // nearest-ts buffer, :93,199-206, becomes the single-shuffle
    // asOfNearest). Modes: prefix join (default; right fields land under
    // .prefix, :182-196), .merge_field (numbers add / strings concat /
    // maps merge, :166-179,232-241), .full/.fill (complete rows only vs
    // fill partials, :61-70,146-155). .missing_timeout is wall-clock
    // stream pacing — accepted and ignored in batch.
    "join" -> NodeDef(Some(Point), Point,
      Set("joined", "prefix", "merge_field", "missing_timeout", "tolerance",
        "fill", "full"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val rightRef = (n.args.collect { case VRef(r) => r } ++
          optStrs(n, "joined", env)).headOption
          .getOrElse(throw DfsError("join needs a stream reference: |join(other)"))
        val right = env.frames(rightRef)
        val tol = optDurMs(n, "tolerance", env).getOrElse(2000L) // ref default 2s
        val (_, full, fillVal) = fillAndFull(n, env)
        optStr(n, "merge_field", env) match {
          case Some(mf) =>
            val joined = Joins.asOfNearest(ctx.df, right.df, ctx.keys,
              ctx.tsMs, right.tsMs, Seq(mf), "_m_", Some(tol))
            val matched = col(s"_m_${right.tsMs}")
            val base = if (full) joined.filter(matched.isNotNull) else joined
            ctx.copy(df = Joins.mergeValues(base, mf, s"_m_$mf", mf)
              .drop(s"_m_$mf", s"_m_${right.tsMs}"))
          case None =>
            // per-port prefixes (esp_join.erl:52 — default ["",""]; port
            // order: own input first, then joined): 2+ entries prefix the
            // LEFT value fields too; the empty default lands right fields
            // under their OWN names, overwriting same-named left fields
            // (esp_join.erl:183-196 join/3 set_fields fold)
            val prefixes = optStrs(n, "prefix", env)
            val leftDf = prefixes.headOption
              .filter(lp => prefixes.size > 1 && lp.nonEmpty) match {
              case Some(lp) =>
                ctx.df.columns.toSeq
                  .filterNot(c0 => ctx.keys.contains(c0) ||
                    c0 == ctx.tsMs || c0 == ctx.ts)
                  .foldLeft(ctx.df)((d, c0) => d.withColumnRenamed(c0, lp + c0))
              case None => ctx.df
            }
            val prefix = (if (prefixes.size > 1) prefixes.drop(1)
              else prefixes).headOption.getOrElse("")
            val vcols = right.df.columns.toSeq
              .filterNot(c0 => ctx.keys.contains(c0) || c0 == right.tsMs)
            if (prefix.nonEmpty) {
              val joined = Joins.asOfNearest(leftDf, right.df, ctx.keys,
                ctx.tsMs, right.tsMs, vcols, prefix, Some(tol))
              val matched = col(s"$prefix${right.tsMs}").isNotNull
              val filled = vcols.foldLeft(joined) { (d, f) =>
                fillFor(fillVal, env, d.schema(s"$prefix$f").dataType) match {
                  case Some(fl) => d.withColumn(s"$prefix$f",
                    when(matched, col(s"`$prefix$f`")).otherwise(fl))
                  case None => d
                }
              }
              ctx.copy(df = if (full) filled.filter(matched) else filled)
            } else {
              // own-name landing ([[landOwnCols]]): ts/tsMs are point
              // metadata, not fields (same rule as the join2 left
              // prefix) — the left stream keeps its own clock, and a
              // right DATA field named like the left's time columns
              // must not rewrite them either
              val ownCols = vcols.filterNot(c0 => c0 == right.ts ||
                c0 == ctx.ts || c0 == ctx.tsMs)
              val joined = Joins.asOfNearest(leftDf, right.df, ctx.keys,
                ctx.tsMs, right.tsMs, ownCols, "_j_", Some(tol))
              val matched = col(s"_j_${right.tsMs}").isNotNull
              val base = if (full) joined.filter(matched) else joined
              val landed =
                landOwnCols(base, ownCols, "_j_", matched, full, fillVal, env)
              ctx.copy(df = landed.drop(s"_j_${right.tsMs}"))
            }
        }
      }),

    // join2 — the multi-stream join variant (other/join2.dfs): N joined
    // streams, a per-stream .prefix list (position 0 prefixes the LEFT
    // stream's value columns), shared .tolerance; folds the same
    // single-shuffle as-of nearest join per stream. NOTE: unlike join,
    // there is no .fill here — esp_join2.erl:61 `{full, boolean, true}
    // %% replaces 'fill'` dropped it, so passing .fill is an option
    // error exactly as in the reference.
    "join2" -> NodeDef(Some(Point), Point,
      Set("joined", "prefix", "merge_field", "missing_timeout", "tolerance",
        "full"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val refs = n.args.collect { case VRef(r) => r } ++
          optStrs(n, "joined", env)
        if (refs.isEmpty)
          throw DfsError("join2 needs stream references: |join2(s1, s2)")
        val tol = optDurMs(n, "tolerance", env).getOrElse(2000L)
        val prefixes = optStrs(n, "prefix", env)
        val left0 =
          prefixes.headOption.filter(_ => prefixes.size > refs.size) match {
            case Some(lp) =>
              // ts/tsMs are point METADATA, not value fields (the
              // reference prefixes fields only) — renaming them would
              // orphan ctx.ts for every downstream time-based node
              ctx.df.columns.toSeq
                .filterNot(c0 => ctx.keys.contains(c0) || c0 == ctx.tsMs ||
                  c0 == ctx.ts)
                .foldLeft(ctx.df)((d, c0) => d.withColumnRenamed(c0, lp + c0))
            case None => ctx.df
          }
        val rightPrefixes =
          if (prefixes.size > refs.size) prefixes.drop(1) else prefixes
        // prefixes default EMPTY per port (esp_join2.erl options) — an
        // empty prefix lands the right's fields under their own names;
        // full/fill follow the shared FullFill truth table, and
        // full=true (default) emits only rows where EVERY joined stream
        // matched (esp_join2.erl:61,136-138 is_full_row)
        val (_, full, fillVal) = fillAndFull(n, env)
        val rights = refs.zipWithIndex.map { case (r, i) =>
          (env.frames(r), rightPrefixes.lift(i).getOrElse(""), s"_j${i}_")
        }
        optStr(n, "merge_field", env) match {
          case Some(mf) =>
            // merge mode (esp_join2 conflate/merge): the merge field of
            // every matched stream folds into the left's value, port
            // order (numbers add / strings concat / maps merge)
            val merged = rights.foldLeft(ctx.df) { case (d, (right, _, tmp)) =>
              val j = Joins.asOfNearest(d, right.df, ctx.keys, ctx.tsMs,
                right.tsMs, Seq(mf), tmp, Some(tol))
              val matched = col(s"$tmp${right.tsMs}").isNotNull
              val base = if (full) j.filter(matched) else j
              Joins.mergeValues(base, mf, s"$tmp$mf", mf)
                .drop(s"$tmp$mf", s"$tmp${right.tsMs}")
            }
            ctx.copy(df = merged)
          case None =>
            val joined = rights.foldLeft(left0) { case (d, (right, prefix, tmp)) =>
              val vcols = right.df.columns.toSeq
                .filterNot(c0 => ctx.keys.contains(c0) || c0 == right.tsMs)
              if (prefix.nonEmpty)
                Joins.asOfNearest(d, right.df, ctx.keys, ctx.tsMs, right.tsMs,
                  vcols, prefix, Some(tol))
              else
                Joins.asOfNearest(d, right.df, ctx.keys, ctx.tsMs, right.tsMs,
                  vcols.filterNot(c0 => c0 == right.ts || c0 == ctx.ts ||
                    c0 == ctx.tsMs), tmp, Some(tol))
            }
            def matchCol(right: Ctx, prefix: String, tmp: String) =
              col(s"${if (prefix.nonEmpty) prefix else tmp}${right.tsMs}")
                .isNotNull
            val base =
              if (full)
                joined.filter(rights.map((matchCol _).tupled).reduce(_ && _))
              else joined
            // land the own-name (empty-prefix) streams via the shared
            // helper; fold order = port order, so a later stream's
            // same-named field wins (the reference's set_fields fold).
            // The LEFT's clock columns (ctx.ts/ctx.tsMs) are excluded
            // from landing along with the right's — a right data field
            // named like the left's time column must not rewrite it.
            val landed = rights.foldLeft(base) {
              case (d, (right, prefix, tmp)) if prefix.isEmpty =>
                val ownCols = right.df.columns.toSeq
                  .filterNot(c0 => ctx.keys.contains(c0) ||
                    c0 == right.tsMs || c0 == right.ts ||
                    c0 == ctx.ts || c0 == ctx.tsMs)
                landOwnCols(d, ownCols, tmp, matchCol(right, prefix, tmp),
                    full, fillVal, env)
                  .drop(s"$tmp${right.tsMs}")
              case (d, _) => d
            }
            ctx.copy(df = landed)
        }
      }),

    // collect_fields — latest value of each listed field combined into one
    // row per stream key (ref: esp_collect_fields.erl:33-102; batch analog
    // = the actor cache's final state).
    "collect_fields" -> NodeDef(Some(Point), Point,
      Set("fields", "default", "emit_unchanged", "keep", "keep_as"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val fields = optStrs(n, "fields", env)
        if (fields.isEmpty) throw DfsError("collect_fields: .fields")
        val default = optVals(n, "default", env).headOption
          .map(v => lambdaColumn(valueToLit(v), env.defs))
        val aggs = fields.map { f =>
          val fc = Paths.ref(f)
          // latest NON-NULL value: null rows get a null ordering key, which
          // max_by ignores — matches the actor skipping absent fields.
          val latest = max_by(fc, when(fc.isNotNull, col(ctx.tsMs)))
          default.fold(latest)(d => coalesce(latest, d)).as(f)
        }
        val out =
          if (ctx.keys.nonEmpty)
            ctx.df.groupBy(keyCols(ctx): _*).agg(aggs.head, aggs.tail: _*)
          else ctx.df.agg(aggs.head, aggs.tail: _*)
        ctx.copy(df = out, win = None)
      }),

    // collect_unique — latest row per (stream key, discriminant field);
    // .max_age evicts buffer entries older than the newest entry minus the
    // age (ref: esp_collect_unique.erl:51-122). The age filter runs on the
    // deduplicated (small) buffer state, not the raw stream.
    "collect_unique" -> NodeDef(Some(Point), Point,
      Set("field", "min_vals", "keep", "keep_as", "as", "max_age"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val f = optStr(n, "field", env)
          .orElse(n.args.map(resolve(_, env.defs))
            .collectFirst { case VStr(v) => v })
          .getOrElse(throw DfsError("collect_unique: .field"))
        val deduped = Joins.collectUnique(ctx.df,
          keyCols(ctx) :+ Paths.ref(f), orderCols(ctx))
        val out = optDurMs(n, "max_age", env) match {
          case Some(age) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols(ctx): _*)
            deduped.withColumn("_newest", max(col(ctx.tsMs)).over(w))
              .filter(col(ctx.tsMs) >= col("_newest") - age)
              .drop("_newest")
          case None => deduped
        }
        ctx.copy(df = out)
      }),

    // mem — flow-wide value memory: gathers a SMALL scalar/list from the
    // stream (and/or .default pre-population) into MemStore, readable from
    // any later-planned lambda via mem()/ls_mem() (ref: esp_mem.erl:1-13,
    // 30-53). The single-row aggregate is materialized driver-side at plan
    // time — the literal analog of the reference's ETS table, same cost
    // class as a broadcast dim; the stream itself passes through unchanged.
    "mem" -> NodeDef(Some(Both), Both,
      Set("field", "type", "key", "default", "default_json"),
      (c, n, env) => {
        val typ = optStr(n, "type", env).getOrElse("single")
        val field = optStr(n, "field", env)
        val key = optStr(n, "key", env).orElse(field).getOrElse("StreamLookup")
        val defaults = optVals(n, "default", env).map(valueAny)
        if (defaults.nonEmpty) {
          if (n.options.contains("default_json"))
            // .default_json: the default string parses as a JSON map/list
            // (esp_mem.erl:40-53 prepare_default)
            graft.core.MemStore.putJson(key, defaults.head.toString)
          else if (typ == "single") graft.core.MemStore.put(key, defaults.head)
          else graft.core.MemStore.putList(key, defaults)
        }
        // standalone form: a chain-starting mem only pre-populates
        // (picking_tracking.dfs:6) — there is no stream to gather from
        val ctx = c.getOrElse(
          Ctx(env.spark.emptyDataFrame, Nil, None, Point, "", ""))
        if (c.isEmpty && field.isDefined)
          throw DfsError("mem: .field needs an upstream stream to gather from")
        field.foreach { fName =>
          val fc = Paths.ref(fName)
          val ord =
            if (ctx.tsMs.nonEmpty) col(ctx.tsMs)
            else fc // no event time: value order (deterministic)
          typ match {
            case "single" =>
              graft.core.MemStore.put(key,
                ctx.df.agg(max_by(fc, ord)).head.get(0))
            case "list" =>
              val rows = ctx.df
                .agg(sort_array(collect_list(struct(ord.as("_o"), fc.as("_v")))))
                .head.getSeq[org.apache.spark.sql.Row](0)
              graft.core.MemStore.putList(key, rows.map(_.get(1)))
            case "set" =>
              graft.core.MemStore.putList(key,
                ctx.df.agg(sort_array(collect_set(fc))).head.getSeq[Any](0))
            case t => throw DfsError(s"mem: unknown type '$t'")
          }
        }
        ctx
      },
      optionalInput = true),

    // parser — payload string → declared fields; Spark-native format is
    // JSON with a .schema(ddl) (ref: esp_parser.erl:29-93; SURVEY §7.4
    // parser outputs need declared schemas). .changed drops rows whose
    // payload digest equals the previous row's (the crc32 dedup, :63-77).
    "parser" -> pt(Set("field", "as", "parser", "schema", "changed")) {
      (ctx, n, env) =>
        val f = optStr(n, "field", env).getOrElse(throw DfsError("parser: .field"))
        val parserName = optStr(n, "parser", env).getOrElse("json")
        if (!parserName.contains("json"))
          throw DfsError(s"parser '$parserName' not available — the " +
            "Spark-native payload format is JSON with a declared .schema(ddl)")
        val ddl = optStr(n, "schema", env)
          .getOrElse(throw DfsError("parser: .schema(ddl)"))
        val pre =
          if (!n.options.contains("changed")) ctx.df
          else {
            if (ctx.keys.isEmpty)
              throw DfsError("parser .changed needs group_by keys upstream")
            graft.operators.stateless.ParserOps.changedOnly(
              ctx.df, Paths.ref(f), keyCols(ctx), orderCols(ctx))
          }
        graft.operators.stateless.ParserOps.parseJson(pre, Paths.ref(f), ddl,
          optStr(n, "as", env).getOrElse("data"))
    },

    // state_change_bulk — enter/leave edges for several monitored states at
    // once (ref: esp_state_change_bulk semantics via lib/state_change.erl).
    // Two forms: positional lambdas + .as (explicit states), or the
    // reference's bulk form (esp_state_change_bulk.erl options) — every
    // subfield of .field compared against .state_value, minus
    // .exclude_fields; enter/leave edge naming knobs accepted.
    "state_change_bulk" -> pt(Set("as", "field", "state_value",
      "lambda_pattern", "exclude_fields", "enter_as", "leave_as",
      "state_id_as", "enter", "leave", "enter_keep", "leave_keep",
      "prefix", "unit")) { (ctx, n, env) =>
      val states: Seq[(String, Column)] = optStr(n, "field", env) match {
        case Some(path) =>
          val excl = optStrs(n, "exclude_fields", env).toSet
          val sv = optVals(n, "state_value", env).headOption
            .map(v => lambdaColumn(valueToLit(v), env.defs))
            .getOrElse(throw DfsError(
              "state_change_bulk: .state_value (with .field)"))
          // only scalar subfields are state candidates (a nested struct
          // can't equal a state value — the reference scans leaf values)
          val stype = ctx.df.select(Paths.ref(path).as("_s"))
            .schema.head.dataType match {
              case st: org.apache.spark.sql.types.StructType => st
              // a lenient-nulled path (the stream doesn't carry it): zero
              // fields to scan, zero emissions — like the reference
              case _: org.apache.spark.sql.types.NullType =>
                org.apache.spark.sql.types.StructType(Nil)
              case other => throw DfsError(
                s"state_change_bulk: '$path' is $other, not a struct")
            }
          val subs = stype.fields.toSeq.collect {
              case f if !f.dataType.isInstanceOf[
                    org.apache.spark.sql.types.StructType] &&
                  !f.dataType.isInstanceOf[
                    org.apache.spark.sql.types.ArrayType] &&
                  !f.dataType.isInstanceOf[
                    org.apache.spark.sql.types.MapType] => f.name
            }
            .filterNot(s0 => excl.contains(s"$path.$s0"))
          if (subs.isEmpty && stype.fields.nonEmpty)
            throw DfsError(s"state_change_bulk: no subfields under '$path'")
          subs.map(s0 => s0 -> (Paths.ref(s"$path.$s0") === sv))
        case None =>
          val lambdas = argLambdas(n, env).map(lambdaColumn(_, env.defs))
          val names = optStrs(n, "as", env)
          if (names.size != lambdas.size || lambdas.isEmpty)
            throw DfsError(
              "state_change_bulk: .as arity must match lambda count")
          names.zip(lambdas)
      }
      if (states.isEmpty) ctx.df.filter(lit(false))
      else StateOps.stateChangeBulk(ctx.df, states, keyCols(ctx), orderCols(ctx))
    },

    // triggered_timeout — emit trigger rows not followed by a cancel within
    // .timeout (ref: esp_triggered_timeout.erl:46-56). Batch analog is a
    // forward-looking window min; the wall-clock timer FSM lives in
    // graft.streaming.Streaming.triggeredTimeout.
    "triggered_timeout" -> pt(
      Set("timeout", "timeout_trigger", "cancel_trigger", "fields",
        "field_values", "cancel_fields", "cancel_field_values")) {
      (ctx, n, env) =>
      val to = optDurMs(n, "timeout", env)
        .getOrElse(throw DfsError("triggered_timeout: .timeout"))
      // stream-ref args (timeout_test1.dfs `triggered_timeout(in2)`) are
      // extra input streams, port-tagged so portless semantics survive
      // the relational merge
      val extraIn = n.args.collect { case VRef(r) => r }.filter(env.hasFrame)
      val tagged = extraIn.nonEmpty
      val base0 =
        if (!tagged) ctx.df
        else extraIn.foldLeft(ctx.df.withColumn("_port", lit(1))) {
          (d, r) => d.unionByName(
            env.frames(r).df.withColumn("_port", lit(2)),
            allowMissingColumns = true)
        }
      // field-match predicates (esp_triggered_timeout.erl:48-52
      // fields/field_values, same_length-checked): every listed field
      // must equal its value — the lambda-free trigger/cancel form
      def fieldMatch(fOpt: String, vOpt: String): Option[Column] = {
        val fs = optStrs(n, fOpt, env)
        val vs = optVals(n, vOpt, env)
        if (fs.isEmpty) None
        else if (fs.size != vs.size)
          throw DfsError(s"triggered_timeout: .$fOpt/.$vOpt same length")
        else Some(fs.zip(vs).map { case (f, v) =>
          Paths.ref(f) === valueLit(v, env)
        }.reduce(_ && _))
      }
      val trigOpt = (argLambdas(n, env) ++
        optLambdas(n, "timeout_trigger", env))
        .headOption.map(lambdaColumn(_, env.defs))
        .orElse(fieldMatch("fields", "field_values"))
      val cancelOpt = optLambdas(n, "cancel_trigger", env).headOption
        .map(lambdaColumn(_, env.defs))
        .orElse(fieldMatch("cancel_fields", "cancel_field_values"))
      // reference port/lambda matrix (esp_triggered_timeout.erl:82-101):
      // with a trigger lambda, ANY row it rejects cancels the pending
      // timer (the batch analog keeps an explicit .cancel_trigger as the
      // cancel set when given — the oracle-pinned form); without a
      // trigger, port-1 rows arm the timer and other-port rows (plus
      // cancel_trigger hits) cancel it
      val trig = trigOpt.getOrElse {
        if (!tagged) throw DfsError(
          "triggered_timeout: .timeout_trigger(lambda) or a second input")
        col("_port") === 1
      }
      val cancel = (trigOpt, cancelOpt) match {
        case (Some(_), Some(cl)) => cl
        case (Some(t), None) => !t
        case (None, Some(cl)) => cl || col("_port") =!= 1
        case (None, None) => col("_port") =!= 1
      }
      val out = StateOps.triggeredTimeout(base0, trig, cancel, to,
        col(ctx.tsMs), keyCols(ctx), orderCols(ctx))
      if (tagged) out.drop("_port") else out
    },

    // ---- broker nodes over the loopback connector (§2.7) ----
    // mqtt_subscribe / amqp_consume — topic/queue scan of the loopback
    // bus (refs: esp_mqtt_subscribe.erl:47-70, esp_amqp_consume.erl:
    // 68-103); .stream(true) plans onto the MicroBatchStream (committed-
    // offset resume ≈ ack). A broker deployment swaps LoopbackBus for the
    // real client — the DSv2 surface is identical (README boundary).
    "mqtt_subscribe" -> NodeDef(None, Point,
      Set("topic", "topics", "topic_as", "include_topic", "group", "qos",
        "stream", "host", "port", "retained", "dt_field", "dt_format",
        "user", "pass", "client_id", "ssl", "as", "payload_schema"),
      (_, n, env) => brokerSubscribe(n, env, "topic"),
    ),
    "amqp_consume" -> NodeDef(None, Point,
      Set("queue", "group", "exchange", "stream", "host", "port",
        "routing_key", "prefetch", "ack_after", "ack_every", "as",
        "bindings", "clean_field_names", "confirm", "consumer_tag",
        "dedup_size", "dt_field", "dt_format", "exchange_prefix",
        "include_topic", "pass", "queue_prefix", "qx_name",
        "root_exchange", "safe", "ssl", "topic_as", "use_flow_ack",
        "user", "vhost", "payload_schema"),
      (_, n, env) => brokerSubscribe(n, env, "queue"),
    ),
    // mqtt_publish / amqp_publish — terminal publish of the stream into
    // the bus (refs: esp_mqtt_publish.erl:46-78 incl. topic_lambda →
    // .topic_field routing column; esp_amqp_publish.erl). Sink nodes ARE
    // actions: the publish runs when the node plans.
    "mqtt_publish" -> NodeDef(Some(Both), Both,
      Set("topic", "topic_field", "topic_lambda", "qos", "retained",
        "host", "port", "use_pool", "pool_size", "client_id",
        "max_mem_queue_size", "pass", "safe", "ssl", "user"),
      (c, n, env) => brokerPublish(requireCtx(c, n.name), n, env, "topic"),
    ),
    "amqp_publish" -> NodeDef(Some(Both), Both,
      Set("exchange", "topic_field", "routing_key", "host", "port",
        "pass", "persistent", "qos", "routing_key_field",
        "routing_key_lambda", "ssl", "user", "vhost"),
      (c, n, env) => brokerPublish(requireCtx(c, n.name), n, env, "exchange"),
    ),

    // statistics node (ref: esp_statistics.erl:24-29): several stats
    // functions over one field in one pass.
    "statistics" -> NodeDef(Some(Batch), Point,
      Set("field", "fields", "as", "modules"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val f = optStr(n, "field", env)
          .orElse(optStrs(n, "fields", env).headOption)
          .getOrElse(throw DfsError("statistics: .field"))
        val mods = optStrs(n, "modules", env)
        if (mods.isEmpty) throw DfsError("statistics: .modules")
        val as = optStrs(n, "as", env)
        val outs = if (as.size == mods.size) as else mods
        val aggs = mods.zip(outs).map { case (m, o) =>
          val c = graft.operators.agg.AggFunctions
            .column(m, Paths.ref(f), col(ctx.tsMs))
          // float-SUM aggregates are partial-aggregation-order-
          // dependent in the last ULPs (the sf1 sweep measured avg
          // diverging from a sequential engine at the 13th digit once
          // groups reached ~17k rows); the monitoring bundle rounds
          // them at the repo's 6-decimal contract so the emitted stat
          // is partition-count-invariant. Order-exact modules
          // (count/min/max/median/first/last/...) pass through.
          (m match {
            case "avg" | "mean" | "geometric_mean" | "variance" |
                 "stddev" | "skew" | "kurtosis" => round(c, 6)
            case _ => c
          }).as(o)
        }
        ctx.copy(df = groupedAgg(ctx, aggs), win = None, io = Point,
          ts = "", tsMs = aggEventTime(ctx))
      }),

    // count_change node (ref: esp_count_change.erl:25-55): per-window
    // count of value changes — sugar over the count_change aggregate
    // function. .keep_last(false) (reset continuity at batch boundaries)
    // is accepted; the batch analog keeps keyed continuity, the
    // reference's default.
    "count_change" -> NodeDef(Some(Batch), Point,
      Set("field", "as", "keep_last"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val f = optStr(n, "field", env)
          .getOrElse(throw DfsError("count_change: .field"))
        val as = optStr(n, "as", env).getOrElse("count_change")
        val flat = if (as.contains(".")) "_cc_out" else as
        val agg0 = aggregateWithWindow(ctx,
          Seq(Aggregate.Spec(f, "count_change", flat)))
        val out = if (flat == as) agg0
          else Paths.set(agg0, as, col(flat)).drop(flat)
        ctx.copy(df = out, win = None, io = Point,
          ts = "", tsMs = aggEventTime(ctx))
      }),

    // ---- HTTP nodes over the loopback endpoint model (§2.7) ----
    // An endpoint (port, path) is a topic on the bus: http_listen
    // subscribes to what is POSTed there, http_post publishes each row,
    // http_get polls the endpoint's current feed (refs:
    // esp_http_listen.erl, esp_http_post.erl:34-52, esp_http_get.erl;
    // auth/TLS/headers are transport-binding options, accepted and
    // deployment-side like the broker nodes).
    "http_listen" -> NodeDef(None, Both,
      Set("path", "port", "host", "payload_type", "as", "user", "pass",
        "tls", "stream", "content_type", "payload_schema"),
      (_, n, env) => applyLandingOpts(subscribeLanded(env,
        httpTopic(n, env),
        optStr(n, "stream", env).contains("true"),
        declared = declaredPayloadSchema(n, env),
        // a declared non-JSON payload_type is a valid envelope-only plan
        jsonPayload = optStr(n, "payload_type", env).forall(_ == "json")),
        n, env)),
    "http_get" -> NodeDef(None, Both,
      Set("path", "port", "host", "every", "align", "as", "user", "pass",
        "tls", "payload_type", "topic", "stream", "param_keys",
        "param_values", "retries"),
      (_, n, env) => subscribeLanded(env, httpTopic(n, env), stream = false)),
    "http_post" -> NodeDef(Some(Both), Both,
      Set("path", "port", "host", "method", "tls", "header_names",
        "header_values", "user", "pass", "retries", "content_type",
        "payload_field", "field", "every", "ts_as", "response_as",
        "without"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        // .without excludes fields from the POSTED payload only — the
        // stream itself passes through complete (esp_http_post options)
        val posted = optStrs(n, "without", env)
          .foldLeft(ctx.df)((d, f) => d.drop(f))
        graft.sources.Loopback.publish(posted, httpTopic(n, env))
        ctx
      }),

    // ---- socket nodes over the loopback endpoint model (§2.7) ----
    // line-framed TCP / UDP feeds: the (ip, port) endpoint is a bus
    // topic; framing/codec options are transport-binding, accepted like
    // the broker nodes' (refs: esp_tcp_recv_line.erl, esp_udp_recv.erl,
    // esp_tcp_send.erl, esp_udp_send.erl).
    "tcp_recv_line" -> socketSource("tcp"),
    "tcp_recv" -> socketSource("tcp"),
    "udp_recv" -> socketSource("udp"),
    "tcp_send" -> socketSink("tcp"),
    "udp_send" -> socketSink("udp"),

    // mongo_query — find-selector source (ref: esp_mongo_query.erl:
    // 40-62). The selector translates to a pushdown-friendly Catalyst
    // predicate (io/MongoFilter.scala); the engine binding scans the
    // corpus table named by .collection, the mongo client itself is
    // deployment-side.
    // emits Both: .result_type point|batch in the reference — the
    // planned Ctx is point-shaped (ts set for events), so downstream
    // windows and batch consumers both connect
    "mongo_query" -> NodeDef(None, Both,
      Set("host", "port", "user", "pass", "database", "collection",
        "query", "as", "time_field", "every", "align"),
      (_, n, env) => {
        val coll = optStr(n, "collection", env)
          .getOrElse(throw DfsError("mongo_query: .collection"))
        val sel = optStr(n, "query", env).getOrElse("{}")
        val base =
          if (coll == "events") Tables.events(env.spark, env.dir)
          else Tables.loadOrView(env.spark, env.dir, coll)
        val df = base.filter(graft.io.MongoFilter.column(sel))
        val (ts, tsMs) = if (coll == "events") ("ts", "ts_ms") else ("", "")
        // .as nests the whole document under the alias path — the
        // reference's set_root(P0, As) with ts staying point-level
        // (esp_mongo_query.erl:159-166)
        val aliased = optStr(n, "as", env) match {
          case None => df
          case Some(as) =>
            val timeCols = Set(ts, tsMs, "ts_ns").filter(_.nonEmpty)
            val docCols = df.columns.filterNot(timeCols).toIndexedSeq
            val doc = struct(docCols.map(c0 =>
              col(s"`$c0`").as(c0)): _*)
            graft.core.Paths.set(
              df.withColumn("_doc", doc)
                .select(("_doc" +: timeCols.toSeq.filter(
                  df.columns.contains)).map(col): _*),
              as, col("_doc")).drop("_doc")
        }
        Ctx(aliased, Nil, None, Point, ts, tsMs)
      }),
    // oracle_query — periodic SQL source over JDBC (ref:
    // esp_oracle_query.erl:43-61); same remote-derived-table binding as
    // postgre_statement, oracle-thin URL by default.
    "oracle_query" -> NodeDef(None, Batch,
      Set("host", "port", "user", "pass", "service_name", "query",
        "result_type", "time_field", "every", "align", "limit"),
      (_, n, env) => {
        val sql = optStr(n, "query", env)
          .getOrElse(throw DfsError("oracle_query: .query"))
        val host = optStr(n, "host", env).getOrElse("localhost")
        // deployment binding for the URL: an explicit jdbc: host wins;
        // otherwise the graft.jdbc.url property (the dev/test harness's
        // in-process database, e.g. Derby) substitutes for the
        // oracle-thin URL built from host parts — the engine never needs
        // the Oracle driver to plan the node
        val u =
          if (host.startsWith("jdbc:")) host
          else sys.props.getOrElse("graft.jdbc.url", {
            val port = optNum(n, "port", env).map(_.toLong).getOrElse(1521L)
            val svc = optStr(n, "service_name", env).getOrElse("ORCL")
            s"jdbc:oracle:thin:@//$host:$port/$svc"
          })
        Ctx(graft.io.Jdbc.statement(env.spark, u, sql),
          Nil, None, Batch, "", "")
      }),

    // postgre_statement — SQL statement source over JDBC (ref:
    // esp_postgre_statement.erl:42-55). The statement executes REMOTELY
    // as a derived table (io/Jdbc.scala); .host may carry a full jdbc:
    // URL for embedded deployments. statement_field (per-point SQL from
    // data) is trigger-driven runtime behavior — deployment-side.
    "postgre_statement" -> NodeDef(None, Batch,
      Set("host", "port", "tls", "user", "pass", "statement",
        "statement_field", "retries", "start_on_trigger", "every",
        "result_type", "database"),
      (_, n, env) => {
        val sql = optStr(n, "statement", env)
          .getOrElse(throw DfsError("postgre_statement: .statement " +
            "(.statement_field is trigger-driven — deployment-side)"))
        val u = graft.io.Jdbc.url(
          optStr(n, "host", env).getOrElse("localhost"),
          optNum(n, "port", env).map(_.toLong).getOrElse(5432L),
          optStr(n, "database", env).getOrElse(""))
        Ctx(graft.io.Jdbc.statement(env.spark, u, sql),
          Nil, None, Batch, "", "")
      }),
    // postgre_out — field-mapped JDBC insert sink (ref:
    // esp_postgre_out.erl:34-47; db_fields/faxe_fields same_length map).
    "postgre_out" -> NodeDef(Some(Both), Both,
      Set("host", "port", "user", "pass", "database", "table",
        "db_fields", "faxe_fields"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val table = optStr(n, "table", env)
          .getOrElse(throw DfsError("postgre_out: .table"))
        val dbf = optStrs(n, "db_fields", env)
        val fxf = optStrs(n, "faxe_fields", env)
        if (dbf.size != fxf.size)
          throw DfsError("postgre_out: db_fields/faxe_fields same length")
        val u = graft.io.Jdbc.url(
          optStr(n, "host", env).getOrElse("localhost"),
          optNum(n, "port", env).map(_.toLong).getOrElse(5432L),
          optStr(n, "database", env).getOrElse(""))
        graft.io.Jdbc.write(ctx.df, u, table, fxf.zip(dbf))
        ctx
      }),

    // email — per-point notification sink (ref: esp_email.erl:36-50
    // options, :115-137 templating/mime). Subject/body string-templates
    // and the HTML-template wrap render as one projection
    // (io/EmailFormat.scala); the SMTP hand-off is the endpoint topic.
    "email" -> NodeDef(Some(Point), Both,
      Set("from_address", "smtp_relay", "smtp_user", "smtp_pass",
        "smtp_port", "smtp_tls", "template", "to", "subject", "body",
        "body_field", "subject_field"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val to = optStrs(n, "to", env)
        if (to.isEmpty) throw DfsError("email: .to")
        val from = optStr(n, "from_address", env).getOrElse("faxe@localhost")
        val relay = optStr(n, "smtp_relay", env).getOrElse("localhost")
        val subject = optStr(n, "subject_field", env)
          .map(f => coalesce(Paths.ref(f).cast("string"), lit("")))
          .orElse(optStr(n, "subject", env).map(graft.io.EmailFormat.template))
          .getOrElse(lit(""))
        val content = optStr(n, "body_field", env)
          .map(f => coalesce(Paths.ref(f).cast("string"), lit("")))
          .orElse(optStr(n, "body", env).map(graft.io.EmailFormat.template))
          .getOrElse(throw DfsError("email: .body or .body_field"))
        val body = optStr(n, "template", env) match {
          case Some(path) if new java.io.File(path).isFile =>
            val src = scala.io.Source.fromFile(path, "UTF-8")
            val tpl = try src.mkString finally src.close()
            graft.io.EmailFormat.wrapTemplate(tpl, content)
          // the template file is a deployment artifact; without one the
          // rendered content IS the body
          case _ => content
        }
        val payload = graft.io.EmailFormat.message(from, to, subject, body)
        graft.sources.Loopback.publish(
          ctx.df.select(payload.as("payload")), s"email:$relay")
        ctx
      }),

    // crate_out / http_post_crate — CrateDB insert sinks (refs:
    // esp_crate_out.erl:79-101, esp_http_post_crate.erl:45-56; both are
    // field-mapped inserts with remaining_fields_as folding the leftover
    // columns into one JSON object). Crate speaks the postgres wire
    // protocol, so a jdbc: host binds through io/Jdbc (testable against
    // embedded Derby); otherwise rows publish to the endpoint topic.
    "crate_out" -> NodeDef(Some(Both), Both,
      Set("host", "port", "tls", "table", "user", "pass", "database",
        "db_fields", "faxe_fields", "remaining_fields_as", "max_retries",
        "error_trace", "ignore_response_timeout", "use_flow_ack",
        "pg_port", "pg_tls", "pg_user", "pg_pass"),
      (c, n, env) => crateSink(c, n, env, viaJdbc = true)),
    "http_post_crate" -> NodeDef(Some(Both), Both,
      Set("host", "port", "tls", "table", "user", "pass", "database",
        "db_fields", "faxe_fields", "remaining_fields_as"),
      (c, n, env) => crateSink(c, n, env, viaJdbc = false)),

    // mqtt_amqp_bridge — consumes MQTT topic(s), republishes each
    // payload verbatim to an AMQP exchange with routing key =
    // topic_to_key(mqtt topic) ('/' → '.', esp_mqtt_amqp_bridge.erl:
    // 302-303; one publisher per topic keeps per-topic order :7-8).
    // Loopback binding: exchange address = "<exchange>:<routing_key>";
    // repartition-by-topic + offset sort makes per-topic order hold at
    // any input partitioning, the relational analog of the per-topic
    // publisher queue.
    "mqtt_amqp_bridge" -> NodeDef(None, Both,
      Set("host", "port", "user", "pass", "qos", "topic", "topics", "ssl",
        "amqp_host", "amqp_port", "amqp_user", "amqp_pass", "amqp_vhost",
        "amqp_exchange", "amqp_ssl", "persistent", "reset_timeout",
        "max_publishers", "safe"),
      (_, n, env) => {
        val topics = optStrs(n, "topics", env) ++ optStrs(n, "topic", env)
        if (topics.isEmpty)
          throw DfsError("mqtt_amqp_bridge: .topic or .topics")
        val exchange = optStr(n, "amqp_exchange", env).getOrElse("x")
        val frames = topics.map { t =>
          val rk = t.replace("/", ".")
          graft.sources.Loopback.subscribe(env.spark, t)
            .withColumn("topic", lit(s"$exchange:$rk"))
        }
        val bridged = frames.reduce(_ unionByName _)
          .repartition(col("topic"))
          .sortWithinPartitions(col("topic"), col("offset"))
        graft.sources.Loopback.publish(bridged, "")
        Ctx(bridged, Nil, None, Point, "", "ts_ms")
      }),

    // influx_out — InfluxDB HTTP write sink (ref: esp_influx_out.erl:
    // 40-50 options, :203-209 line-protocol encode). The HTTP client is
    // deployment-side; engine-side each row is encoded to the line
    // protocol (lib/influx_line.erl parity, io/InfluxLine.scala) and
    // published to the endpoint topic, so the exact wire payload is
    // testable.
    "influx_out" -> NodeDef(Some(Both), Both,
      Set("host", "port", "tls", "user", "pass", "database", "measurement",
        "retpol"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val meas = optStr(n, "measurement", env)
          .getOrElse(throw DfsError("influx_out: .measurement"))
        val host = optStr(n, "host", env).getOrElse("localhost")
        val port = optNum(n, "port", env).map(_.toLong).getOrElse(8086L)
        val db = optStr(n, "database", env).getOrElse("faxe")
        val tsOpt = Some(ctx.tsMs).filter(t =>
          t.nonEmpty && ctx.df.columns.contains(t))
        val fields = ctx.df.columns.toSeq
          .filterNot(cn => cn == ctx.ts || tsOpt.contains(cn))
        val line = graft.io.InfluxLine.encode(ctx.df, lit(meas), fields,
          ts = tsOpt.map(col))
        graft.sources.Loopback.publish(
          ctx.df.select(line.as("payload")), s"influx:$host:$port:$db")
        ctx
      }),

    // tcp_serve — a local TCP server pushing each item to connected
    // clients (ref: esp_tcp_serve.erl options port/packet/format/field):
    // a sink on the (local, port) endpoint topic.
    "tcp_serve" -> NodeDef(Some(Both), Both,
      Set("port", "packet", "format", "field"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        graft.sources.Loopback.publish(ctx.df, socketTopic("tcp", n, env))
        ctx
      }),
    // tcppoll — periodic poll of a remote TCP endpoint (ref:
    // esp_tcppoll.erl options ip/port/every/count/prefix): a source on
    // the endpoint topic; .every/.count are stream pacing.
    "tcppoll" -> NodeDef(None, Both,
      Set("ip", "port", "every", "count", "prefix"),
      (_, n, env) =>
        subscribeLanded(env, socketTopic("tcp", n, env), stream = false)),
    // modbus_read / modbus — Modbus-TCP register polling sources (refs:
    // esp_modbus_read.erl:81-102, esp_modbus.erl:74-96; same_length
    // function/from/count/as lists). Like s7read: the protocol client is
    // deployment-side, engine-side each is an endpoint source on the
    // (ip, port) topic with the register-map options accepted.
    "modbus_read" -> modbusSource(Set("ip", "port", "every", "align",
      "device", "function", "from", "count", "as", "output", "signed",
      "round", "timeout")),
    "modbus" -> modbusSource(Set("ip", "port", "every", "align", "device",
      "function", "from", "count", "as", "output", "signed",
      "max_connections", "round", "timeout")),
    // s7read — Siemens S7 PLC polling source (ref: esp_s7read.erl:63-82
    // options). The PLC client itself is deployment-side (connector
    // boundary, README); engine-side it is an endpoint source on the
    // (ip, port) topic whose address/alias options are accepted and
    // carried — dfs/other/macro1.dfs starts its chain with it.
    "s7read" -> NodeDef(None, Point,
      Set("ip", "port", "every", "align", "slot", "rack", "vars",
        "vars_prefix", "as", "as_prefix", "diff", "merge_field",
        "byte_offset", "use_pool", "standalone", "optimized", "native"),
      (_, n, env) => {
        val ip = optStr(n, "ip", env).getOrElse("0.0.0.0")
        val port = optNum(n, "port", env).map(_.toLong).getOrElse(102L)
        subscribeLanded(env, s"s7:$ip:$port", stream = false)
      }),

    // ---- graft EXTENSION nodes (no faxe counterpart) -------------------
    // The LLM training-data operators exposed to the script language so a
    // pipeline author can stay in DFS end-to-end. Documented as
    // extensions in docs/OPERATORS.md — they cite no esp_* module.
    "hash_sample" -> bt(Set("field", "fraction")) { (ctx, n, env) =>
      val f = optStr(n, "field", env)
        .getOrElse(throw DfsError("hash_sample: .field"))
      val frac = optNum(n, "fraction", env)
        .getOrElse(throw DfsError("hash_sample: .fraction"))
      graft.operators.text.TextOps.hashSample(ctx.df, Paths.ref(f),
        lit(frac))
    },
    "pack_bins" -> bt(
      Set("tokens_field", "text_field", "shard", "order", "bin_tokens")) {
      (ctx, n, env) =>
        val tokens = optStr(n, "tokens_field", env).map(Paths.ref)
          .orElse(optStr(n, "text_field", env).map(f =>
            graft.operators.text.TextOps.tokenCount(Paths.ref(f))))
          .getOrElse(throw DfsError("pack_bins: .tokens_field or .text_field"))
        val shard = optStr(n, "shard", env).map(Paths.ref)
          .getOrElse(lit(0))
        val order = optStrs(n, "order", env).map(Paths.ref) match {
          case Seq() if ctx.tsMs.nonEmpty => Seq(col(ctx.tsMs))
          case Seq() => throw DfsError(
            "pack_bins: .order (the stream has no time axis)")
          case o => o
        }
        val bin = optNum(n, "bin_tokens", env).map(_.toInt).getOrElse(8192)
        graft.operators.text.TextOps.packBins(ctx.df, tokens, shard, order,
          bin)
    },
    // exact content dedup (graft extension, the Dedup door): group
    // table by default, `.annotate()` keeps rows with rep_id/n_copies/
    // is_rep — the keep-min survivor flag downstream filters compose on
    "exact_dedup" -> bt(Set("text_field", "id_field", "annotate")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("exact_dedup: .id_field"))
        if (optFlag(n, "annotate", env))
          graft.operators.text.Dedup.exactDedupAnnotate(ctx.df,
            Paths.ref(text), Paths.ref(id))
        else graft.operators.text.Dedup.exactDupGroups(ctx.df,
          Paths.ref(text), Paths.ref(id))
    },
    "near_dedup" -> bt(Set("text_field", "id_field", "threshold", "bands",
      "rows_per_band", "max_bucket", "auto", "k")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("near_dedup: .id_field"))
      val threshold = optNum(n, "threshold", env).getOrElse(0.8)
      val maxB = optNum(n, "max_bucket", env).map(_.toInt)
        .getOrElse(graft.operators.text.Dedup.DefaultMaxBucketSize)
      // .auto() plans (bands, rows_per_band) from the threshold under
      // the .k() signature budget (the MMDS optimal-band rule).
      // Invalid combinations reject LOUDLY (the DFS convention):
      // .auto() with explicit geometry is contradictory, and .k
      // without .auto() would silently do nothing.
      val auto = optFlag(n, "auto", env)
      val bandsOpt = optNum(n, "bands", env).map(_.toInt)
      val rpbOpt = optNum(n, "rows_per_band", env).map(_.toInt)
      val kOpt = optNum(n, "k", env).map(_.toInt)
      if (auto && (bandsOpt.nonEmpty || rpbOpt.nonEmpty))
        throw DfsError("near_dedup: .auto() plans .bands/.rows_per_band " +
          "from the threshold — drop the explicit geometry or drop .auto()")
      if (!auto && kOpt.nonEmpty)
        throw DfsError("near_dedup: .k is the .auto() signature budget " +
          "and has no effect without .auto() — add .auto() or drop .k")
      // the Jaccard domain holds on EVERY path (threshold 1.0 = exact
      // duplicates is meaningful; > 1 is an always-empty silent no-op,
      // <= 0 an all-pairs degenerate)
      if (threshold <= 0.0 || threshold > 1.0)
        throw DfsError("near_dedup: .threshold must be in (0, 1], " +
          s"got $threshold")
      if (auto) {
        if (threshold >= 1.0)
          throw DfsError("near_dedup: .auto() needs .threshold strictly " +
            s"inside (0, 1) (the band-planning log domain), got $threshold")
        val kBudget = kOpt.getOrElse(16)
        if (kBudget < 2 || kBudget > graft.operators.text.Dedup.A.size)
          throw DfsError(s"near_dedup: .k must be in [2, " +
            s"${graft.operators.text.Dedup.A.size}] (the shipped hash " +
            s"coefficient budget), got $kBudget")
        graft.operators.text.Dedup.nearDupPairsAuto(ctx.df,
          Paths.ref(text), Paths.ref(id), threshold, kBudget, maxB)
      }
      else
        graft.operators.text.Dedup.nearDupPairs(ctx.df, Paths.ref(text),
          Paths.ref(id), threshold,
          bandsOpt.getOrElse(4), rpbOpt.getOrElse(2),
          maxB)
    },
    // benchmark decontamination as a flow node (graft extension, the
    // TextOps.decontaminate door): .benchmark is a lambda predicate
    // marking the eval-suite rows INSIDE the stream
    "decontaminate" -> bt(
      Set("text_field", "id_field", "benchmark", "n", "fuzzy")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("decontaminate: .id_field"))
      val bm = optLambdas(n, "benchmark", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("decontaminate: .benchmark(lambda)"))
      // .fuzzy(threshold): MinHash/LSH near-dup against the benchmark
      // instead of exact-gram overlap — catches paraphrased leakage
      optNum(n, "fuzzy", env) match {
        case Some(th) =>
          graft.operators.text.Dedup.decontaminateFuzzy(ctx.df,
            Paths.ref(text), Paths.ref(id), bm, th)
        case None =>
          graft.operators.text.TextOps.decontaminate(ctx.df,
            Paths.ref(text), Paths.ref(id), bm,
            optNum(n, "n", env).map(_.toInt).getOrElse(3))
      }
    },
    // incremental near-dup probing (graft extension, the
    // Dedup.nearDupVsIndex door): `.index` is a per-row lambda marking
    // the established-corpus rows (the decontaminate .benchmark
    // pattern); the rest probe the LSH index built from them
    "vs_index" -> bt(Set("text_field", "id_field", "index", "threshold",
      "bands", "rows_per_band", "bucketed", "incremental",
      "buckets")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("vs_index: .id_field"))
      val isIdx = optLambdas(n, "index", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("vs_index: .index(lambda)"))
      val bands = optNum(n, "bands", env).map(_.toInt).getOrElse(4)
      val rpb = optNum(n, "rows_per_band", env).map(_.toInt).getOrElse(2)
      val thr = optNum(n, "threshold", env).getOrElse(0.3)
      // .buckets(n): explicit bucket count for the materialized
      // lifecycles; absent/0 = the autoBuckets occupancy law
      val bk = optNum(n, "buckets", env).map(_.toInt).getOrElse(0)
      // .incremental(): the REFRESH lifecycle — two append batches,
      // the id % 5 == 3 stratum deleted via broadcast tombstones
      if (optFlag(n, "incremental", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_band_incr")
        graft.operators.serve.IncrementalServe
          .nearDupVsIncrementalLifecycle(
            ctx.df.filter(!isIdx), ctx.df.filter(isIdx),
            Paths.ref(text), Paths.ref(id), thr,
            "graft_dfs_band_incr", tmp, bands, rpb, bk)
      }
      // .bucketed(): the MATERIALIZED lifecycle — band index written
      // bucketBy(band, bh) to a real path, re-read, probed co-located
      else if (optFlag(n, "bucketed", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_band_idx")
        graft.operators.serve.BucketedServe.nearDupVsBucketedIndex(
          ctx.df.filter(!isIdx), ctx.df.filter(isIdx),
          Paths.ref(text), Paths.ref(id), thr,
          "graft_dfs_band_idx", tmp, bands, rpb, bk)
      } else {
        val idx = graft.operators.text.Dedup.nearDupIndex(
          ctx.df.filter(isIdx), Paths.ref(text), Paths.ref(id), bands, rpb)
        graft.operators.text.Dedup.nearDupVsIndex(
          ctx.df.filter(!isIdx), Paths.ref(text), Paths.ref(id), idx,
          thr, bands, rpb)
      }
    },
    // similarity-search serve against the established rows' IVF index
    // (graft extension, the VectorOps.annVsIndex door — vs_index
    // carried to embeddings): .index(lambda) marks the corpus side,
    // the rest probe .probes nearest of .cells; threshold form, so the
    // node streams as-is behind a stream-static join
    "vs_vector_index" -> bt(Set("vec_field", "id_field", "index",
      "threshold", "cells", "probes", "bucketed", "incremental",
      "buckets", "trainer")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("vs_vector_index: .id_field"))
      val isIdx = optLambdas(n, "index", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("vs_vector_index: .index(lambda)"))
      val cells = optNum(n, "cells", env).map(_.toInt).getOrElse(8)
      val V = graft.operators.vector.VectorOps
      // .trainer('sample' | 'kmeans'): the coarse quantizer — 'sample'
      // (default) is the bounded driver-side ivfCentroids; 'kmeans' is
      // the distributed fixed-point trainer (1 Lloyd iter from the
      // deterministic seeds), the SQL-replayable choice that lets a
      // PARTIAL-probe query carry a bit-exact oracle
      val cents = optStr(n, "trainer", env).getOrElse("sample") match {
        case "sample" => V.ivfCentroids(ctx.df.filter(isIdx), id, vec, cells)
        case "kmeans" =>
          val idxDf = ctx.df.filter(isIdx)
          val dim = idxDf.select(size(col(vec))).head().getInt(0)
          graft.operators.vector.VectorCuration.kmeansTrain(idxDf, vec,
            graft.operators.vector.VectorCuration
              .seedCentroids(cells, dim), 1)
        case t => throw DfsError(
          s"vs_vector_index: .trainer must be 'sample' or 'kmeans', got '$t'")
      }
      val thr = optNum(n, "threshold", env).getOrElse(0.85)
      val probes = optNum(n, "probes", env).map(_.toInt).getOrElse(cells)
      val bk = optNum(n, "buckets", env).map(_.toInt).getOrElse(0)
      // .incremental(): the REFRESH lifecycle — two append batches, a
      // stratum upserted, the id % 5 == 3 stratum tombstone-deleted
      if (optFlag(n, "incremental", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_cell_incr")
        graft.operators.serve.IncrementalServe.annVsIncrementalLifecycle(
          ctx.df.filter(!isIdx), ctx.df.filter(isIdx), id, vec, cents,
          thr, probes, "graft_dfs_cell_incr", tmp, bk)
      }
      // .bucketed(): cell index written bucketBy(_cell), re-read, probed
      else if (optFlag(n, "bucketed", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_cell_idx")
        graft.operators.serve.BucketedServe.annVsBucketedIndex(
          ctx.df.filter(!isIdx), ctx.df.filter(isIdx), id, vec, cents,
          thr, probes, "graft_dfs_cell_idx", tmp, bk)
      } else {
        val idx = V.vectorIndex(ctx.df.filter(isIdx), id, vec, cents)
        V.annVsIndex(ctx.df.filter(!isIdx), idx, id, vec, cents, thr,
          probes)
      }
    },
    // Gopher-style repetition metrics as a flow node (graft extension,
    // the TextOps.runStats door): appends n_tok / ttr / top_frac /
    // dup_frac for `.n`-gram repetition — per-row sorted-run fold, no
    // shuffle, streams as-is.
    "repetition" -> bt(Set("text_field", "n")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val ng = optNum(n, "n", env).map(_.toInt).getOrElse(2)
      val T = graft.operators.text.TextOps
      val d = ctx.df
        .withColumn("_t", T.tokens(Paths.ref(text)))
        .withColumn("_g", T.shinglesFromTokens(col("_t"), ng,
          distinct = false))
        .withColumn("_rs", T.runStats(col("_g")))
      d.withColumn("n_tok", size(col("_t")))
        .withColumn("ttr", round(size(array_distinct(col("_t"))) *
          lit(1.0) / size(col("_t")), 6))
        .withColumn("top_frac", round(col("_rs").getField("top") *
          lit(1.0) / size(col("_g")), 6))
        .withColumn("dup_frac", round(col("_rs").getField("dup") *
          lit(1.0) / size(col("_g")), 6))
        .drop("_t", "_g", "_rs")
    },
    // the Gopher document-quality gate: DROPS failing documents by
    // default; `.annotate()` keeps every row and lands `reason`/`keep`
    // instead (the drop-reason histogram form).
    "gopher_filter" -> bt(Set("text_field", "min_tokens", "max_tokens",
      "max_top2", "annotate")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val tcol = Paths.ref(text)
      val T = graft.operators.text.TextOps
      val d = ctx.df
        .withColumn("_t", T.tokens(tcol))
        .withColumn("_g", T.shinglesFromTokens(col("_t"), 2,
          distinct = false))
        .withColumn("_rs", T.runStats(col("_g")))
        .withColumn("reason", T.gopherReason(
          size(col("_t")), T.charCount(tcol),
          T.langScoreFromTokens(col("_t"), "en"),
          col("_rs").getField("top") * lit(1.0) / size(col("_g")),
          optNum(n, "min_tokens", env).map(_.toInt).getOrElse(50),
          optNum(n, "max_tokens", env).map(_.toInt).getOrElse(100000),
          optNum(n, "max_top2", env).getOrElse(0.20)))
        .drop("_t", "_g", "_rs")
      if (optFlag(n, "annotate", env))
        d.withColumn("keep", col("reason") === "ok")
      else d.filter(col("reason") === "ok").drop("reason")
    },
    // PII scrub: redact emails / phone numbers / IPv4 in the listed
    // string fields in place (default 'text'); `.counts()` lands
    // <field>_n_email / _n_phone / _n_ip first.
    "pii_scrub" -> bt(Set("fields", "counts")) { (ctx, n, env) =>
      val T = graft.operators.text.TextOps
      val fields = (argStrs(n, env) ++ optStrs(n, "fields", env)) match {
        case Seq() => Seq("text")
        case f => f
      }
      fields.foldLeft(ctx.df) { (d, f) =>
        val c = Paths.ref(f)
        val d2 =
          if (optFlag(n, "counts", env))
            d.withColumn(s"${f}_n_email",
                regexp_count(c, lit(T.EmailRe)).cast("int"))
              .withColumn(s"${f}_n_phone",
                regexp_count(c, lit(T.PhoneRe)).cast("int"))
              .withColumn(s"${f}_n_ip",
                regexp_count(c, lit(T.Ipv4Re)).cast("int"))
          else d
        d2.withColumn(f, T.piiScrub(c))
      }
    },
    // text normalization in place (TextOps.normalize door): lowercase +
    // whitespace collapse by default; `.strip_punct()` adds punctuation
    // removal, `.lower(false)` / `.collapse_ws(false)` opt out.
    "normalize" -> bt(Set("fields", "lower", "strip_punct",
      "collapse_ws")) { (ctx, n, env) =>
      def flagOr(name: String, default: Boolean) =
        if (n.options.contains(name)) optFlag(n, name, env) else default
      val fields = (argStrs(n, env) ++ optStrs(n, "fields", env)) match {
        case Seq() => Seq("text")
        case f => f
      }
      fields.foldLeft(ctx.df) { (d, f) =>
        d.withColumn(f, graft.operators.text.TextOps.normalize(
          Paths.ref(f), flagOr("lower", true),
          flagOr("strip_punct", false), flagOr("collapse_ws", true)))
      }
    },
    // mixture resampling to target shares (TextOps.sampleToMixture):
    // `.weight` is a per-row lambda giving the stratum's relative
    // target weight (functionally dependent on `.stratum`).
    "sample_mixture" -> bt(Set("id_field", "stratum", "weight",
      "temperature", "epochs")) { (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("sample_mixture: .id_field"))
      val st = optStr(n, "stratum", env)
        .getOrElse(throw DfsError("sample_mixture: .stratum"))
      val epochs = optNum(n, "epochs", env)
      (optLambdas(n, "weight", env).headOption
          .map(lambdaColumn(_, env.defs)),
        optNum(n, "temperature", env)) match {
        // .epochs lifts the min(1,·) clamp: strata REPEAT to epochs ×
        // their weighted share (a 0-based `copy` column lands)
        case (Some(w), None) if epochs.isDefined =>
          graft.operators.text.TextOps.upsampleToMixture(ctx.df,
            Paths.ref(id), Paths.ref(st), w, epochs.get)
        case (Some(w), None) =>
          graft.operators.text.TextOps.sampleToMixture(ctx.df,
            Paths.ref(id), Paths.ref(st), w)
        // n^alpha-flattened target computed FROM the counts — the
        // multilingual temperature rule, no weight column needed
        case (None, Some(a)) =>
          if (epochs.isDefined) throw DfsError(
            "sample_mixture: .epochs needs .weight(lambda), " +
              "not .temperature")
          graft.operators.text.TextOps.sampleToMixtureTemp(ctx.df,
            Paths.ref(id), Paths.ref(st), a)
        case _ => throw DfsError(
          "sample_mixture: exactly one of .weight(lambda) / .temperature")
      }
    },
    // greedy token-budget selection (Curation.tokenBudget door): fill
    // `.budget` tokens in `.seed`-hashed shuffle order (reproducible
    // random epoch) or explicit `.by` field order; lands cum_tokens.
    "token_budget" -> bt(Set("tokens_field", "text_field", "budget",
      "seed", "by", "id_field")) { (ctx, n, env) =>
      val tokens = optStr(n, "tokens_field", env).map(Paths.ref)
        .orElse(optStr(n, "text_field", env).map(f =>
          graft.operators.text.TextOps.tokenCount(Paths.ref(f))
            .cast("long")))
        .getOrElse(throw DfsError(
          "token_budget: .tokens_field or .text_field"))
      val budget = optNum(n, "budget", env).map(_.toLong)
        .getOrElse(throw DfsError("token_budget: .budget"))
      val order = (optStr(n, "seed", env), optStrs(n, "by", env)) match {
        case (Some(seed), Seq()) =>
          val id = optStr(n, "id_field", env).getOrElse("doc_id")
          Seq(md5(concat_ws("|", lit(seed),
            Paths.ref(id).cast("string"))), Paths.ref(id))
        case (None, by) if by.nonEmpty => by.map(Paths.ref)
        case _ => throw DfsError(
          "token_budget: exactly one of .seed / .by(fields)")
      }
      graft.operators.text.Curation.tokenBudget(ctx.df, order, tokens,
        budget)
    },
    // weighted sampling without replacement (Curation.sampleWeightedK
    // door): `.k` rows per `.stratum` (omit for a global draw), weight
    // from a per-row lambda — Efraimidis–Spirakis keys on the md5
    // uniform, deterministic on every run.
    "sample_wr" -> bt(Set("id_field", "weight", "k", "stratum")) {
      (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("sample_wr: .id_field"))
      val w = optLambdas(n, "weight", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("sample_wr: .weight(lambda)"))
      val k = optNum(n, "k", env).map(_.toInt)
        .getOrElse(throw DfsError("sample_wr: .k"))
      graft.operators.text.Curation.sampleWeightedK(ctx.df,
        Paths.ref(id), w, k, optStrs(n, "stratum", env).map(Paths.ref))
    },
    // deterministic train/val/test split (Curation.splitAssign door):
    // md5-gated named buckets — a doc's split never changes across
    // runs or corpus growth.
    "split_assign" -> bt(Set("id_field", "names", "fractions", "as")) {
      (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("split_assign: .id_field"))
      val names = optStrs(n, "names", env)
      val fracs = optVals(n, "fractions", env).map {
        case VNum(v, _) => v
        case VLong(l) => l.toDouble
        case v => throw DfsError(
          s"split_assign: .fractions expects numbers, got $v")
      }
      if (names.isEmpty || names.size != fracs.size)
        throw DfsError("split_assign: .names and .fractions must pair up")
      graft.operators.text.Curation.splitAssign(ctx.df, Paths.ref(id),
        names.zip(fracs), optStr(n, "as", env).getOrElse("split"))
    },
    // segment-level cross-doc dedup (Dedup.segDedup door): the CCNet
    // paragraph-hash rule over `.seg_tokens`-token windows; emits
    // doc_id / n_seg / n_drop / clean_text.
    "seg_dedup" -> bt(Set("text_field", "id_field", "seg_tokens",
      "min_docs")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("seg_dedup: .id_field"))
      graft.operators.text.Dedup.segDedup(ctx.df, Paths.ref(text),
        Paths.ref(id),
        optNum(n, "seg_tokens", env).map(_.toInt).getOrElse(8),
        optNum(n, "min_docs", env).map(_.toInt).getOrElse(2))
    },
    // cross-doc duplicated-gram stats (graft extension, the
    // TextOps.dupGramStats door): per-doc n_grams / n_dup / dup_frac
    "dup_grams" -> bt(Set("text_field", "id_field", "n", "min_docs")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("dup_grams: .id_field"))
      graft.operators.text.TextOps.dupGramStats(ctx.df, Paths.ref(text),
        Paths.ref(id),
        optNum(n, "n", env).map(_.toInt).getOrElse(5),
        optNum(n, "min_docs", env).map(_.toInt).getOrElse(2))
    },
    // time-series similarity search (graft extension, the
    // Series.seriesTopK door): top-k keys by z-normalized Euclidean
    // distance between each key's last-|pattern| values and `.pattern`.
    // `.tiebreak` names a unique column (event id) — event-time ties
    // would otherwise make the last-m cut nondeterministic.
    "series_topk" -> bt(
      Set("key_field", "value_field", "pattern", "k", "tiebreak")) {
      (ctx, n, env) =>
      val key = optStr(n, "key_field", env)
        .getOrElse(throw DfsError("series_topk: .key_field"))
      val vf = optStr(n, "value_field", env).getOrElse("value")
      val tb = optStr(n, "tiebreak", env)
        .getOrElse(throw DfsError("series_topk: .tiebreak(unique field)"))
      val pat = optVals(n, "pattern", env).map {
        case VNum(v, _) => v
        case VLong(l) => l.toDouble
        case v =>
          throw DfsError(s"series_topk: .pattern expects numbers, got $v")
      }
      if (pat.isEmpty) throw DfsError("series_topk: .pattern(n1, n2, ...)")
      graft.operators.series.Series.seriesTopK(ctx.df,
        Paths.ref(key), Seq(col(ctx.tsMs), Paths.ref(tb)), Paths.ref(vf),
        pat, optNum(n, "k", env).map(_.toInt).getOrElse(10))
    },
    // subsequence search (graft extension, the Series.bestMatch door):
    // per key, the best-matching window offset of `.pattern`'s length
    // anywhere in the full series, with its z-norm distance
    "series_best" -> bt(
      Set("key_field", "value_field", "pattern", "tiebreak")) {
      (ctx, n, env) =>
      val key = optStr(n, "key_field", env)
        .getOrElse(throw DfsError("series_best: .key_field"))
      val vf = optStr(n, "value_field", env).getOrElse("value")
      val tb = optStr(n, "tiebreak", env)
        .getOrElse(throw DfsError("series_best: .tiebreak(unique field)"))
      val pat = optVals(n, "pattern", env).map {
        case VNum(v, _) => v
        case VLong(l) => l.toDouble
        case v =>
          throw DfsError(s"series_best: .pattern expects numbers, got $v")
      }
      if (pat.isEmpty) throw DfsError("series_best: .pattern(n1, n2, ...)")
      val S = graft.operators.series.Series
      S.bestMatch(S.fullSeries(ctx.df, Paths.ref(key),
        Seq(col(ctx.tsMs), Paths.ref(tb)), Paths.ref(vf)),
        S.zNormQuery(pat))
    },
    // SAX symbolization (graft extension, the Series.withSax door):
    // last-`.m` values per key -> `.w`-letter SAX word
    "series_sax" -> bt(
      Set("key_field", "value_field", "m", "w", "alphabet", "tiebreak")) {
      (ctx, n, env) =>
      val key = optStr(n, "key_field", env)
        .getOrElse(throw DfsError("series_sax: .key_field"))
      val vf = optStr(n, "value_field", env).getOrElse("value")
      val tb = optStr(n, "tiebreak", env)
        .getOrElse(throw DfsError("series_sax: .tiebreak(unique field)"))
      val S = graft.operators.series.Series
      S.withSax(
        S.keySeries(ctx.df, Paths.ref(key),
          Seq(col(ctx.tsMs), Paths.ref(tb)), Paths.ref(vf),
          optNum(n, "m", env).map(_.toInt).getOrElse(16)),
        optNum(n, "w", env).map(_.toInt).getOrElse(4),
        optNum(n, "alphabet", env).map(_.toInt).getOrElse(4))
        .select(col("key"), col("sax"))
    },
    // duplicated-span extraction (graft extension, the TextOps.dupSpans
    // door): maximal token spans whose every n-gram is cross-document
    // duplicated — the spans a trim pass would cut
    "dup_spans" -> bt(Set("text_field", "id_field", "n", "min_docs")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("dup_spans: .id_field"))
      graft.operators.text.TextOps.dupSpans(ctx.df, Paths.ref(text),
        Paths.ref(id),
        optNum(n, "n", env).map(_.toInt).getOrElse(5),
        optNum(n, "min_docs", env).map(_.toInt).getOrElse(2))
    },
    // BM25 ranked retrieval (graft extension, the TextOps.bm25TopK
    // door): `.terms` or positional args give the query terms
    "bm25" -> bt(Set("text_field", "id_field", "terms", "k", "k1", "b")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("bm25: .id_field"))
      val terms = argStrs(n, env) ++ optStrs(n, "terms", env)
      if (terms.isEmpty) throw DfsError("bm25: .terms('t1', 't2', ...)")
      graft.operators.text.TextOps.bm25TopK(ctx.df, Paths.ref(text),
        Paths.ref(id), terms,
        optNum(n, "k", env).map(_.toInt).getOrElse(10),
        optNum(n, "k1", env).getOrElse(1.2),
        optNum(n, "b", env).getOrElse(0.75))
    },
    // link-graph PageRank (GraphOps.pageRank door): the stream is an
    // edge list; fixed-point nano-unit iterations, bit-reproducible.
    "pagerank" -> bt(Set("src_field", "dst_field", "iters",
      "damping_pct")) { (ctx, n, env) =>
      val src = optStr(n, "src_field", env).getOrElse("src")
      val dst = optStr(n, "dst_field", env).getOrElse("dst")
      graft.operators.graph.GraphOps.pageRank(
        ctx.df.select(Paths.ref(src).as("src"), Paths.ref(dst).as("dst")),
        optNum(n, "iters", env).map(_.toInt).getOrElse(3),
        optNum(n, "damping_pct", env).map(_.toInt).getOrElse(85))
    },
    // bounded-depth harmonic centrality (GraphOps door): edge-list
    // stream in, per-node Σ Nano÷d out.
    "harmonic" -> bt(Set("src_field", "dst_field", "max_depth")) {
      (ctx, n, env) =>
      val src = optStr(n, "src_field", env).getOrElse("src")
      val dst = optStr(n, "dst_field", env).getOrElse("dst")
      graft.operators.graph.GraphOps.harmonicCentrality(
        ctx.df.select(Paths.ref(src).as("src"), Paths.ref(dst).as("dst")),
        optNum(n, "max_depth", env).map(_.toInt).getOrElse(3))
    },
    // per-stratum corpus composition report (Curation.corpusReport
    // door): docs / tokens / mean / exact p50-p95 / token share
    "corpus_report" -> bt(Set("stratum", "text_field")) { (ctx, n, env) =>
      val st = optStr(n, "stratum", env)
        .getOrElse(throw DfsError("corpus_report: .stratum"))
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.Curation.corpusReport(ctx.df, Paths.ref(st),
        Paths.ref(text))
    },
    // binary-sketch Hamming ANN (VectorOps.hammingTopK door): `.queries`
    // is a per-row lambda marking the query subset; with
    // `.rerank_candidates(n)` the two-stage exact-cosine re-rank runs
    "hamming_topk" -> bt(Set("vec_field", "id_field", "queries", "k",
      "dims", "rerank_candidates")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("hamming_topk: .id_field"))
      val isQ = optLambdas(n, "queries", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("hamming_topk: .queries(lambda)"))
      val k = optNum(n, "k", env).map(_.toInt).getOrElse(3)
      val dims = optNum(n, "dims", env).map(_.toInt).getOrElse(62)
      optNum(n, "rerank_candidates", env).map(_.toInt) match {
        case Some(cand) => graft.operators.vector.VectorOps
          .hammingRerank(ctx.df, ctx.df.filter(isQ), id, vec, k, cand,
            dims)
        case None => graft.operators.vector.VectorOps
          .hammingTopK(ctx.df, ctx.df.filter(isQ), id, vec, k, dims)
      }
    },
    // SemDeDup over an embedding field (graft extension, the
    // VectorOps.semDedup door): cluster-then-dedup keep/drop verdicts
    "sem_dedup" -> bt(Set("vec_field", "id_field", "threshold", "bits",
      "dim", "max_cluster")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("sem_dedup: .id_field"))
      graft.operators.vector.VectorOps.semDedup(ctx.df, id, vec,
        optNum(n, "threshold", env).getOrElse(0.85),
        optNum(n, "bits", env).map(_.toInt).getOrElse(8),
        optNum(n, "dim", env).map(_.toInt).getOrElse(64),
        optNum(n, "max_cluster", env).map(_.toInt).getOrElse(4096))
    },
    // semantic decontamination (graft extension, the
    // VectorOps.semanticDecon door): flag corpus rows whose cosine to
    // any .benchmark-marked row reaches .threshold — the embedding-space
    // rung of the decontaminate ladder
    "semantic_decon" -> bt(Set("vec_field", "id_field", "benchmark",
      "threshold", "bands", "rows_per_band", "dim", "max_bucket",
      "auto")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("semantic_decon: .id_field"))
      val bench = optLambdas(n, "benchmark", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("semantic_decon: .benchmark(lambda)"))
      val threshold = optNum(n, "threshold", env).getOrElse(0.85)
      val bands = optNum(n, "bands", env).map(_.toInt).getOrElse(4)
      val dim = optNum(n, "dim", env).map(_.toInt).getOrElse(64)
      val maxB = optNum(n, "max_bucket", env).map(_.toInt).getOrElse(4096)
      // .auto() sizes rowsPerBand by the occupancy law (the corpus-
      // sized production form); explicit .rows_per_band wins
      if (optFlag(n, "auto", env) &&
          optNum(n, "rows_per_band", env).isEmpty)
        graft.operators.vector.VectorOps.semanticDeconAuto(ctx.df, id,
          vec, bench.cast("boolean"), threshold, bands, dim,
          maxBucketSize = maxB)
      else
        graft.operators.vector.VectorOps.semanticDecon(ctx.df, id, vec,
          bench.cast("boolean"), threshold, bands,
          optNum(n, "rows_per_band", env).map(_.toInt).getOrElse(4),
          dim, maxB)
    },
    // BPE merge-candidate mining (graft extension, the TextOps.bpePairs
    // door): top-k weighted adjacent char pairs
    "bpe_pairs" -> bt(Set("text_field", "k")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.bpePairs(ctx.df, Paths.ref(text),
        optNum(n, "k", env).map(_.toInt).getOrElse(32))
    },
    // hashed linear quality-classifier scoring (graft extension, the
    // TextOps.withQualityLr door): appends n_tok / lr_raw / lr_prob
    // per row — zero shuffle, streams as-is
    "quality_lr" -> bt(Set("text_field")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.withQualityLr(ctx.df, Paths.ref(text))
    },
    // token-distribution entropy (graft extension, the
    // TextOps.withTokenEntropy door): appends n_tok / n_types / entropy
    // — per-row sorted-run fold, no shuffle, streams as-is
    "entropy" -> bt(Set("text_field")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.withTokenEntropy(ctx.df, Paths.ref(text))
    },
    // domain blocklist with suffix semantics (graft extension, the
    // Curation.domainBlocklist door): an entry blocks every subdomain
    // under it; drops by default, `.annotate()` lands `blocked`
    "domain_block" -> bt(Set("field", "block", "annotate")) {
      (ctx, n, env) =>
        val field = optStr(n, "field", env).getOrElse("domain")
        val blocked = optStrs(n, "block", env)
        if (blocked.isEmpty) throw DfsError("domain_block: .block")
        graft.operators.text.Curation.domainBlocklist(ctx.df,
          Paths.ref(field), blocked,
          annotate = optFlag(n, "annotate", env))
    },
    // multimodal doors (graft extensions over Multimodal): blobify
    // attaches the binary payload + typed metadata; frame_sample fans
    // out sampled frames; mm_near_pairs is the frame-fingerprint
    // Jaccard dedup
    "blobify" -> bt(Set("field", "as")) { (ctx, n, env) =>
      graft.operators.multimodal.Multimodal.withBlob(ctx.df,
        Paths.ref(optStr(n, "field", env).getOrElse("text")),
        optStr(n, "as", env).getOrElse("blob"))
    },
    "frame_sample" -> bt(Set("blob", "frame_size", "every")) {
      (ctx, n, env) =>
        graft.operators.multimodal.Multimodal.frameSample(ctx.df,
          optStr(n, "blob", env).getOrElse("blob"),
          optNum(n, "frame_size", env).map(_.toInt).getOrElse(256),
          optNum(n, "every", env).map(_.toInt).getOrElse(1))
    },
    "mm_near_pairs" -> bt(Set("blob", "id_field", "frame_size", "every",
      "threshold")) { (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("mm_near_pairs: .id_field"))
      graft.operators.multimodal.Multimodal.nearDupPairs(ctx.df,
        optStr(n, "blob", env).getOrElse("blob"), Paths.ref(id),
        optNum(n, "frame_size", env).map(_.toInt).getOrElse(256),
        optNum(n, "every", env).map(_.toInt).getOrElse(1),
        optNum(n, "threshold", env).getOrElse(0.3))
    },
    // 64-bit DCT perceptual hash over the decoded-luma stub (graft
    // extension, the Multimodal.pHash door): content-space image/video
    // dedup fingerprints — exact fixed-point DCT, one 8-byte hash per
    // payload
    "phash" -> bt(Set("text_field", "id_field")) { (ctx, n, env) =>
      graft.operators.multimodal.Multimodal.pHash(ctx.df,
        Paths.ref(optStr(n, "text_field", env).getOrElse("text")),
        Paths.ref(optStr(n, "id_field", env)
          .getOrElse(throw DfsError("phash: .id_field"))))
    },
    // Haitsma–Kalker audio sub-fingerprint stream (graft extension,
    // the Multimodal.audioFp door): content-space audio dedup — 16-bit
    // band-energy-delta sub-fingerprints over 50%-overlapped frames of
    // the decoded-sample stub, one (frame_idx, fp) row per frame
    "audio_fp" -> bt(Set("text_field", "id_field")) { (ctx, n, env) =>
      graft.operators.multimodal.Multimodal.audioFp(ctx.df,
        Paths.ref(optStr(n, "text_field", env).getOrElse("text")),
        Paths.ref(optStr(n, "id_field", env)
          .getOrElse(throw DfsError("audio_fp: .id_field"))))
    },
    // exact quantile-bucket assignment (graft extension, the
    // Curation.quantileBuckets door): ntile over the scale-safe
    // global-order primitive
    "quantile_bucket" -> bt(Set("field", "id_field", "buckets", "as")) {
      (ctx, n, env) =>
        val field = optStr(n, "field", env)
          .getOrElse(throw DfsError("quantile_bucket: .field"))
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("quantile_bucket: .id_field"))
        graft.operators.text.Curation.quantileBuckets(ctx.df,
          Paths.ref(field), Paths.ref(id),
          optNum(n, "buckets", env).map(_.toInt).getOrElse(10),
          optStr(n, "as", env).getOrElse("bucket"))
    },
    // per-group z-score outlier flag (graft extension, the
    // Curation.groupZScore door)
    "group_zscore" -> bt(Set("by", "field", "threshold")) {
      (ctx, n, env) =>
        val by = optStr(n, "by", env)
          .getOrElse(throw DfsError("group_zscore: .by"))
        val field = optStr(n, "field", env)
          .getOrElse(throw DfsError("group_zscore: .field"))
        graft.operators.text.Curation.groupZScore(ctx.df,
          Paths.ref(by), Paths.ref(field),
          optNum(n, "threshold", env).getOrElse(3.0))
    },
    // exact tie-aware ROC-AUC (graft extension, the Curation.rocAuc
    // door): .score/.label are per-row lambdas; one row out
    "auc" -> bt(Set("score", "label")) { (ctx, n, env) =>
      val score = optLambdas(n, "score", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("auc: .score(lambda)"))
      val label = optLambdas(n, "label", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("auc: .label(lambda)"))
      graft.operators.text.Curation.rocAuc(ctx.df, score,
        label.cast("boolean"))
    },
    // ROUGE-N overlap F1 between two text fields on each row (graft
    // extension, the Curation.ngramOverlapF1 door): clipped-count
    // n-gram precision/recall/F1 in exact integer milli-units
    "rouge" -> bt(Set("id_field", "cand_field", "ref_field", "n")) {
      (ctx, n, env) =>
      def f(name: String) = optStr(n, name, env)
        .getOrElse(throw DfsError(s"rouge: .$name"))
      graft.operators.text.Curation.ngramOverlapF1(ctx.df,
        Paths.ref(f("id_field")), Paths.ref(f("cand_field")),
        Paths.ref(f("ref_field")),
        optNum(n, "n", env).map(_.toInt).getOrElse(2))
    },
    // precision/recall at fixed thresholds (graft extension, the
    // Curation.prCurve door): predict positive iff score >= t
    "pr_curve" -> bt(Set("score", "label", "thresholds")) {
      (ctx, n, env) =>
      val score = optLambdas(n, "score", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("pr_curve: .score(lambda)"))
      val label = optLambdas(n, "label", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("pr_curve: .label(lambda)"))
      val thrs = optVals(n, "thresholds", env).map {
        // integer-exact contract: a fractional threshold (e.g. 0.5) would
        // silently truncate and change which rows count as predicted
        // positive — reject it instead
        case VNum(v, _) if v.isWhole && math.abs(v) < 9.2e18 => v.toLong
        case VNum(v, _) => throw DfsError(
          s"pr_curve: .thresholds must be integers (scores are integer-exact), got $v")
        case VLong(l) => l
        case v => throw DfsError(
          s"pr_curve: .thresholds expects numbers, got $v")
      }
      if (thrs.isEmpty) throw DfsError("pr_curve: .thresholds")
      graft.operators.text.Curation.prCurve(ctx.df, score,
        label.cast("boolean"), thrs)
    },
    // Platt calibration (graft extension, the Curation.plattCalibrate
    // door): .train splits the table; calibrated probabilities on the
    // non-train rows
    "platt" -> bt(Set("score", "label", "train", "id_field", "iters",
      "lr_a", "lr_b")) { (ctx, n, env) =>
      def lam(name: String) = optLambdas(n, name, env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError(s"platt: .$name(lambda)"))
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("platt: .id_field"))
      val isTrain = lam("train")
      graft.operators.text.Curation.plattCalibrate(
        ctx.df.filter(isTrain), ctx.df.filter(!isTrain),
        lam("score"), lam("label").cast("boolean"), Paths.ref(id),
        optNum(n, "iters", env).map(_.toInt).getOrElse(15),
        optNum(n, "lr_a", env).map(_.toLong).getOrElse(1L),
        optNum(n, "lr_b", env).map(_.toLong).getOrElse(16L))
    },
    // reliability diagram + ECE (graft extension, the
    // Curation.calibrationBuckets door)
    "calibration" -> bt(Set("prob", "label", "buckets")) {
      (ctx, n, env) =>
      def lam(name: String) = optLambdas(n, name, env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError(s"calibration: .$name(lambda)"))
      graft.operators.text.Curation.calibrationBuckets(ctx.df,
        lam("prob"), lam("label").cast("boolean"),
        optNum(n, "buckets", env).map(_.toInt).getOrElse(10))
    },
    // Zipf power-law fit (graft extension, the TextOps.zipfFit door):
    // fixed-point least squares over the top-N vocabulary — 1 row out
    "zipf" -> bt(Set("text_field", "top_n")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.zipfFit(ctx.df, Paths.ref(text),
        optNum(n, "top_n", env).map(_.toInt).getOrElse(64))
    },
    // fill-in-the-middle transform (graft extension, the
    // TextOps.fimTransform door)
    "fim" -> bt(Set("text_field", "id_field")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("fim: .id_field"))
      graft.operators.text.TextOps.fimTransform(ctx.df,
        Paths.ref(text), Paths.ref(id))
    },
    // T5 span corruption (graft extension, the TextOps.spanCorrupt
    // door): deterministic denoising (input, target) pairs
    "span_corrupt" -> bt(Set("text_field", "id_field", "rate_ppm",
      "span_len")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("span_corrupt: .id_field"))
      graft.operators.text.TextOps.spanCorrupt(ctx.df,
        Paths.ref(text), Paths.ref(id),
        optNum(n, "rate_ppm", env).map(_.toInt).getOrElse(150000),
        optNum(n, "span_len", env).map(_.toInt).getOrElse(3))
    },
    // sentence segmentation rows (graft extension, the
    // TextOps.sentenceSplit door)
    "sentence_split" -> bt(Set("text_field", "id_field")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("sentence_split: .id_field"))
        graft.operators.text.TextOps.sentenceSplit(ctx.df,
          Paths.ref(text), Paths.ref(id))
    },
    // C4 three-sentence-span corpus dedup (graft extension, the
    // TextOps.spanDedup door): duplicated spans keep one occurrence
    "span_dedup" -> bt(Set("text_field", "id_field", "n")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("span_dedup: .id_field"))
        graft.operators.text.TextOps.spanDedup(ctx.df,
          Paths.ref(text), Paths.ref(id),
          optNum(n, "n", env).map(_.toInt).getOrElse(3))
    },
    // edit-distance near-dup pairs (graft extension, the
    // Dedup.editDupPairs door): LSH candidates + bounded-prefix
    // levenshtein verify
    "edit_pairs" -> bt(Set("text_field", "id_field", "max_dist",
      "prefix_len", "bands", "rows_per_band")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("edit_pairs: .id_field"))
      graft.operators.text.Dedup.editDupPairs(ctx.df,
        Paths.ref(text), Paths.ref(id),
        maxDist = optNum(n, "max_dist", env).map(_.toInt).getOrElse(60),
        prefixLen = optNum(n, "prefix_len", env).map(_.toInt)
          .getOrElse(256),
        bands = optNum(n, "bands", env).map(_.toInt).getOrElse(4),
        rowsPerBand = optNum(n, "rows_per_band", env).map(_.toInt)
          .getOrElse(2))
    },
    // per-dim embedding whitening (graft extension, the
    // VectorCuration.whiten door): bounded stats collect -> pure scan
    "whiten" -> bt(Set("vec_field", "id_field")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("whiten: .id_field"))
      graft.operators.vector.VectorCuration.whiten(ctx.df, id, vec)
    },
    // fixed-point covariance matrix (graft extension, the
    // VectorCuration.covarianceFixed door): flat (i, j, cov) rows
    "covariance" -> bt(Set("vec_field")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      graft.operators.vector.VectorCuration.covarianceFixed(ctx.df, vec)
    },
    // PCA curriculum coordinate (graft extension): covariance ->
    // fixed-point power iteration -> projection, all exact integers
    "pca_project" -> bt(Set("vec_field", "id_field", "iters", "dim")) {
      (ctx, n, env) =>
        val vec = optStr(n, "vec_field", env).getOrElse("embedding")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("pca_project: .id_field"))
        val iters = optNum(n, "iters", env).map(_.toInt).getOrElse(3)
        val dim = optNum(n, "dim", env).map(_.toInt)
          .getOrElse(throw DfsError("pca_project: .dim"))
        val V = graft.operators.vector.VectorCuration
        val v = V.pcaPowerTop(V.covarianceFixed(ctx.df, vec), iters, dim)
        V.pcaProject(ctx.df, id, vec, v)
    },
    // URL canonicalization (graft extension, the Curation.urlCanon
    // door): fragment/www/default-port/tracking-param normalization —
    // the crawl-frontier key every URL-level dedup groups on
    "url_canon" -> bt(Set("field", "as")) { (ctx, n, env) =>
      val field = optStr(n, "field", env).getOrElse("url")
      val as = optStr(n, "as", env).getOrElse("url_canon")
      ctx.df.withColumn(as,
        graft.operators.text.Curation.urlCanon(Paths.ref(field)))
    },
    // trained linear classifier (graft extension, the
    // Curation.linearClassify door): fixed-point full-batch GD,
    // `.train(lambda)` selects the labeled slice, `.positive(lambda)`
    // the positive class
    "linear_classify" -> bt(Set("text_field", "id_field", "train",
      "positive", "buckets", "iters", "lr_num")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("linear_classify: .id_field"))
      val isTrain = optLambdas(n, "train", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("linear_classify: .train(lambda)"))
      val isPos = optLambdas(n, "positive", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("linear_classify: .positive(lambda)"))
      graft.operators.text.Curation.linearClassify(
        ctx.df.filter(isTrain), ctx.df.filter(!isTrain),
        Paths.ref(text), Paths.ref(id), isPos,
        optNum(n, "buckets", env).map(_.toInt).getOrElse(64),
        optNum(n, "iters", env).map(_.toInt).getOrElse(3),
        optNum(n, "lr_num", env).map(_.toLong).getOrElse(16L))
    },
    // multinomial Naive Bayes classifier (graft extension, the
    // Curation.naiveBayesClassify door): `.train(lambda)` selects the
    // labeled slice, everything else is scored against it
    "nb_classify" -> bt(Set("text_field", "id_field", "label",
      "train")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("nb_classify: .id_field"))
      val label = optStr(n, "label", env)
        .getOrElse(throw DfsError("nb_classify: .label"))
      val isTrain = optLambdas(n, "train", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("nb_classify: .train(lambda)"))
      graft.operators.text.Curation.naiveBayesClassify(
        ctx.df.filter(isTrain), ctx.df.filter(!isTrain),
        Paths.ref(text), Paths.ref(id), Paths.ref(label))
    },
    // inverted index (graft extension, the TextOps.invertedIndex
    // door): flat posting rows (term, doc, tf, positions) — partition
    // the sink by term and this is the serving index
    "inverted_index" -> bt(Set("text_field", "id_field")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("inverted_index: .id_field"))
        graft.operators.text.TextOps.invertedIndex(ctx.df,
          Paths.ref(text), Paths.ref(id))
    },
    // winnowing fingerprints (graft extension, the Dedup.winnow door):
    // MOSS rightmost-min window selection over the rolling shingle
    // hashes; `.matches(maxPerFp)` emits the shared-fingerprint pair
    // report instead of the fingerprints
    "winnow" -> bt(Set("text_field", "id_field", "window", "matches")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("winnow: .id_field"))
        val fps = graft.operators.text.Dedup.winnow(ctx.df,
          Paths.ref(text), Paths.ref(id),
          optNum(n, "window", env).map(_.toInt).getOrElse(4))
        optNum(n, "matches", env) match {
          case Some(cap) =>
            graft.operators.text.Dedup.winnowMatches(fps, cap.toInt)
          case None => fps
        }
    },
    // token-distribution KL drift (graft extension, the
    // Curation.tokenKlDrift door): .before/.after lambdas carve the
    // two snapshots out of one stream (the decontaminate .benchmark
    // pattern); per-token smoothed KL(after ‖ before) terms land
    "kl_drift" -> bt(Set("text_field", "before", "after")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val bef = optLambdas(n, "before", env).headOption
          .map(lambdaColumn(_, env.defs))
          .getOrElse(throw DfsError("kl_drift: .before(lambda)"))
        val aft = optLambdas(n, "after", env).headOption
          .map(lambdaColumn(_, env.defs))
          .getOrElse(throw DfsError("kl_drift: .after(lambda)"))
        graft.operators.text.Curation.tokenKlDrift(
          ctx.df.filter(bef), ctx.df.filter(aft), Paths.ref(text))
    },
    // SFT conversation assembly (graft extension, the
    // TextOps.renderChat door): turn rows -> one templated transcript
    // per .by key, turns concatenated in .order (pass a unique order
    // suffix — ties are order-ambiguous in any engine). `.spans()`
    // emits the per-turn loss-mask offsets instead of the transcript.
    "chat_render" -> bt(Set("by", "role_field", "content_field",
      "order", "spans")) { (ctx, n, env) =>
      val by = optStr(n, "by", env)
        .getOrElse(throw DfsError("chat_render: .by"))
      val role = optStr(n, "role_field", env)
        .getOrElse(throw DfsError("chat_render: .role_field"))
      val content = optStr(n, "content_field", env)
        .getOrElse(throw DfsError("chat_render: .content_field"))
      val ord = { val o = optStrs(n, "order", env)
        if (o.isEmpty) Seq("ts_ms") else o }
      if (optFlag(n, "spans", env))
        graft.operators.text.TextOps.chatSpans(ctx.df, Paths.ref(by),
          ord.map(Paths.ref), Paths.ref(role), Paths.ref(content))
      else
        graft.operators.text.TextOps.renderChat(ctx.df, Paths.ref(by),
          ord.map(Paths.ref), Paths.ref(role), Paths.ref(content))
    },
    // C4-style line filtering (graft extension, the TextOps.c4Filter
    // door): line survives iff terminal punctuation + >= .min_words
    // words + no .line_block phrase; doc survives iff no .doc_block
    // phrase and >= .min_lines surviving lines
    "c4_filter" -> bt(Set("text_field", "delimiter", "min_words",
      "line_block", "doc_block", "min_lines")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.c4Filter(ctx.df, Paths.ref(text),
        optStr(n, "delimiter", env).getOrElse("\n"),
        optNum(n, "min_words", env).map(_.toInt).getOrElse(3),
        { val b = optStrs(n, "line_block", env)
          if (b.isEmpty) Seq("javascript", "lorem ipsum") else b },
        { val b = optStrs(n, "doc_block", env)
          if (b.isEmpty) Seq("{") else b },
        optNum(n, "min_lines", env).map(_.toInt).getOrElse(1))
    },
    // count-min heavy hitters (graft extension, the
    // Sketches.heavyHitters door): tokens whose exact count reaches
    // .threshold, nominated by a depth×width count-min sketch — the
    // bounded-memory frequency pass (the full vocabulary never
    // shuffles; the exact count only ever touches candidates)
    "heavy_hitters" -> bt(Set("text_field", "threshold", "depth",
      "width")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val thr = optNum(n, "threshold", env).map(_.toLong)
        .getOrElse(throw DfsError("heavy_hitters: .threshold"))
      graft.operators.text.Sketches.heavyHitters(ctx.df, Paths.ref(text),
        thr,
        optNum(n, "depth", env).map(_.toInt).getOrElse(4),
        optNum(n, "width", env).map(_.toInt).getOrElse(512))
    },
    // HyperLogLog distinct-count (graft extension, the
    // Sketches.hllDistinct door): distinct-token estimate per
    // .group_by group from 2^p registers — the bounded-state distinct
    // — with the exact count(DISTINCT) yardstick joined alongside.
    "hll_distinct" -> bt(Set("text_field", "group_by", "p")) {
      (ctx, n, env) =>
      import org.apache.spark.sql.functions.{broadcast => bcast}
      val text = optStr(n, "text_field", env).getOrElse("text")
      val p = optNum(n, "p", env).map(_.toInt).getOrElse(6)
      val groups = optStrs(n, "group_by", env)
      val base = ctx.df.select(
        groups.map(g => Paths.ref(g).as(g)) :+
          explode(graft.operators.text.TextOps.tokens(Paths.ref(text)))
            .as("tok"): _*)
      graft.core.CacheScope.withPersisted(base) { b =>
        val est = graft.operators.text.Sketches.hllDistinct(b, col("tok"),
          groups.map(g => g -> col(g)), p)
        if (groups.isEmpty)
          est.crossJoin(bcast(
            b.agg(count_distinct(col("tok")).as("exact"))))
        else
          est.join(b.groupBy(groups.map(col): _*)
            .agg(count_distinct(col("tok")).as("exact")), groups)
      }
    },
    // per-group top-k frequent tokens (graft extension, the
    // TextOps.topTokens door): vocabulary-sized count aggregate + a
    // group-partitioned deterministic rank cut
    "top_tokens" -> bt(Set("text_field", "by", "k")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val by = optStr(n, "by", env)
        .getOrElse(throw DfsError("top_tokens: .by"))
      graft.operators.text.TextOps.topTokens(ctx.df, Paths.ref(text),
        Paths.ref(by), by,
        optNum(n, "k", env).map(_.toInt).getOrElse(10))
    },
    // deterministic histogram quantile sketch (graft extension, the
    // Sketches.histQuantiles door): approximate percentiles from
    // bounded (exponent, mantissa-bits) buckets — the replayable
    // percentile at corpus scale
    "quantile_sketch" -> bt(Set("field", "group_by", "ps",
      "mantissa_bits")) { (ctx, n, env) =>
      val f = optStr(n, "field", env)
        .getOrElse(throw DfsError("quantile_sketch: .field"))
      val groups = optStrs(n, "group_by", env)
      if (groups.isEmpty) throw DfsError("quantile_sketch: .group_by")
      val ps = optStrs(n, "ps", env).map(_.toDouble.toInt)
      if (ps.isEmpty) throw DfsError("quantile_sketch: .ps")
      graft.operators.text.Sketches.histQuantiles(ctx.df, Paths.ref(f),
        groups.map(g => g -> Paths.ref(g)), ps,
        optNum(n, "mantissa_bits", env).map(_.toInt).getOrElse(4))
    },
    // exact-substring dedup APPLY (graft extension, the
    // TextOps.spanTrim door): rebuild each doc with duplicated n-gram
    // spans cut, keeping the min-doc-id occurrence
    "span_trim" -> bt(Set("text_field", "id_field", "n", "min_docs")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("span_trim: .id_field"))
      graft.operators.text.TextOps.spanTrim(ctx.df, Paths.ref(text),
        Paths.ref(id),
        optNum(n, "n", env).map(_.toInt).getOrElse(5),
        optNum(n, "min_docs", env).map(_.toInt).getOrElse(2))
    },
    // corpus-snapshot Jaccard (graft extension, the
    // Dedup.corpusJaccardEst door): minhash overlap estimate between
    // the .snapshot(lambda)=0 and =1 slices plus the exact value
    "corpus_jaccard" -> bt(Set("text_field", "snapshot", "k")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val snap = optLambdas(n, "snapshot", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("corpus_jaccard: .snapshot(lambda)"))
      graft.operators.text.Dedup.corpusJaccardEst(ctx.df, Paths.ref(text),
        snap, optNum(n, "k", env).map(_.toInt).getOrElse(8))
    },
    // DSIR importance resampling (graft extension, the TextOps.dsirSample
    // door): keep docs whose hashed-feature importance weight — how
    // target-like the doc's token distribution is — reaches the corpus
    // (1−frac) quantile. `.target` is a per-row lambda marking the
    // target subset; score-only form via `.frac(1)` (keeps everything,
    // lands the weights).
    "dsir_sample" -> bt(Set("text_field", "id_field", "target", "frac",
      "buckets")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("dsir_sample: .id_field"))
      val tgt = optLambdas(n, "target", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("dsir_sample: .target(lambda)"))
      graft.operators.text.TextOps.dsirSample(ctx.df, Paths.ref(text),
        Paths.ref(id), tgt,
        optNum(n, "frac", env).getOrElse(0.5),
        optNum(n, "buckets", env).map(_.toInt).getOrElse(4096))
    },
    // bigram-LM perplexity scoring (graft extension, the
    // TextOps.withPerplexity door): per-doc n_bigrams / nll / ppl —
    // the CCNet-style quality-gate fact; filter with |where() downstream
    "perplexity" -> bt(Set("text_field", "id_field", "smoothing",
      "order")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("perplexity: .id_field"))
      // .smoothing('kn'): interpolated Kneser-Ney (the KenLM/CCNet
      // smoothing); default stays the add-one stand-in.
      // .order(3): trigram KN — only the KN form has a trigram model
      // (add-one has no continuation structure to back off through),
      // so .order(3) without .smoothing('kn') rejects loudly.
      val smoothing = optStr(n, "smoothing", env).getOrElse("add1")
      val order = optNum(n, "order", env).map(_.toInt).getOrElse(2)
      if (order != 2 && order != 3)
        throw DfsError(s"perplexity: .order must be 2 or 3, got $order")
      (smoothing, order) match {
        case ("kn", 3) => graft.operators.text.TextOps
          .withKnTrigramPerplexity(ctx.df, Paths.ref(text), Paths.ref(id))
        case ("kn", 2) => graft.operators.text.TextOps.withKnPerplexity(
          ctx.df, Paths.ref(text), Paths.ref(id))
        case ("add1", 3) => throw DfsError(
          "perplexity: .order(3) needs .smoothing('kn')")
        case ("add1", 2) => graft.operators.text.TextOps.withPerplexity(
          ctx.df, Paths.ref(text), Paths.ref(id))
        case (o, _) => throw DfsError(
          s"perplexity: .smoothing must be 'add1' or 'kn', got '$o'")
      }
    },
    // multi-query BM25 top-k through the inverted index (graft
    // extension, the TextOps.bm25Retrieve door): .queries(lambda)
    // marks the query stratum; .prefix(n) retrieves with the first n
    // chars of the query doc's text (absent = the full text)
    "bm25_retrieve" -> bt(Set("text_field", "id_field", "queries", "k",
      "prefix", "max_postings", "bucketed", "incremental",
      "buckets")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("bm25_retrieve: .id_field"))
      val qpred = optLambdas(n, "queries", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("bm25_retrieve: .queries(lambda)"))
      val qText = optNum(n, "prefix", env).map(_.toInt)
        .map(p => substring(Paths.ref(text), 1, p))
        .getOrElse(Paths.ref(text))
      val k = optNum(n, "k", env).map(_.toInt).getOrElse(10)
      val maxP = optNum(n, "max_postings", env).map(_.toInt).getOrElse(65536)
      val bk = optNum(n, "buckets", env).map(_.toInt).getOrElse(0)
      // .incremental(): the REFRESH lifecycle — stale half + odd half
      // appended, even half upsert-corrected, probed off the live rows
      if (optFlag(n, "incremental", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_bm25_incr")
        graft.operators.serve.IncrementalServe.bm25ServeIncremental(
          ctx.df, Paths.ref(text), Paths.ref(id),
          ctx.df.filter(qpred.cast("boolean")), qText, Paths.ref(id), k,
          "graft_dfs_bm25_incr", tmp, bk, maxP)
      }
      // .bucketed(): posting table written bucketBy(tok) to a real
      // path, re-read through the catalog, probed — same exact
      // fixed-point Okapi either way
      else if (optFlag(n, "bucketed", env)) {
        val tmp = graft.operators.serve.BucketedServe
          .scratchPath("graft_dfs_bm25_idx")
        graft.operators.serve.BucketedServe.bm25ServeBucketed(ctx.df,
          Paths.ref(text), Paths.ref(id),
          ctx.df.filter(qpred.cast("boolean")), qText, Paths.ref(id), k,
          "graft_dfs_bm25_idx", tmp, bk, maxP)
      } else
        graft.operators.text.TextOps.bm25Retrieve(ctx.df, Paths.ref(text),
          Paths.ref(id), ctx.df.filter(qpred.cast("boolean")), qText,
          Paths.ref(id), k, maxP)
    },
    // hybrid BM25+dense retrieval fused by RRF (graft extension, the
    // Fusion.rrfFuse door — the RAG hybrid-search staple): the sparse
    // arm runs bm25_retrieve over THIS stream, the dense arm exact
    // cosine top-k over `.embeddings_table` (read from the same corpus
    // dir), and the two rankings fuse by exact reciprocal-rank sums
    "hybrid_retrieval" -> bt(Set("text_field", "id_field", "queries",
      "prefix", "k", "c", "max_postings", "embeddings_table",
      "vec_field", "vec_id_field", "vec_queries")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("hybrid_retrieval: .id_field"))
      val qpred = optLambdas(n, "queries", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("hybrid_retrieval: .queries(lambda)"))
      val qText = optNum(n, "prefix", env).map(_.toInt)
        .map(p => substring(Paths.ref(text), 1, p))
        .getOrElse(Paths.ref(text))
      val k = optNum(n, "k", env).map(_.toInt).getOrElse(10)
      val c = optNum(n, "c", env).map(_.toInt).getOrElse(60)
      val maxP = optNum(n, "max_postings", env).map(_.toInt)
        .getOrElse(65536)
      val embT = optStr(n, "embeddings_table", env)
        .getOrElse(throw DfsError("hybrid_retrieval: .embeddings_table"))
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val vid = optStr(n, "vec_id_field", env).getOrElse("vec_id")
      val emb = Tables.load(env.spark, env.dir, embT)
      val vqpred = optLambdas(n, "vec_queries", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("hybrid_retrieval: .vec_queries(lambda)"))
      // arms build CONCURRENTLY (Fusion.buildArms, guide §2.6) — the
      // engine twin's rule: overlapping each arm's eager tail
      val arms = graft.operators.vector.Fusion.buildArms(Seq(
        () => graft.operators.text.TextOps.bm25Retrieve(ctx.df,
          Paths.ref(text), Paths.ref(id),
          ctx.df.filter(qpred.cast("boolean")), qText, Paths.ref(id),
          k, maxP)
          .select(col("q_id"), col("doc_id").as("id"),
            col("rank").as("rnk")),
        () => graft.operators.vector.VectorOps.bruteTopK(emb,
          emb.filter(vqpred.cast("boolean")), vid, vec, k)
          .select(col("q_id"), col(vid).as("id"), col("rnk"))))
      graft.operators.vector.Fusion.rrfFuse(arms, c, k)
    },
    // connected components over an (a, b) pair stream (graft extension,
    // the Dedup.connectedComponents door): near-dup pairs → dedup groups
    // triangle counts + local clustering coefficient (graft extension,
    // the Triangles door): degree-oriented wedge join — O(m^1.5)
    // wedge bound on any skew — over the near_dedup 'a'/'b' pair shape
    "triangles" -> bt(Set.empty) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("triangles: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      graft.operators.graph.Triangles.triangleCounts(ctx.df)
    },
    // k-core peeling over the same 'a'/'b' pair shape (graft extension,
    // the GraphOps.kCore door): "which duplicate clusters are dense
    // cores vs borderline chains" — nodes keeping >= k neighbors after
    // iterative peeling, with their within-core degree
    "kcore" -> bt(Set("k", "rounds")) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("kcore: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      graft.operators.graph.GraphOps.kCore(ctx.df,
        optNum(n, "k", env).map(_.toInt)
          .getOrElse(throw DfsError("kcore: .k")),
        optNum(n, "rounds", env).map(_.toInt).getOrElse(8))
    },
    // full coreness decomposition over the same 'a'/'b' pair shape
    // (graft extension, the GraphOps.coreness door): each node's
    // onion-peel depth, capped at .max_k — the cohesion RANK where
    // kcore is the gate
    "coreness" -> bt(Set("max_k", "rounds")) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("coreness: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      graft.operators.graph.GraphOps.coreness(ctx.df,
        optNum(n, "max_k", env).map(_.toInt)
          .getOrElse(throw DfsError("coreness: .max_k")),
        optNum(n, "rounds", env).map(_.toInt).getOrElse(8))
    },
    // deterministic synchronous label-propagation communities over the
    // same 'a'/'b' pair shape (graft extension, the
    // GraphOps.lpaCommunities door): densely-linked duplicate cores
    // stay separate communities where components() would merge them
    // across one bridge link
    "communities" -> bt(Set("rounds")) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("communities: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      graft.operators.graph.GraphOps.lpaCommunities(ctx.df,
        optNum(n, "rounds", env).map(_.toInt).getOrElse(4))
    },
    // LPA + modularity fused over the same 'a'/'b' pair shape (graft
    // extension): community assignment by lpaCommunities, then the
    // division-free per-community modularity report — "are the
    // duplicate families coherent clusters or chance"
    "modularity" -> bt(Set("rounds")) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("modularity: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      val rounds = optNum(n, "rounds", env).map(_.toInt).getOrElse(4)
      graft.operators.graph.GraphOps.modularityReport(ctx.df,
        graft.operators.graph.GraphOps.lpaCommunities(ctx.df, rounds))
    },
    // per-doc tf-idf keywords (graft extension, the
    // TextOps.tfidfTopTerms door)
    "tfidf_terms" -> bt(Set("text_field", "id_field", "k")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("tfidf_terms: .id_field"))
      graft.operators.text.TextOps.tfidfTopTerms(ctx.df,
        Paths.ref(text), Paths.ref(id),
        optNum(n, "k", env).map(_.toInt).getOrElse(5))
    },
    // train/test split-leakage report (graft extension, the
    // Curation.splitLeakPairs door): near-dup pairs straddling the
    // split_assign splits
    "split_leak" -> bt(Set("text_field", "id_field", "names",
      "fractions", "threshold", "bands", "rows_per_band")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("split_leak: .id_field"))
      val names = optStrs(n, "names", env)
      val fracs = optVals(n, "fractions", env).map {
        case VNum(v, _) => v
        case VLong(l) => l.toDouble
        case v => throw DfsError(
          s"split_leak: .fractions expects numbers, got $v")
      }
      if (names.isEmpty || names.size != fracs.size)
        throw DfsError("split_leak: .names and .fractions must pair up")
      graft.operators.text.Curation.splitLeakPairs(ctx.df,
        Paths.ref(text), Paths.ref(id), names.zip(fracs),
        optNum(n, "threshold", env).getOrElse(0.3),
        optNum(n, "bands", env).map(_.toInt).getOrElse(4),
        optNum(n, "rows_per_band", env).map(_.toInt).getOrElse(2))
    },
    // SimHash block-blocking near-dup pairs (graft extension, the
    // Dedup.simhashDupPairs door): exact-recall candidates via the
    // 4-block pigeonhole, popcount verify
    "simhash_pairs" -> bt(Set("text_field", "id_field",
      "max_hamming", "bits", "auto", "target_bucket")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("simhash_pairs: .id_field"))
      val maxH = optNum(n, "max_hamming", env).map(_.toInt).getOrElse(3)
      val auto = optFlag(n, "auto", env)
      val target = optNum(n, "target_bucket", env).map(_.toInt)
      if (!auto && target.nonEmpty)
        throw DfsError("simhash_pairs: .target_bucket is the .auto() " +
          "occupancy knob and has no effect without .auto()")
      // .bits(64): the wide-key deploy form (16-bit bands, or .auto()
      // band width from the BENCH_NOTES_r19 §2 key-space law); 32 is
      // the fixture-pinned original (4×8-bit byte blocks)
      optNum(n, "bits", env).map(_.toInt).getOrElse(32) match {
        case 64 if auto =>
          graft.operators.text.Dedup.simhash64DupPairsAuto(ctx.df,
            Paths.ref(text), Paths.ref(id), maxH,
            target.getOrElse(128))
        case 64 => graft.operators.text.Dedup.simhash64DupPairs(ctx.df,
          Paths.ref(text), Paths.ref(id), maxH)
        case 32 if auto => throw DfsError("simhash_pairs: .auto() needs " +
          ".bits(64) — the 32-bit fixture form has fixed byte blocks")
        case 32 => graft.operators.text.Dedup.simhashDupPairs(ctx.df,
          Paths.ref(text), Paths.ref(id), maxH)
        case o => throw DfsError(s"simhash_pairs: .bits must be 32 or 64, got $o")
      }
    },
    // content-defined chunking (graft extension, the Dedup.cdcChunks /
    // cdcDupReport doors): shift-resistant chunk rows, or with
    // .report() the per-doc shared-chunk fraction rollup
    "cdc_chunks" -> bt(Set("text_field", "id_field", "mask",
      "report")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("cdc_chunks: .id_field"))
      val mask = optNum(n, "mask", env).map(_.toInt).getOrElse(16)
      if (optFlag(n, "report", env))
        graft.operators.text.Dedup.cdcDupReport(ctx.df,
          Paths.ref(text), Paths.ref(id), mask)
      else
        graft.operators.text.Dedup.cdcChunks(ctx.df,
          Paths.ref(text), Paths.ref(id), mask)
    },
    // same-source common-prefix boilerplate strip (graft extension,
    // the TextOps.commonPrefixStrip door)
    "prefix_strip" -> bt(Set("text_field", "id_field", "source_field",
      "min_docs", "max_prefix")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("prefix_strip: .id_field"))
      val src = optStr(n, "source_field", env)
        .getOrElse(throw DfsError("prefix_strip: .source_field"))
      graft.operators.text.TextOps.commonPrefixStrip(ctx.df,
        Paths.ref(text), Paths.ref(id), Paths.ref(src),
        optNum(n, "min_docs", env).map(_.toInt).getOrElse(2),
        optNum(n, "max_prefix", env).map(_.toInt).getOrElse(64))
    },
    // containment near-dup pairs (graft extension, the
    // Dedup.containmentPairs door): asymmetric quote/wrapper detection
    // over the same banded LSH candidates as near_dedup
    "containment" -> bt(Set("text_field", "id_field", "threshold_ppm",
      "bands", "rows_per_band")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("containment: .id_field"))
      graft.operators.text.Dedup.containmentPairs(ctx.df,
        Paths.ref(text), Paths.ref(id),
        optNum(n, "threshold_ppm", env).map(_.toLong).getOrElse(500000L),
        optNum(n, "bands", env).map(_.toInt).getOrElse(4),
        optNum(n, "rows_per_band", env).map(_.toInt).getOrElse(2))
    },
    // robust per-group outlier flag (graft extension, the
    // Sketches.robustZOutliers door): modified z over two replayable
    // quantile-sketch medians
    "robust_z" -> bt(Set("field", "id_field", "group_by", "z_micro",
      "mantissa_bits")) { (ctx, n, env) =>
      val f = optStr(n, "field", env)
        .getOrElse(throw DfsError("robust_z: .field"))
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("robust_z: .id_field"))
      val groups = optStrs(n, "group_by", env)
      if (groups.isEmpty) throw DfsError("robust_z: .group_by")
      graft.operators.text.Sketches.robustZOutliers(ctx.df,
        Paths.ref(f), Paths.ref(id),
        groups.map(g => g -> Paths.ref(g)),
        optNum(n, "z_micro", env).map(_.toLong).getOrElse(3500000L),
        optNum(n, "mantissa_bits", env).map(_.toInt).getOrElse(4))
    },
    // quality-aware near-dup survivor selection (graft extension, the
    // Dedup.nearDupSurvivors door): keep the (quality desc, id) max
    // per near-dup cluster instead of keep-min
    "dedup_survivors" -> bt(Set("text_field", "id_field",
      "quality_field", "threshold", "bands", "rows_per_band")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("dedup_survivors: .id_field"))
      val q = optStr(n, "quality_field", env)
        .getOrElse(throw DfsError("dedup_survivors: .quality_field"))
      graft.operators.text.Dedup.nearDupSurvivors(ctx.df,
        Paths.ref(text), Paths.ref(id), Paths.ref(q),
        optNum(n, "threshold", env).getOrElse(0.3),
        optNum(n, "bands", env).map(_.toInt).getOrElse(4),
        optNum(n, "rows_per_band", env).map(_.toInt).getOrElse(2))
    },
    // hybrid retrieval composite (graft extension, the Fusion door):
    // dense exact-cosine and binary-Hamming top-k per query (queries =
    // id % every == 0 of the stream), fused by reciprocal-rank fusion
    // in exact nano integer arithmetic
    "hybrid_topk" -> bt(Set("id_field", "vec_field", "every", "k",
      "c")) { (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("hybrid_topk: .id_field"))
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val every = optNum(n, "every", env).map(_.toLong)
        .getOrElse(throw DfsError("hybrid_topk: .every"))
      val k = optNum(n, "k", env).map(_.toInt).getOrElse(10)
      val c = optNum(n, "c", env).map(_.toInt).getOrElse(60)
      import org.apache.spark.sql.functions.col
      val q = ctx.df.filter(col(id) % every === 0)
      graft.operators.vector.VectorOps.hybridTopK(ctx.df, q, id, vec, k, c)
    },
    // PMI collocation mining (graft extension, the Collocations door):
    // fixed-point lnNano adjacent-pair PMI, min-count-gated, top-k
    "collocations" -> bt(Set("text_field", "min_count", "k")) {
      (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.Collocations.pmiTopK(ctx.df, Paths.ref(text),
        optNum(n, "min_count", env).map(_.toLong).getOrElse(3L),
        optNum(n, "k", env).map(_.toInt).getOrElse(50))
    },
    "components" -> bt(Set("max_iter", "algo")) { (ctx, n, env) =>
      if (!ctx.df.columns.contains("a") || !ctx.df.columns.contains("b"))
        throw DfsError("components: input needs 'a'/'b' pair columns " +
          "(the near_dedup output shape)")
      val maxIter = optNum(n, "max_iter", env).map(_.toInt).getOrElse(20)
      optStr(n, "algo", env).getOrElse("label") match {
        case "label" =>
          graft.operators.text.Dedup.connectedComponents(ctx.df, maxIter)
        case "stars" => // large-star/small-star: O(log n) rounds, skew-proof
          graft.operators.graph.GraphOps.connectedComponentsStars(ctx.df,
            if (optNum(n, "max_iter", env).isDefined) maxIter else 30)
        case other => throw DfsError(
          s"components: .algo must be 'label' or 'stars', got '$other'")
      }
    },

    // per-domain cap (graft extension, the Curation.capPerKey door): at
    // most .n rows per .by key, chosen by the deterministic md5 rank —
    // the "N pages per host" web-curation rule
    "domain_cap" -> bt(Set("by", "id_field", "n")) { (ctx, n, env) =>
      val by = optStrs(n, "by", env)
      if (by.isEmpty) throw DfsError("domain_cap: .by")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("domain_cap: .id_field"))
      graft.operators.text.Curation.capPerKey(ctx.df,
        by.map(Paths.ref), Paths.ref(id),
        optNum(n, "n", env).map(_.toInt).getOrElse(1000))
    },
    // deterministic global shuffle (graft extension, the
    // Curation.shuffleOrder door): reproducible training order — a
    // 0-based position keyed on md5(seed|id). Batch-only by nature.
    "shuffle_order" -> bt(Set("id_field", "seed", "as")) { (ctx, n, env) =>
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("shuffle_order: .id_field"))
      graft.operators.text.Curation.shuffleOrder(ctx.df, Paths.ref(id),
        optStr(n, "seed", env).getOrElse("0"),
        optStr(n, "as", env).getOrElse("pos"))
    },
    // embedding cluster cap (graft extension, the
    // VectorCuration.clusterCap door): assign to md5-seeded centroids,
    // keep at most .n rows per cluster — diversity pruning in
    // embedding space
    "cluster_cap" -> bt(Set("vec_field", "id_field", "clusters", "dim",
      "n")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("cluster_cap: .id_field"))
      val k = optNum(n, "clusters", env).map(_.toInt).getOrElse(8)
      val dim = optNum(n, "dim", env).map(_.toInt)
        .getOrElse(throw DfsError("cluster_cap: .dim"))
      graft.operators.vector.VectorCuration.clusterCap(ctx.df, id, vec,
        graft.operators.vector.VectorCuration.seedCentroids(k, dim),
        optNum(n, "n", env).map(_.toInt).getOrElse(1000))
    },
    // margin-criterion pair mining (graft extension, the
    // VectorCuration.marginPairs door): `.src` is a per-row lambda
    // splitting the table into src/tgt sides; best-match pairs with
    // neighborhood-relative margin in exact ppm
    "margin_pairs" -> bt(Set("vec_field", "id_field", "src", "k",
      "threshold_ppm")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("margin_pairs: .id_field"))
      val isSrc = optLambdas(n, "src", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("margin_pairs: .src(lambda)"))
      graft.operators.vector.VectorCuration.marginPairs(
        ctx.df.filter(isSrc), ctx.df.filter(!isSrc), id, vec,
        optNum(n, "k", env).map(_.toInt).getOrElse(4),
        optNum(n, "threshold_ppm", env).map(_.toLong).getOrElse(0L))
    },
    // greedy k-center coreset selection (graft extension, the
    // VectorCuration.kcenter door): Gonzalez farthest-point traversal —
    // pick .k maximally-spread rows, assign everything to its nearest
    // pick with the covering distance in micro-units
    "kcenter" -> bt(Set("vec_field", "id_field", "k")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("kcenter: .id_field"))
      graft.operators.vector.VectorCuration.kcenter(ctx.df, id, vec,
        optNum(n, "k", env).map(_.toInt)
          .getOrElse(throw DfsError("kcenter: .k")))
    },
    // embedding outlier pruning (graft extension, the
    // VectorCuration.clusterOutlierPrune door): per seeded cluster,
    // keep the .keep_frac closest rows by exact sq-dist — the distance
    // tail is the off-manifold junk. `.annotate()` lands is_outlier
    // instead of dropping.
    "outlier_prune" -> bt(Set("vec_field", "id_field", "clusters",
      "dim", "keep_frac", "annotate")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("outlier_prune: .id_field"))
      val k = optNum(n, "clusters", env).map(_.toInt).getOrElse(8)
      val dim = optNum(n, "dim", env).map(_.toInt)
        .getOrElse(throw DfsError("outlier_prune: .dim"))
      graft.operators.vector.VectorCuration.clusterOutlierPrune(ctx.df,
        id, vec,
        graft.operators.vector.VectorCuration.seedCentroids(k, dim),
        optNum(n, "keep_frac", env)
          .getOrElse(throw DfsError("outlier_prune: .keep_frac")),
        annotate = optFlag(n, "annotate", env))
    },
    // kNN label propagation (graft extension, the
    // VectorCuration.knnLabel door): `.labeled` is a per-row lambda
    // marking the labeled subset (the vs_index `.index` pattern); the
    // rest take the majority label of their k nearest labeled rows
    "knn_label" -> bt(Set("vec_field", "id_field", "label_field",
      "labeled", "k")) { (ctx, n, env) =>
      val vec = optStr(n, "vec_field", env).getOrElse("embedding")
      val id = optStr(n, "id_field", env)
        .getOrElse(throw DfsError("knn_label: .id_field"))
      val lab = optStr(n, "label_field", env).getOrElse("label")
      val isLab = optLambdas(n, "labeled", env).headOption
        .map(lambdaColumn(_, env.defs))
        .getOrElse(throw DfsError("knn_label: .labeled(lambda)"))
      graft.operators.vector.VectorCuration.knnLabel(
        ctx.df.filter(isLab), ctx.df.filter(!isLab), id, vec, lab,
        optNum(n, "k", env).map(_.toInt).getOrElse(5))
    },

    // RAG chunking (graft extension, the TextOps.chunkTokens door):
    // fixed-size overlapping token windows with full tail coverage
    "chunk" -> bt(Set("text_field", "id_field", "size", "stride")) {
      (ctx, n, env) =>
        val text = optStr(n, "text_field", env).getOrElse("text")
        val id = optStr(n, "id_field", env)
          .getOrElse(throw DfsError("chunk: .id_field"))
        val sz = optNum(n, "size", env).map(_.toInt).getOrElse(128)
        graft.operators.text.TextOps.chunkTokens(ctx.df, Paths.ref(text),
          Paths.ref(id), sz,
          optNum(n, "stride", env).map(_.toInt).getOrElse(sz / 2 max 1))
    },
    // coverage-cutoff vocabulary (graft extension, the
    // TextOps.vocabCoverage door) — batch by nature (the cutoff is a
    // corpus-global property)
    "vocab" -> bt(Set("text_field", "cutoff")) { (ctx, n, env) =>
      val text = optStr(n, "text_field", env).getOrElse("text")
      graft.operators.text.TextOps.vocabCoverage(ctx.df, Paths.ref(text),
        optNum(n, "cutoff", env).getOrElse(0.9))
    },

    // win_clock — processing-time window (ref: esp_win_clock.erl:33-136);
    // .align() floors the emitted window timestamp to the unit boundary
    // (:121-127). Non-deterministic by nature — excluded from oracles.
    "win_clock" -> NodeDef(Some(Point), Batch,
      Set("every", "period", "align", "fill_period"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        val every = optDurMs(n, "every", env)
          .getOrElse(throw DfsError("win_clock: .every"))
        // .period > .every = sliding clock window (esp_win_clock.erl
        // options: period is the window length, every the emit interval)
        val period = optDurMs(n, "period", env).getOrElse(every)
        val align = optVals(n, "align", env).headOption match {
          case Some(VDur(ms, _)) => Some(ms)
          case Some(VNum(v, _)) => Some(v.toLong)
          case Some(VLong(l)) => Some(l)
          case Some(VBool(true)) => Some(every)
          case Some(VBool(false)) => None
          case None => if (n.options.contains("align")) Some(every) else None
          case Some(v) => throw DfsError(s"win_clock: bad .align value $v")
        }
        ctx.copy(win = Some(Win("clock", period, every,
          fillPeriod = n.options.contains("fill_period"), align)),
          io = Batch)
      })
  )

  /** An HTTP endpoint's bus topic: (port, path) — host is irrelevant in
    * the loopback (the listen side binds locally).
    */
  private def httpTopic(n: NodeSpec, env: Env): String = {
    val port = optNum(n, "port", env).map(_.toLong).getOrElse(80L)
    val path = optStr(n, "path", env).getOrElse("/")
    s"http:$port:$path"
  }

  private def socketTopic(proto: String, n: NodeSpec, env: Env): String = {
    val ip = optStr(n, "ip", env).orElse(optStr(n, "host", env))
      .getOrElse("0.0.0.0")
    val port = optNum(n, "port", env).map(_.toLong)
      .getOrElse(throw DfsError(s"${n.name}: .port"))
    s"$proto:$ip:$port"
  }

  private def modbusSource(opts: Set[String]): NodeDef =
    NodeDef(None, Point, opts,
      (_, n, env) => {
        val ip = optStr(n, "ip", env).getOrElse("0.0.0.0")
        val port = optNum(n, "port", env).map(_.toLong).getOrElse(502L)
        // function may be positional (win_time_test.dfs `modbus('hregs')`);
        // the same-length rule applies only across the lists actually
        // given — an omitted count/from defaults per-read, like the
        // reference's same_length skipping undefined options
        val fs = optVals(n, "function", env) ++
          n.args.map(resolve(_, env.defs)).collect { case VStr(v) => VStr(v) }
        val froms = optVals(n, "from", env)
        val counts = optVals(n, "count", env)
        val as = optVals(n, "as", env)
        val given = Seq(fs, froms, counts, as).filter(_.nonEmpty)
        if (given.map(_.size).distinct.size > 1)
          throw DfsError(s"${n.name}: function/from/count/as same length")
        subscribeLanded(env, s"modbus:$ip:$port", stream = false)
      })

  private def socketSource(proto: String): NodeDef =
    NodeDef(None, Both,
      Set("ip", "host", "port", "min_length", "extract", "parser", "as",
        "stream", "packet", "timeout", "changed", "every",
        "line_delimiter", "payload_schema"),
      (_, n, env) => subscribeLanded(env, socketTopic(proto, n, env),
        optStr(n, "stream", env).contains("true"),
        declared = declaredPayloadSchema(n, env),
        jsonPayload = false)) // line-framed: envelope-only is a valid plan

  private def socketSink(proto: String): NodeDef =
    NodeDef(Some(Both), Both,
      Set("ip", "host", "port", "every", "packet", "timeout", "field",
        "msg_json", "msg_text", "response_as", "response_json",
        "response_timeout"),
      (c, n, env) => {
        val ctx = requireCtx(c, n.name)
        graft.sources.Loopback.publish(ctx.df, socketTopic(proto, n, env))
        ctx
      })

  /** Field-mapped insert frame shared by the crate sinks: faxe_fields
    * renamed to db_fields, leftover columns folded into one JSON object
    * under remaining_fields_as (esp_http_post_crate.erl:58-66).
    */
  private def crateSink(c: Option[Ctx], n: NodeSpec, env: Env,
      viaJdbc: Boolean): Ctx = {
    val ctx = requireCtx(c, n.name)
    val table = optStr(n, "table", env)
      .getOrElse(throw DfsError(s"${n.name}: .table"))
    val host = optStr(n, "host", env).getOrElse("localhost")
    val port = optNum(n, "port", env).map(_.toLong).getOrElse(4200L)
    val db = optStr(n, "database", env).getOrElse("doc")
    val dbf = optStrs(n, "db_fields", env)
    val fxf = optStrs(n, "faxe_fields", env)
    if (dbf.size != fxf.size)
      throw DfsError(s"${n.name}: db_fields/faxe_fields same length")
    val remAs = optStr(n, "remaining_fields_as", env)
    val mapped =
      if (dbf.isEmpty && remAs.isEmpty) ctx.df
      else {
        val named = fxf.zip(dbf).map { case (f, d) => Paths.ref(f).as(d) }
        val rem = remAs.map { as =>
          val used = fxf.toSet
          val left = ctx.df.columns.filterNot(used)
          to_json(struct(left.toIndexedSeq.map(col): _*)).as(as)
        }
        ctx.df.select(named ++ rem: _*)
      }
    if (viaJdbc && host.startsWith("jdbc:"))
      graft.io.Jdbc.write(mapped, host, table)
    else
      graft.sources.Loopback.publish(mapped, s"crate:$host:$port:$db.$table")
    ctx
  }

  /** Endpoint subscribe with the reference's payload landing: broker and
    * http payloads are JSON documents whose decoded fields become the
    * point's fields (esp_mqtt_subscribe.erl:155-170 — payload decode,
    * then set_root with the undefined `as` default keeps them at the
    * root). The loopback envelope (offset/ts_ms/topic/key/payload) stays;
    * payload fields land alongside it, envelope names winning a collision
    * (the reference sets `topic` AFTER the payload fields, topic_as
    * default 'topic'). The payload schema comes from `.payload_schema`
    * (DDL, a graft extension — the contract a real broker binding would
    * carry) or is inferred at plan time: a BATCH subscribe infers over
    * its OWN full payload column (distributed `spark.read.json`, nothing
    * collected to the driver); a STREAMING subscribe samples the LAST
    * [[SchemaSampleN]] logged messages (a stream has no batch frame to
    * infer from). A streaming subscribe with neither — on a node family
    * whose payloads ARE JSON (`jsonPayload`: broker/http) — fails
    * loudly: planning it against an empty topic would freeze an
    * envelope-only schema for the query's lifetime and silently null
    * every landed-field lambda once traffic arrives (the reference
    * decodes per message and cannot go blind this way,
    * esp_mqtt_subscribe.erl:155-170). Line-framed socket payloads are
    * legitimately non-JSON — those plan envelope-only as before.
    */
  private val SchemaSampleN = 100L

  private def subscribeLanded(env: Env, topic: String,
      stream: Boolean, group: String = "default",
      declared: Option[org.apache.spark.sql.types.StructType] = None,
      jsonPayload: Boolean = true): Ctx = {
    val df =
      if (stream) graft.sources.Loopback.subscribeStream(env.spark, topic, group)
      else graft.sources.Loopback.subscribe(env.spark, topic)
    val schemaOpt: Option[org.apache.spark.sql.types.StructType] =
      declared.orElse {
        import env.spark.implicits._
        if (!stream) {
          // batch: the frame IS the data — infer over every payload,
          // executor-side
          val inferred = env.spark.read
            .json(df.select(col("payload")).as[String].filter(_ != null))
            .schema
          Some(inferred).filter(_.fields.nonEmpty)
        } else {
          val hi = graft.sources.LoopbackBus.latest(topic)
          val payloads = graft.sources.LoopbackBus
            .read(topic, math.max(-1L, hi - SchemaSampleN), hi)
            .flatMap(m => Option(m.payload))
          if (payloads.nonEmpty)
            Some(env.spark.read.json(payloads.toDS()).schema)
          else if (jsonPayload) throw DfsError(
            s"subscribe '$topic': a streaming subscribe planned against " +
              "an empty topic would never land payload fields (the " +
              "schema is fixed at plan time) — declare .payload_schema(" +
              "'name type, ...') or seed the topic first")
          else None
        }
      }
    val landed = schemaOpt match {
      case None => df
      case Some(schema) =>
        val fs = schema.fields.toSeq.filterNot(f =>
          f.name == "_corrupt_record" || df.columns.contains(f.name))
        if (fs.isEmpty) df
        else {
          val clean = org.apache.spark.sql.types.StructType(fs.toArray)
          // a JSON-ARRAY payload is a BATCH of points (flowdata
          // from_json_list_test): ArrayType parses both forms — a bare
          // object lands as a 1-element array — and explode_outer emits
          // one row per point while keeping unparsable payloads as
          // envelope-only rows
          val withP = df.withColumn("_pl", explode_outer(
            from_json(col("payload"),
              org.apache.spark.sql.types.ArrayType(clean),
              Map.empty[String, String])))
          fs.foldLeft(withP)((d, f) =>
            d.withColumn(f.name, col("_pl").getField(f.name))).drop("_pl")
        }
    }
    Ctx(landed, Nil, None, Point, "", "ts_ms")
  }

  /** `.payload_schema('val double, name string')` → StructType; DDL
    * parse errors surface as DfsError with the node name attached.
    */
  private def declaredPayloadSchema(n: NodeSpec, env: Env)
      : Option[org.apache.spark.sql.types.StructType] =
    optStr(n, "payload_schema", env).map { ddl =>
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch { case e: Exception =>
        throw DfsError(s"${n.name}: .payload_schema DDL: ${e.getMessage}")
      }
    }

  private val EnvelopeCols =
    Set("offset", "ts_ms", "topic", "key", "payload")

  /** The landing options every decoding endpoint shares:
    * `.clean_field_names(true)` replaces dots in landed payload keys
    * with underscores (flowdata:clean_field_keys, clean_keys_test:
    * 'df.' -> 'df_', 'this.is.a.key.with.points' ->
    * 'this_is_a_key_with_points' — values untouched), then `.as(path)`
    * nests the landed fields under the path (flowdata:set_root —
    * set_root_not_present[_deep]_test). An `undefined` as is a no-op,
    * and so is a path whose root the payload ALREADY carries
    * (set_root_present[_deep]_test: re-rooting an already-rooted point
    * must not double-nest). Envelope columns are transport metadata and
    * never move.
    */
  private def applyLandingOpts(ctx: Ctx, n: NodeSpec, env: Env): Ctx = {
    val landed0 = ctx.df.columns.toSeq.filterNot(EnvelopeCols)
    if (landed0.isEmpty) return ctx
    val clean = optFlag(n, "clean_field_names", env)
    val df1 =
      if (!clean) ctx.df
      else landed0.foldLeft(ctx.df) { (d, c) =>
        val nc = c.replace('.', '_')
        if (nc == c) d else d.withColumnRenamed(c, nc)
      }
    val landed = if (clean) landed0.map(_.replace('.', '_')) else landed0
    optStr(n, "as", env) match {
      case Some(as)
          if !landed.contains(Paths.parse(as).head.name) =>
        // stage the struct before dropping its source columns (the
        // reserved NUL prefix keeps it collision-proof, as in keep)
        val tmp = "\u0000as"
        val staged = df1.withColumn(tmp,
          struct(landed.map(c => col(s"`$c`").as(c)): _*))
        ctx.copy(df = Paths.set(staged.drop(landed: _*), as,
          col(s"`$tmp`")).drop(tmp))
      case _ => ctx.copy(df = df1)
    }
  }

  private def brokerSubscribe(n: NodeSpec, env: Env, topicOpt: String): Ctx = {
    val topic = optStr(n, topicOpt, env)
      .orElse(optStrs(n, "topics", env).headOption) // first of a topic list
      .orElse(argStrs(n, env).headOption)
      .getOrElse(throw DfsError(s"${n.name}: .$topicOpt"))
    val group = optStr(n, "group", env).getOrElse("default")
    val ctx = subscribeLanded(env, topic,
      optStr(n, "stream", env).contains("true"), group,
      declaredPayloadSchema(n, env))
    // the payload's own timestamp field becomes the point's event time
    // (esp_mqtt_subscribe.erl:65-70 dt_field/dt_format defaults, decode
    // at :155-170); rows without it keep the transport time. float_micro
    // is seconds.microseconds, rounded to ms — lambda_tests.erl
    // grip_rewrite pins "1574067119.037648" -> 1574067119038.
    val explicitDt = optStr(n, "dt_field", env)
    val dtField = explicitDt.getOrElse("ts")
    val dtFormat = optStr(n, "dt_format", env).getOrElse("millisecond")
    val timed =
      if (!ctx.df.columns.contains(dtField)) ctx
      else {
        val src = col(s"`$dtField`")
        val parsed = dtFormat match {
          case "millisecond" => src.cast("long")
          case "second" => (src.cast("double") * 1000).cast("long")
          case "float_micro" =>
            round(src.cast("double") * 1000, 0).cast("long")
          case "iso8601" => unix_millis(to_timestamp(src))
          case other =>
            throw DfsError(s"${n.name}: unsupported .dt_format '$other'")
        }
        val over = ctx.df.withColumn("ts_ms",
          coalesce(parsed, col("ts_ms")))
        // the DEFAULT 'ts' key is CONSUMED — removed from the fields
        // (from_json_basic_test) — while an explicit .dt_field stays a
        // field (from_json_basic2_test keeps "UTC-Time")
        ctx.copy(df =
          if (explicitDt.isEmpty) over.drop(dtField) else over)
      }
    // decode order matches the reference: ts from the payload's own
    // field first, THEN clean_field_names / set_root re-shape the fields
    applyLandingOpts(timed, n, env)
  }

  private def brokerPublish(ctx: Ctx, n: NodeSpec, env: Env,
      topicOpt: String): Ctx = {
    val topic = optStr(n, topicOpt, env).getOrElse("")
    val topicCol = optStr(n, "topic_field", env)
      .orElse(optStr(n, "routing_key_field", env)) // amqp naming
      .map(f => Paths.ref(f))
      .orElse((optLambdas(n, "topic_lambda", env) ++
        optLambdas(n, "routing_key_lambda", env)).headOption
        .map(lambdaColumn(_, env.defs)))
    if (topicCol.isEmpty && topic.isEmpty)
      throw DfsError(s"${n.name}: .$topicOpt or .topic_field")
    val hasPayload = ctx.df.columns.contains("payload")
    // a pending count-window (the `batch` node) materializes its
    // boundary as batch_id for the wire grouping below
    val src0 = ctx.win match {
      case Some(Win("count", p, e, _, _))
          if p == e && ctx.io == Batch && !hasPayload &&
            !ctx.df.columns.contains("batch_id") && !ctx.df.isStreaming =>
        graft.operators.restructure.Restructure.batchify(
          ctx.df, p.toInt,
          if (ctx.tsMs.nonEmpty && ctx.df.columns.contains(ctx.tsMs))
            orderCols(ctx)
          else Seq(lit(1L)), // no event time: arrival order
          keyCols(ctx))
      case _ => ctx.df
    }
    // the point's own columns only — the routing topic is envelope
    // metadata (esp_mqtt_publish.erl publishes the point), batch_id is
    // engine bookkeeping, and ts_ms serializes under the wire key "ts"
    // (flowdata to_json — see Loopback.publish's wire note)
    def pointJson(d: DataFrame): Column = to_json(struct(
      d.columns.toIndexedSeq.filterNot(_ == "batch_id").map {
        case "ts_ms" if !d.columns.contains("ts") =>
          col("`ts_ms`").as("ts")
        case c => col(s"`$c`")
      }: _*))
    val toSend =
      if (ctx.io == Batch && src0.columns.contains("batch_id") &&
          !hasPayload) {
        // a BATCH stream publishes ONE message per batch: a JSON array
        // of point objects, each with its own ts (flowdata
        // batch_to_json_test), points in ts order; the message's
        // transport time is the batch's newest point. The subscribe
        // side's array landing explodes it back to points, so a bus
        // round-trip preserves the rows.
        val sk =
          if (src0.columns.contains("ts_ms")) col("`ts_ms`")
          else lit(0L)
        src0
          .withColumn("_pj", pointJson(src0))
          .withColumn("_tp", topicCol.getOrElse(lit(topic)).cast("string"))
          .groupBy(col("batch_id"), col("_tp"))
          .agg(max(sk).as("ts_ms"),
            array_join(transform(
              array_sort(collect_list(
                struct(sk.as("k"), col("_pj").as("v")))),
              x => x.getField("v")), ",").as("_arr"))
          .select(col("_tp").as("topic"), col("ts_ms"),
            concat(lit("["), col("_arr"), lit("]")).as("payload"))
      } else topicCol match {
        case Some(c0) =>
          // Materialize the payload BEFORE adding the synthetic routing
          // column, so the topic never leaks into the published JSON.
          val base =
            if (hasPayload) ctx.df
            else ctx.df.withColumn("payload", pointJson(ctx.df))
          base.withColumn("topic", c0.cast("string"))
        case None => ctx.df
      }
    graft.sources.Loopback.publish(toSend, topic)
    ctx
  }

  /** Substitute `__fieldname` in a rename lambda; any other field
    * reference makes the name row-dependent — impossible in a relational
    * schema — and is rejected with the reason.
    */
  private def substFieldName(e: LExpr, name: String): LExpr = e match {
    case LField("__fieldname") => LStr(name)
    case LField(other) => throw DfsError(
      "rename: lambda-computed names must be row-independent — field " +
        s"""reference "$other" is not allowed (only "__fieldname")""")
    case LBin(op, l, r) =>
      LBin(op, substFieldName(l, name), substFieldName(r, name))
    case LNot(x) => LNot(substFieldName(x, name))
    case LCall(fn, args) => LCall(fn, args.map(substFieldName(_, name)))
    case other => other
  }

  /** Value → plain Scala value, for MemStore population. */
  private def valueAny(v: Value): Any = v match {
    case VStr(s) => s
    case VNum(d, true) => d.toLong
    case VNum(d, false) => d
    case VLong(l) => l
    case VBool(b) => b
    case VDur(ms, _) => ms
    case other => throw DfsError(s"mem: cannot store $other")
  }

  private def valueToLit(v: Value): LExpr = v match {
    case VStr(s) => LStr(s)
    case VNum(d, i) => LNum(d, i)
    case VLong(l) => LLong(l)
    case VBool(b) => LBool(b)
    case VDur(ms, _) => LNum(ms.toDouble, isInt = true)
    case VLambda(e) => e
    case other => throw DfsError(s"unexpected value $other")
  }

  /** top/bottom-N rows per key by a field (refs: stats/esp_top.erl:16-24,
    * esp_bottom.erl:16-28) — per-key row_number rank, no global sort.
    */
  private def topBottom(ctx: Ctx, n: NodeSpec, env: Env, desc: Boolean): DataFrame = {
    val field = optStr(n, "field", env)
      .getOrElse(throw DfsError(s"${n.name}: .field"))
    if (ctx.keys.isEmpty)
      throw DfsError(s"${n.name} needs group_by keys upstream " +
        "(a keyless rank is a global sort)")
    val k = optNum(n, "n", env).getOrElse(1.0).toInt
    val ord = if (desc) col(field).desc else col(field).asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols(ctx): _*).orderBy(ord +: orderCols(ctx): _*)
    ctx.df.withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= k).drop("_rnk")
  }

  /** Event time of a windowed aggregate's output: the window start
    * (the reference stamps emitted points with the window ts). Keyed
    * non-windowed aggregates have no row time left.
    */
  private def aggEventTime(ctx: Ctx): String = ctx.win match {
    case Some(Win("time", _, _, _, _)) | Some(Win("clock", _, _, _, _)) =>
      "window_start_ms"
    case Some(Win("session", _, _, _, _)) => "session_start_ms"
    case _ => ""
  }

  private def groupedAgg(ctx: Ctx, aggs: Seq[Column]): DataFrame = {
    // a time/session window downstream of an aggregate has an event-time
    // MS column (window_start_ms) but no named timestamp column — every
    // emission is a point with an event time in the reference
    // (esp_aggregate emits at window close), so synthesize the timestamp
    // from the ms column instead of failing resolution
    val needsTs = ctx.win.exists(w => w.kind == "time" || w.kind == "session")
    val ctx1 =
      if (!needsTs || ctx.ts.nonEmpty) ctx
      else if (ctx.tsMs.nonEmpty)
        ctx.copy(df = ctx.df.withColumn("_ts", timestamp_millis(col(ctx.tsMs))),
          ts = "_ts")
      else throw DfsError("time window needs an event-time column upstream")
    // streaming window aggregation needs the event-time watermark before
    // the groupBy; 0-delay = faxe's accept-any-ts with immediate eviction
    val df0 = ctx1.win match {
      case Some(w) if ctx1.df.isStreaming && (w.kind == "time" || w.kind == "session") =>
        ctx1.df.withWatermark(ctx1.ts, "0 milliseconds")
      case _ => ctx1.df
    }
    groupedAggOn(ctx1.copy(df = df0), aggs)
  }

  private def groupedAggOn(ctx: Ctx, aggs: Seq[Column]): DataFrame =
    ctx.win match {
      case Some(Win("count", p, e, _, _)) =>
        if (p == e)
          Windows.countTumblingAgg(ctx.df, p.toInt, orderCols(ctx),
            keyCols(ctx), aggs)
        else
          Windows.countSlidingAgg(ctx.df, p.toInt, e.toInt, orderCols(ctx),
            keyCols(ctx), aggs)
      case Some(Win("clock", p, e, _, align)) =>
        Windows.clockAgg(ctx.df, s"$p milliseconds", keyCols(ctx), aggs,
          align, Some(s"$e milliseconds"))
      case Some(Win("time", p, e, fill, _)) =>
        val windowed =
          if (p == e)
            Windows.tumblingAgg(ctx.df, col(ctx.ts), s"$p milliseconds",
              keyCols(ctx), aggs)
          else
            Windows.slidingAgg(ctx.df, col(ctx.ts), s"$p milliseconds",
              s"$e milliseconds", keyCols(ctx), aggs)
        if (fill) Windows.fillPeriod(windowed, ctx.df, col(ctx.ts)) else windowed
      case Some(Win("session", gap, _, _, _)) =>
        Windows.sessionAgg(ctx.df, col(ctx.ts), s"$gap milliseconds",
          keyCols(ctx), aggs)
      case _ if ctx.keys.nonEmpty =>
        ctx.df.groupBy(keyCols(ctx): _*).agg(aggs.head, aggs.tail: _*)
      case _ => ctx.df.agg(aggs.head, aggs.tail: _*)
    }

  private def aggregateWithWindow(ctx: Ctx, specs: Seq[Aggregate.Spec],
      approx: Boolean = false): DataFrame = {
    // count_change needs a lag pre-pass over the un-windowed stream
    // (esp_aggregate keep_tail continuity, SURVEY §7.4): mark changes
    // first, then any window/group sums the marker column.
    val ccSpecs = specs.filter(_.func == "count_change")
    val prepped = ccSpecs.zipWithIndex.foldLeft(ctx) { case (c, (s, i)) =>
      c.copy(df = graft.operators.agg.AggFunctions.countChangePrep(
        c.df, Paths.ref(s.field), orderCols(c), keyCols(c), s"_cc$i"))
    }
    val aggs = specs.map { s =>
      if (s.func == "count_change")
        sum(col(s"_cc${ccSpecs.indexOf(s)}")).as(s.as)
      else
        graft.operators.agg.AggFunctions
          .column(s.func, Paths.ref(s.field), col(ctx.tsMs), approx).as(s.as)
    }
    groupedAgg(prepped, aggs)
  }

  // ---- compile-time validation -------------------------------------------

  /** Validate node names, option names (with Levenshtein hints) and edge
    * wants/emits typing — errors mirror faxe_dfs.erl:165-183, 356-367.
    */
  /** A detached segment: no source ref and a first node that needs
    * input. Legal in the reference's graph model (no inbound edge → the
    * node never fires) and the natural shape of a macro body script;
    * compiles, but is skipped by DfsEngine.run.
    */
  def detached(c: Chain): Boolean =
    c.sourceRef.isEmpty && c.nodes.headOption.exists { n =>
      nodes.get(n.name).exists(nd => nd.wants.nonEmpty && !nd.optionalInput)
    }

  // ---- compile-time option value checks ---------------------------------
  //
  // The reference components declare value-level validation beyond the
  // option-name check via check_options/0: {one_of, Opt, Allowed},
  // {one_of_params, [Opts]} and {func, Opt, Pred, Msg}. The dataflow
  // library enforcing them is not vendored in the reference tree, so the
  // semantics are pinned by test/df_graph_test.erl (the select-statement
  // func check) and each component's checks list; errors surface at
  // compile, like the unknown-option reject (test/dfs_to_graph.erl).
  private sealed trait OptCheck
  /** {one_of, opt, [...]} — every given value must be in the allowed set.
    * `alsoArgs` covers positional binding (debug('warning') binds level).
    */
  private final case class OneOf(opt: String, allowed: Set[String],
      alsoArgs: Boolean = false) extends OptCheck
  /** {one_of_params, [...]} — exactly one must be given. A positional
    * arg binds the node's primary param (group_by('key') is .fields).
    */
  private final case class OneOfParams(params: Seq[String]) extends OptCheck
  /** {func, opt, pred, msg} — each given value must satisfy pred. */
  private final case class FuncCheck(opt: String, msg: String,
      pred: Value => Boolean) extends OptCheck
  /** {same_length, [...]} — the listed options, where given, must have
    * equal lengths (absent optional lists are skipped: modbus scripts
    * omit .signed). `argsBind` names the option positional args fill
    * (eval/case write their lambdas positionally).
    */
  private final case class SameLength(opts: Seq[String],
      argsBind: Option[String] = None) extends OptCheck
  /** {oneplus_of_params, [...]} — at least one must be given
    * (esp_mem.erl:42 field/default).
    */
  private final case class OnePlusOf(params: Seq[String]) extends OptCheck
  /** Cross-option: `opt` must be given when `ifOpt` is
    * (esp_http_listen.erl:46-53 — .pass required once .user is given).
    */
  private final case class RequiresIf(opt: String, ifOpt: String)
      extends OptCheck
  /** Cross-option: giving `opt` requires the boolean `flag` option true
    * (esp_postgre_statement.erl:62-67 — .statement_field only with
    * .start_on_trigger).
    */
  private final case class RequiresFlag(opt: String, flag: String)
      extends OptCheck

  private def isSelect(v: Value): Boolean = v match {
    case VStr(s) => graft.io.CrateQuery.checkSelectStatement(s)
    case VLambda(_) | VEager(_) => true // per-point SQL resolves at run
    case _ => false
  }
  private def isJson(v: Value): Boolean = v match {
    case VStr(s) =>
      try {
        new com.fasterxml.jackson.databind.ObjectMapper()
          .enable(com.fasterxml.jackson.databind.DeserializationFeature
            .FAIL_ON_TRAILING_TOKENS)
          .readTree(s) != null
      } catch { case _: Exception => false }
    case _ => false
  }
  private val durationRe = "\\d+(ms|s|m|h|d|w)".r
  private def isRate(v: Value): Boolean = v match {
    // esp_sample.erl:32-34 — integer or duration string
    case VNum(_, isInt) => isInt
    case VLong(_) | VDur(_, _) => true
    case VStr(s) => durationRe.matches(s)
    case _ => false
  }
  /** esp_crate_out.erl:105-113 — a string or a lambda. */
  private def strOrLambda(v: Value): Boolean = v match {
    case VStr(_) | VLambda(_) | VEager(_) => true
    case _ => false
  }
  /** faxe_util:check_publisher_mqtt_topic — a publish topic is concrete:
    * non-empty, no subscribe wildcards.
    */
  private def publishTopic(v: Value): Boolean = v match {
    case VStr(s) =>
      s.nonEmpty && !s.contains('+') && !s.contains('#')
    case _ => false
  }
  /** faxe_util:check_mqtt_topic — a subscribe filter: non-empty levels
    * aside from wildcards, '#' only as the final level, '+' only as a
    * whole level (MQTT 3.1.1 §4.7, the rules the reference enforces).
    */
  private def subscribeTopic(v: Value): Boolean = v match {
    case VStr(s) if s.nonEmpty =>
      val levels = s.split("/", -1)
      levels.zipWithIndex.forall { case (l, i) =>
        if (l == "#") i == levels.length - 1
        else !l.contains('#') && (l == "+" || !l.contains('+'))
      }
    case _ => false
  }
  /** email_address:is_valid (vendored lib/email_address.erl:34-38) —
    * the local-part structure plus a dotted alpha TLD or IP domain;
    * ported minus the frozen 2013 IANA TLD list (any ≥2-alpha TLD).
    */
  private val emailRe =
    ("(?i)^[^\"@\\s]+@(?:(?:[a-z0-9][a-z0-9-]*\\.)+[a-z]{2,}" +
      "|(?:\\d{1,3}\\.){3}\\d{1,3}|\\[(?:\\d{1,3}\\.){3}\\d{1,3}\\])$").r
  private def validEmail(v: Value): Boolean = v match {
    case VStr(s) => emailRe.matches(s)
    case _ => false
  }

  private val packetKinds = Set("1", "2", "4", "line")
  private val modbusChecks = Seq(
    // esp_modbus.erl:68-69,94-95
    OneOf("function", Set("coils", "hregs", "iregs", "inputs", "memory")),
    OneOf("output", Set("int16", "int32", "float32", "double", "coils",
      "ascii", "binary")))
  private val selectCheck = FuncCheck("query",
    "seems not to be a valid sql select statement", isSelect)
  private val crateChecks = Seq(
    // esp_crate_query.erl:66-67
    OneOf("result_type", Set("batch", "point")), selectCheck)

  private val optionChecks: Map[String, Seq[OptCheck]] = Map(
    "crate_query" -> crateChecks,
    "postgresql_query" -> crateChecks,
    "oracle_query" -> Seq(selectCheck), // esp_oracle_query.erl:59
    // esp_debug.erl:33-35 (positional: batch_test.dfs debug('warning'))
    "debug" -> Seq(OneOf("level", Set("debug", "info", "notice",
      "warning", "error", "critical", "alert"), alsoArgs = true)),
    // esp_json_emitter.erl:67-68
    "json_emitter" -> Seq(OneOf("select", Set("rand", "seq", "batch")),
      FuncCheck("json", "invalid json", isJson)),
    // esp_mem.erl:41-42
    "mem" -> Seq(OneOf("type", Set("single", "set", "list")),
      OnePlusOf(Seq("field", "default"))),
    // esp_http_post.erl:52
    "http_post" -> Seq(OneOf("method", Set("post", "put"))),
    // esp_value_diff.erl:18-20,39
    "value_diff" -> Seq(OneOf("mode", Set("abs", "c-p", "p-c"))),
    // esp_collect.erl:87-92
    "collect" -> Seq(
      OneOf("update_mode", Set("merge", "merge_reverse", "replace")),
      FuncCheck("update", "can only be a lambda expression, true or false",
        { case VLambda(_) | VBool(_) => true; case _ => false })),
    // esp_amqp_publish.erl:60-61
    "amqp_publish" -> Seq(
      OneOfParams(Seq("routing_key", "routing_key_lambda",
        "routing_key_field")),
      OneOf("qos", Set("0", "1", "2"))),
    "amqp_consume" -> Seq(OneOfParams(Seq("routing_key", "bindings"))),
    // esp_mqtt_publish.erl:67-72 (publish topics are concrete)
    "mqtt_publish" -> Seq(
      OneOfParams(Seq("topic", "topic_lambda", "topic_field")),
      FuncCheck("topic", "is not a valid publish topic", publishTopic)),
    // esp_mqtt_subscribe.erl:65-72 (filters may carry wildcards)
    "mqtt_subscribe" -> Seq(OneOfParams(Seq("topic", "topics")),
      FuncCheck("topic", "is not a valid topic filter", subscribeTopic),
      FuncCheck("topics", "at least one of the topics seems to be " +
        "invalid", subscribeTopic)),
    "mqtt_amqp_bridge" -> Seq(OneOfParams(Seq("topic", "topics")),
      FuncCheck("topics", "at least one of the topics seems to be " +
        "invalid", subscribeTopic)),
    "group_by" -> Seq(OneOfParams(Seq("fields", "lambda"))),
    // esp_email.erl:54-55
    "email" -> Seq(OneOfParams(Seq("body", "body_field")),
      FuncCheck("to", "invalid email address(es) given", validEmail)),
    // esp_postgre_statement.erl:59-67
    "postgre_statement" -> Seq(
      OneOf("result_type", Set("batch", "point")),
      OneOfParams(Seq("statement", "statement_field")),
      RequiresFlag("statement_field", "start_on_trigger")),
    // esp_mongo_query.erl:57-64
    "mongo_query" -> Seq(
      FuncCheck("query", "seems not to be valid json", isJson)),
    // esp_crate_out.erl:103-113
    "crate_out" -> Seq(
      FuncCheck("table", "must be either a string or a lambda function",
        strOrLambda),
      FuncCheck("db_fields",
        "list may only contain strings and lambda functions",
        strOrLambda)),
    // esp_state_change_bulk.erl:70-72; esp_state_change.erl:59-61 —
    // a state edge node must emit SOMETHING
    "state_change_bulk" -> Seq(
      OneOfParams(Seq("lambda_pattern", "state_value")),
      OnePlusOf(Seq("enter", "leave"))),
    "state_change" -> Seq(OnePlusOf(Seq("enter", "leave"))),
    // esp_http_listen.erl:44-53
    "http_listen" -> Seq(
      OneOf("content_type", Set("text/plain",
        "application/x-www-form-urlencoded", "application/json")),
      OneOf("payload_type", Set("plain", "json")),
      RequiresIf("pass", "user")),
    // esp_tcp_recv.erl:70 / tcp_send:57 / tcp_serve:41
    "tcp_recv" -> Seq(OneOf("packet", packetKinds)),
    "tcp_send" -> Seq(OneOf("packet", packetKinds)),
    "tcp_serve" -> Seq(OneOf("packet", packetKinds)),
    "modbus" -> modbusChecks,
    "modbus_read" -> modbusChecks,
    "modbus_multi" -> modbusChecks,
    // esp_aggregate.erl:14-32,57 (first/last are commented out there)
    "aggregate" -> Seq(OneOf("functions", Set("variance", "sum", "min",
      "max", "stddev", "avg", "count", "count_distinct", "count_change",
      "mean", "geometric_mean", "median", "range", "skew"))),
    // esp_sample.erl:30-34
    "sample" -> Seq(FuncCheck("rate",
      "must be of type 'integer' or 'duration'", isRate))) |+|
    // {same_length, ...} declarations (esp_aggregate.erl:56,
    // esp_array_explode.erl:38, esp_case.erl:38, esp_collect*.erl,
    // esp_deadman.erl:57, esp_eval.erl:28, esp_extract_path.erl:28,
    // esp_http_get.erl:57, esp_http_post.erl:51, esp_modbus*.erl,
    // esp_postgre_out.erl:47, esp_rename.erl:34-35, esp_set.erl:37,
    // esp_triggered_timeout.erl:58)
    Map(
      "aggregate" -> Seq(SameLength(Seq("fields", "as", "functions"))),
      "array_explode" -> Seq(SameLength(Seq("fields", "as"))),
      "case" -> Seq(SameLength(Seq("lambdas", "values"),
        argsBind = Some("lambdas"))),
      "collect" -> Seq(SameLength(Seq("keep", "keep_as"))),
      "collect_fields" -> Seq(SameLength(Seq("keep", "keep_as"))),
      "collect_unique" -> Seq(SameLength(Seq("keep", "keep_as"))),
      "deadman" -> Seq(SameLength(Seq("fields", "field_values"))),
      "eval" -> Seq(SameLength(Seq("lambdas", "as"),
        argsBind = Some("lambdas"))),
      "extract_path" -> Seq(SameLength(Seq("path", "as"))),
      "http_get" -> Seq(SameLength(Seq("param_keys", "param_values"))),
      "http_post" -> Seq(SameLength(Seq("header_names", "header_values"))),
      "modbus" -> Seq(SameLength(Seq("function", "from", "count", "as",
        "output", "signed"))),
      "modbus_read" -> Seq(SameLength(Seq("function", "from", "count",
        "as", "output", "signed"))),
      "modbus_multi" -> Seq(SameLength(Seq("function", "from", "count",
        "as", "output", "signed"))),
      "postgre_out" -> Seq(SameLength(Seq("db_fields", "faxe_fields"))),
      "rename" -> Seq(SameLength(Seq("fields", "as_fields")),
        SameLength(Seq("tags", "as_tags"))),
      "set" -> Seq(SameLength(Seq("fields", "field_values")),
        SameLength(Seq("tags", "tag_values"))),
      // esp_default.erl:35-46 (func-form length equality)
      "default" -> Seq(SameLength(Seq("fields", "field_values")),
        SameLength(Seq("tags", "tag_values"))),
      // esp_s7read.erl:86-92 (alias/address count; address validity is
      // plan-time via PlcPlan, prefix-translated)
      "s7read" -> Seq(SameLength(Seq("vars", "as"))),
      "triggered_timeout" -> Seq(SameLength(Seq("fields", "field_values"))))

  /** Merge check maps, concatenating per-node check lists. */
  implicit private class CheckMapOps(m: Map[String, Seq[OptCheck]]) {
    def |+|(o: Map[String, Seq[OptCheck]]): Map[String, Seq[OptCheck]] =
      (m.keySet ++ o.keySet).map(k =>
        k -> (m.getOrElse(k, Nil) ++ o.getOrElse(k, Nil))).toMap
  }

  private def runChecks(n: NodeSpec, defs: Map[String, Value]): Unit =
    optionChecks.getOrElse(n.name, Nil).foreach {
      case OneOf(opt, allowed, alsoArgs) =>
        val vs = n.options.getOrElse(opt, Nil) ++
          (if (alsoArgs && !n.options.contains(opt)) n.args else Nil)
        vs.map(resolve(_, defs)).foreach {
          case VLambda(_) | VEager(_) => () // resolves at plan time
          case v =>
            val s = valueString(v)
            if (!allowed.contains(s)) throw DfsError(
              s"node '${n.name}': value '$s' for option '$opt' must be " +
                s"one of ${allowed.toSeq.sorted.mkString(", ")}")
        }
      case OneOfParams(params) =>
        val given = params.count(n.options.contains)
        val effective =
          if (given == 0 && n.args.nonEmpty) 1 // positional primary
          else given
        if (effective != 1) throw DfsError(
          s"node '${n.name}': exactly one of " +
            s"${params.map("." + _).mkString(", ")} must be given")
      case FuncCheck(opt, msg, pred) =>
        n.options.getOrElse(opt, Nil).map(resolve(_, defs)).foreach {
          case VEager(_) => () // folds at plan time
          case v => if (!pred(v))
            throw DfsError(s"node '${n.name}': option '$opt' $msg")
        }
      case SameLength(opts, argsBind) =>
        val lengths = opts.flatMap { o =>
          val vs =
            if (n.options.contains(o)) n.options(o)
            else if (argsBind.contains(o)) n.args
            else Nil
          if (vs.isEmpty) None else Some(o -> vs.size)
        }
        if (lengths.map(_._2).distinct.size > 1) throw DfsError(
          s"node '${n.name}': options " +
            lengths.map { case (o, l) => s".$o($l)" }.mkString(", ") +
            " must have the same length")
      case OnePlusOf(params) =>
        if (!params.exists(n.options.contains) && n.args.isEmpty)
          throw DfsError(s"node '${n.name}': at least one of " +
            s"${params.map("." + _).mkString(", ")} must be given")
      case RequiresIf(opt, ifOpt) =>
        if (n.options.contains(ifOpt) && !n.options.contains(opt))
          throw DfsError(s"node '${n.name}': .$opt must be given, " +
            s"if '$ifOpt' is given")
      case RequiresFlag(opt, flag) =>
        if (n.options.contains(opt) && !optFlagRaw(n, flag))
          throw DfsError(s"node '${n.name}': .$opt requires " +
            s".$flag(true)")
    }

  /** Env-free is_set flag read for compile-time checks. */
  private def optFlagRaw(n: NodeSpec, name: String): Boolean =
    n.options.get(name).exists(vs =>
      !vs.headOption.contains(VBool(false)) &&
        !vs.headOption.contains(VStr("false")))

  def validate(script: Script): Unit = {
    // the type-check compares ADJACENT DECLARED wants/emits, with `both`
    // compatible either way — exactly faxe_dfs.erl:165-183
    // (check_item_types on the declared pair, not a propagated type)
    def chainEmits(c: Chain): IoType =
      c.nodes.lastOption.flatMap(n => nodes.get(n.name))
        .map(_.emits).getOrElse(Point)
    val allChains = script.namedChains.values ++ script.chains
    allChains.foreach { chain =>
      var current: IoType = chain.sourceRef
        .flatMap(script.namedChains.get).map(chainEmits).getOrElse(Point)
      var prevName = chain.sourceRef.map(r => s"'$r'").getOrElse("source")
      chain.nodes.zipWithIndex.foreach { case (n, idx) =>
        val nd = lookup(n.name)
        // user components own their option schema (the class checks it);
        // '_name' is the universal node display-name option (python2.dfs)
        if (!n.name.startsWith("@")) {
          n.options.keys.foreach { o =>
            if (o != "_name" && !nd.opts.contains(o)) throw DfsError(
              s"Unknown option '$o' for node '${n.name}'.${suggest(o, nd.opts)}")
          }
          runChecks(n, script.defs)
        }
        val atStart = idx == 0 && chain.sourceRef.isEmpty
        nd.wants match {
          case None =>
            // a source mid-chain ignores its upstream and restarts the
            // segment — faxe wires the edge but timer-driven emitters
            // drop received items (picking_tracking.dfs mem→json_emitter)
            ()
          case Some(w) =>
            // a chain STARTING with a non-source node is a detached
            // segment: in the reference's graph model a node with no
            // inbound edge is legal (it just never fires) — and macro
            // body scripts are written exactly this way
            // (dfs/other/macro1.dfs top chain). It compiles but is
            // skipped at run time (DfsEngine.run).
            if (!atStart && w != Both && current != Both && w != current)
              throw DfsError(s"Cannot connect $prevName (emits: " +
                s"${current.label}) to '${n.name}' (wants: ${w.label})")
        }
        current = nd.emits
        prevName = s"'${n.name}'"
      }
    }
  }
}
