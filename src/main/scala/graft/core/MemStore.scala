package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Flow-wide value memory + engine configuration, readable from DFS
  * lambdas (refs: esp_mem.erl:1-13 — ETS-backed single/list/set values
  * available to any lambda in the flow; dfs/test/env.dfs:1-5 env()).
  *
  * Spark-first mapping: mem values are SMALL by contract (a scalar or a
  * bounded list — the reference holds them in a per-graph ETS table), so
  * they become plan-time literals folded into whole-stage codegen, the
  * same way a broadcast dim avoids shuffling the big side. Nothing here
  * touches a distributed data path.
  */
object MemStore {

  /** Hard cap on list/set memory size — a mem value is a lambda literal,
    * not a dataset (esp_mem holds it in ETS; we fold it into the plan).
    */
  val MaxListSize = 100000

  private val values =
    new java.util.concurrent.ConcurrentHashMap[String, Any]()
  private val lists =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Any]]()

  def put(key: String, v: Any): Unit = values.put(key, v)
  def putList(key: String, vs: Seq[Any]): Unit = {
    require(vs.size <= MaxListSize,
      s"mem list '$key' exceeds $MaxListSize entries — use a lookup table " +
        "(jsn_select / Mem.lookup) for dataset-sized state")
    lists.put(key, vs)
  }
  def get(key: String): Option[Any] = Option(values.get(key))
  def getList(key: String): Option[Seq[Any]] = Option(lists.get(key))
  def clear(): Unit = { values.clear(); lists.clear() }

  /** Parse a JSON map/list default into the store (esp_mem.erl:40-53
    * prepare_default with default_json) — leaves stored as strings.
    */
  def putJson(key: String, json: String): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(json)
    if (node.isObject) {
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
      put(key, b.result())
    } else if (node.isArray) {
      val b = Seq.newBuilder[Any]
      node.forEach(e => b += e.asText)
      putList(key, b.result())
    } else put(key, node.asText)
  }

  private def toLit(v: Any): Column = v match {
    case null => lit(null)
    case c: Column => c
    case m: Map[_, _] =>
      // string-leaf map memory → a map literal (map_get in lambdas)
      val entries = m.toSeq.sortBy(_._1.toString)
      map(entries.flatMap { case (k, v2) =>
        Seq(lit(k.toString), lit(v2.toString)) }: _*)
    case other => lit(other)
  }

  /** `mem('key')` lambda access — the stored scalar as a literal column
    * (miss → default, itself defaulting to NULL — the columnar analog of
    * faxe's <<"undefined">>).
    */
  def memColumn(key: String, default: Column = lit(null)): Column =
    get(key).map(toLit).getOrElse(default)

  /** `ls_mem('key')` — the stored list as an array literal; a map memory
    * yields its map literal (reference scripts pass map memories to
    * map_get, picking_tracking.dfs:43).
    */
  def lsMemColumn(key: String): Column =
    getList(key) match {
      case Some(vs) if vs.nonEmpty => array(vs.map(toLit): _*)
      // an unpopulated list memory is EMPTY, not null — membership tests
      // (array_contains) need a typed array, and the reference's ets
      // lookup returns [] (mem_test.dfs before the mem node fires)
      case _ => get(key).map(toLit)
        .getOrElse(array().cast("array<string>"))
    }

  /** `ls_mem_member(x, 'key')` — membership against the stored list;
    * an absent/empty list never matches.
    */
  def lsMemMember(x: Column, key: String): Column =
    getList(key) match {
      case Some(vs) if vs.nonEmpty => x.isin(vs: _*)
      case _ => lit(false)
    }
}

/** Engine configuration for `env()` lambdas (ref: dfs/test/env.dfs:1-5 —
  * faxe resolves env() against OS environment / application config at
  * script-compile time). Lookup order: programmatic overrides, then the
  * JVM environment. Resolved at PLAN time into literals, so env values
  * are constant for the lifetime of a compiled plan — same semantics as
  * the reference's deploy-time resolution.
  */
object EngineConf {
  private val conf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def set(key: String, value: String): Unit = conf.put(key, value)
  def unset(key: String): Unit = conf.remove(key)
  def get(key: String): Option[String] =
    Option(conf.get(key)).orElse(sys.env.get(key))
  def clear(): Unit = conf.clear()

  /** Literal-name form: `env('NAME', default)`. */
  /** Env vars are STRINGS (the reference's env() returns the OS value or
    * the default verbatim; Erlang's dynamic compare makes `false == 'on'`
    * just false) — the whole column is string-typed so a non-string
    * default never turns a comparison into a Spark cast error
    * (dfs/test/env.dfs `env('FAXE_…', false) == 'on'`).
    */
  def envColumn(name: String, default: Column): Column =
    get(name).map(lit(_): Column).getOrElse(default).cast("string")

  /** Dynamic form: `env("field", default)` — the variable NAME comes from
    * a column (dfs/test/env.dfs:11 `env("fetch", 'na')`). Only
    * explicitly-set overrides participate (folding the whole OS env into
    * a plan literal would be nondeterministic and large); built as a map
    * literal + element_at, fully codegen'd.
    */
  def envColumnDynamic(name: Column, default: Column): Column = {
    import scala.jdk.CollectionConverters._
    val entries = conf.asScala.toSeq.sortBy(_._1)
    if (entries.isEmpty) default
    else {
      val m = map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      coalesce(element_at(m, name), default)
    }
  }
}
