package graft.dfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import Ir.DfsError

/** In-process task registry — the engine-side analog of the reference's
  * task lifecycle (faxe.erl:212-231 `register_task`/`check_task` over
  * faxe_db storage; rest_routes.config:58-60 is the `/v1/task`
  * register/start/stop/delete shell over the same calls). The HTTP
  * transport is deployment glue; the API surface IS this registry:
  *
  *  - [[register]] — compile-checks the script first (check_task →
  *    eval_dfs) and rejects duplicate names (`{error, task_exists}`).
  *  - [[start]] — plans the task's DFS into live frames (the batch
  *    analog of spawning the task graph under graph_sup).
  *  - [[stop]] / [[delete]] — stop release the planned frames; delete
  *    refuses while running (faxe's delete vs delete/force split:
  *    [[deleteForce]] stops first).
  *  - [[list]] — every task with its running flag
  *    (faxe.erl `add_running_flag`).
  *
  * Registered tasks are also the MACRO SOURCE: `||name()` in another
  * script expands to the stored task's DFS text, exactly the reference's
  * macro resolution (faxe_dfs.erl:49-57 `macro_fun` → faxe:get_task) —
  * the registry installs itself as [[Macros]]' resolver.
  *
  * SCOPE: the registry is deliberately PROCESS-global, like the
  * reference's — faxe_db is node-wide Mnesia, not per-connection — so
  * two SparkSessions in one JVM share one task namespace. The stored
  * task is just DFS text (session-free); only [[start]] binds a session,
  * and its frames belong to the session that planned them — a second
  * session sees the task as running and must stop/restart to re-plan it
  * under itself. Multi-tenant isolation, if ever needed, belongs in the
  * HTTP layer above, same as the reference.
  */
object TaskRegistry {

  final case class Task(name: String, dfs: String, registeredAtMs: Long)
  final case class TaskInfo(name: String, dfs: String, registeredAtMs: Long,
    isRunning: Boolean)

  private val tasks =
    new java.util.concurrent.ConcurrentHashMap[String, Task]()
  private val running =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, DataFrame]]()

  /** Stored tasks resolve as macros (faxe_dfs.erl:49-57). Installed on
    * every register so a test-side `Macros.clear()` cannot orphan it.
    */
  private def installResolver(): Unit =
    Macros.setResolver(name => Option(tasks.get(name)).map(_.dfs))

  /** Register a named task. The script must compile (check_task's
    * eval_dfs gate) and the name must be free (`{error, task_exists}`).
    */
  def register(name: String, dfs: String,
      nowMs: Long = System.currentTimeMillis()): Task = {
    DfsEngine.compile(dfs) // reject broken scripts before storing
    val t = Task(name, dfs, nowMs)
    if (tasks.putIfAbsent(name, t) != null)
      throw DfsError(s"task '$name' exists")
    installResolver()
    t
  }

  /** Register-or-replace (the `/v1/task` upsert op). A running task keeps
    * its current frames until restarted.
    */
  def upsert(name: String, dfs: String,
      nowMs: Long = System.currentTimeMillis()): Task = {
    DfsEngine.compile(dfs)
    val t = Task(name, dfs, nowMs)
    tasks.put(name, t)
    installResolver()
    t
  }

  def get(name: String): Option[Task] = Option(tasks.get(name))

  /** Plan the task's DFS and hold its frames as the running instance.
    * Reservation is putIfAbsent, so of two concurrent starts exactly one
    * wins and the other gets 'already started' — never a silent
    * overwrite of the winner's frames. (The early containsKey check is
    * just the cheap fast path for the common sequential double-start.)
    */
  def start(name: String, spark: SparkSession, dir: String,
      permanent: Boolean = false): Map[String, DataFrame] = {
    val t = get(name).getOrElse(throw DfsError(s"task '$name' not found"))
    if (running.containsKey(name))
      throw DfsError(s"task '$name' is already started")
    val frames = DfsEngine.run(t.dfs, spark, dir)
    if (running.putIfAbsent(name, frames) != null)
      throw DfsError(s"task '$name' is already started")
    if (permanent) permanentTasks.add(name)
    frames
  }

  // ---- permanent tasks (faxe.erl:70-72 start_permanent_tasks; the
  // `permanent` flag on start/stop, rest_task_handler is_permanent) ----

  private val permanentTasks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def listPermanent(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    permanentTasks.asScala.toSeq.sorted
  }

  /** Boot-time restart of every permanent task not already running
    * (faxe starts each stored permanent task under graph_sup on init).
    */
  def startPermanentTasks(spark: SparkSession,
      dir: String): Seq[String] = {
    val started = listPermanent()
      .filterNot(running.containsKey(_))
      .filter(tasks.containsKey(_))
    started.foreach(n => start(n, spark, dir, permanent = true))
    started
  }

  /** Frames of a running task, empty when stopped. */
  def frames(name: String): Option[Map[String, DataFrame]] =
    Option(running.get(name))

  def isRunning(name: String): Boolean = running.containsKey(name)

  /** The stored task's compiled deploy graph — the `/v1/task/graph/:id`
    * payload (rest_task_handler.erl get_graph_to_json): node instances,
    * wiring, and def-resolved options, via [[DfsEngine.graph]].
    */
  def graph(name: String, spark: SparkSession): DfsEngine.DeployGraph = {
    val t = Option(tasks.get(name))
      .getOrElse(throw DfsError(s"task '$name' not found"))
    DfsEngine.graph(t.dfs, spark)
  }

  /** Stop a running task; `permanent = true` also clears the permanent
    * flag (faxe stop_task/2 — otherwise the next
    * [[startPermanentTasks]] would bring it straight back).
    */
  def stop(name: String, permanent: Boolean = false): Unit = {
    if (running.remove(name) == null)
      throw DfsError(s"task '$name' is not running")
    if (permanent) permanentTasks.remove(name)
  }

  def stopAll(): Unit = running.clear()

  /** Remove a stopped task; refuses while running (use [[deleteForce]]). */
  def delete(name: String): Unit = {
    if (running.containsKey(name))
      throw DfsError(s"task '$name' is running — stop it first (or delete/force)")
    if (tasks.remove(name) == null)
      throw DfsError(s"task '$name' not found")
    taskTags.remove(name)
    permanentTasks.remove(name)
  }

  def deleteForce(name: String): Unit = {
    running.remove(name)
    if (tasks.remove(name) == null)
      throw DfsError(s"task '$name' not found")
    taskTags.remove(name)
    permanentTasks.remove(name)
  }

  /** Every registered task with its running flag (add_running_flag). */
  def list(): Seq[TaskInfo] = {
    import scala.jdk.CollectionConverters._
    tasks.values.asScala.toSeq.sortBy(_.name)
      .map(t => TaskInfo(t.name, t.dfs, t.registeredAtMs,
        running.containsKey(t.name)))
  }

  // ---- task tags (faxe.erl:184-192 add/remove/set_tags,
  // list_tasks_by_tags, get_all_tags; the /v1/task/tags REST ops) ------

  private val taskTags =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  private def requireTask(name: String): Unit =
    if (!tasks.containsKey(name)) throw DfsError(s"task '$name' not found")

  def addTags(name: String, tags: Seq[String]): Unit = {
    requireTask(name)
    taskTags.merge(name, tags.toSet, _ ++ _)
  }

  def removeTags(name: String, tags: Seq[String]): Unit = {
    requireTask(name)
    taskTags.computeIfPresent(name, (_, cur) => cur -- tags)
  }

  def setTags(name: String, tags: Seq[String]): Unit = {
    requireTask(name)
    taskTags.put(name, tags.toSet)
  }

  def tags(name: String): Set[String] =
    taskTags.getOrDefault(name, Set.empty)

  def allTags(): Set[String] = {
    import scala.jdk.CollectionConverters._
    taskTags.values.asScala.flatten.toSet
  }

  /** Tasks carrying ANY of the given tags, with running flags
    * (faxe_db:get_tasks_by_tags over the task's tag list).
    */
  def listByTags(tags: Seq[String]): Seq[TaskInfo] = {
    val want = tags.toSet
    list().filter(t =>
      taskTags.getOrDefault(t.name, Set.empty).exists(want))
  }

  // ---- templates (faxe.erl:246-292 register_template /
  // task_from_template; rest_template_handler) -------------------------
  // A template is a compile-checked DFS whose `def`s are its variables;
  // instantiation bakes the caller's vars into the task's text
  // (faxe_dfs:data(DFS, Vars)), so restarts and macro uses see the
  // substituted script.

  final case class Template(name: String, dfs: String,
      registeredAtMs: Long)

  private val templates =
    new java.util.concurrent.ConcurrentHashMap[String, Template]()

  def registerTemplate(name: String, dfs: String,
      nowMs: Long = System.currentTimeMillis()): Template = {
    DfsEngine.compile(dfs) // eval_dfs gate, as for tasks
    val t = Template(name, dfs, nowMs)
    if (templates.putIfAbsent(name, t) != null)
      throw DfsError(s"template '$name' exists")
    t
  }

  def listTemplates(): Seq[Template] = {
    import scala.jdk.CollectionConverters._
    templates.values.asScala.toSeq.sortBy(_.name)
  }

  def deleteTemplate(name: String): Unit =
    if (templates.remove(name) == null)
      throw DfsError(s"template '$name' not found")

  /** Instantiate a task from a template. `vars` override the template's
    * `def`s — values are DFS literal text (`"'topic/a'"`, `"42"`,
    * `"3s"`) substituted into the def lines, then the result passes the
    * normal register gate (compile + free-name). Order of faxe's
    * checks kept: task-exists first, then template lookup
    * (faxe.erl:283-292).
    */
  def taskFromTemplate(templateName: String, taskName: String,
      vars: Map[String, String] = Map.empty,
      nowMs: Long = System.currentTimeMillis()): Task = {
    if (tasks.containsKey(taskName))
      throw DfsError(s"task '$taskName' exists")
    val tpl = Option(templates.get(templateName)).getOrElse(
      throw DfsError(s"template '$templateName' not found"))
    val defs = Parser.parse(tpl.dfs).defs
    vars.keys.foreach { k =>
      if (!defs.contains(k)) throw DfsError(
        s"template '$templateName' has no def '$k'.${
          Ir.suggest(k, defs.keys)}")
    }
    val baked = vars.foldLeft(tpl.dfs) { case (txt, (k, v)) =>
      txt.replaceAll(
        "(?m)^(\\s*def\\s+" + java.util.regex.Pattern.quote(k) +
          "\\s*=).*$",
        java.util.regex.Matcher.quoteReplacement(s"def $k = $v"))
    }
    register(taskName, baked, nowMs)
  }

  /** Update a task's DFS, restarting it when running (faxe.erl:324-377
    * update_task/update_running): identical text (faxe's crc32 compare)
    * is a no-op unless `force`; a running task re-plans under the given
    * session after the store updates. A group LEADER's update propagates
    * to every member (faxe.erl:341-349). Returns true when an update
    * happened.
    */
  def updateTask(name: String, dfs: String, spark: SparkSession,
      dir: String, force: Boolean = false): Boolean = {
    val t = get(name).getOrElse(throw DfsError(s"task '$name' not found"))
    if (!force && t.dfs == dfs) return false // {ok, no_update}
    DfsEngine.compile(dfs) // eval_dfs gate before touching the store
    tasks.put(name, t.copy(dfs = dfs))
    if (running.containsKey(name)) {
      running.put(name, DfsEngine.run(dfs, spark, dir))
    }
    if (groupOf.getOrDefault(name, "") == name) // leader → members
      membersOf(name).filterNot(_ == name)
        .foreach(m => updateTask(m, dfs, spark, dir, force))
    true
  }

  // ---- task groups (faxe.erl:515-589 start_concurrent/start_copy/
  // set_group_size; copies are tasks named `leader--N`, the leader IS
  // the group name). Process-level concurrency is faxe's scaling tool;
  // here each member is its own planned flow — the engine's horizontal
  // scale lives inside one plan (partitions/executors), so a group is a
  // lifecycle shell: real consumer-group semantics apply when members
  // subscribe with distinct `.group` offsets on the bus. --------------

  private val groupOf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def membersOf(group: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    groupOf.asScala.collect { case (m, g) if g == group => m }.toSeq
      .sortBy(rankOf)
  }

  private def rankOf(member: String): Int =
    member.lastIndexOf("--") match {
      case -1 => 1 // the leader
      case i => member.substring(i + 2).toIntOption.getOrElse(1)
    }

  /** Start `name` as a group leader with `concurrency` total members:
    * copies `name--2`..`name--N` register with the leader's DFS and
    * start under the same session (start_copy's naming).
    */
  def startGroup(name: String, concurrency: Int, spark: SparkSession,
      dir: String, permanent: Boolean = false): Seq[String] = {
    val t = get(name).getOrElse(throw DfsError(s"task '$name' not found"))
    start(name, spark, dir, permanent)
    groupOf.put(name, name)
    val copies = (2 to concurrency).map { i =>
      val copy = s"$name--$i"
      if (!tasks.containsKey(copy)) register(copy, t.dfs)
      groupOf.put(copy, name)
      start(copy, spark, dir, permanent)
      copy
    }
    name +: copies
  }

  def listByGroup(group: String): Seq[TaskInfo] = {
    val ms = membersOf(group).toSet
    list().filter(t => ms(t.name))
  }

  /** Resize a running group (faxe.erl:548-575): grows by starting new
    * copies, shrinks by stopping+deleting the highest-ranked non-leader
    * members. The leader must be running.
    */
  def setGroupSize(group: String, newSize: Int, spark: SparkSession,
      dir: String): Seq[String] = {
    val ms = membersOf(group)
    if (ms.isEmpty) throw DfsError(s"group '$group' not found")
    if (!running.containsKey(group))
      throw DfsError(s"group '$group' leader is not running")
    val runningMs = ms.filter(running.containsKey(_))
    val delta = newSize - runningMs.size
    if (delta >= 0) {
      val t = tasks.get(group)
      val maxRank = ms.map(rankOf).max
      (1 to delta).map { k =>
        val copy = s"$group--${maxRank + k}"
        register(copy, t.dfs)
        groupOf.put(copy, group)
        start(copy, spark, dir)
        copy
      }
    } else {
      val victims = runningMs.filterNot(_ == group)
        .sortBy(-rankOf(_)).take(-delta)
      victims.foreach { v =>
        running.remove(v); tasks.remove(v); groupOf.remove(v)
        taskTags.remove(v); permanentTasks.remove(v)
      }
      victims
    }
  }

  /** Stop every running member; registrations stay (faxe stop_group). */
  def stopGroup(group: String): Seq[String] = {
    val stopped = membersOf(group).filter(running.containsKey(_))
    stopped.foreach(running.remove(_))
    stopped
  }

  // ---- bulk maintenance (faxe.erl:295-316 update_all/update_by_tags/
  // update_by_template, reset_tasks/reset_templates) -------------------
  // The bulk update re-submits each task's CURRENT text: a no-op per
  // task unless `force` (faxe's update-with-crc32 shape — useful after
  // an engine upgrade changes planning for unchanged scripts).

  def updateAll(spark: SparkSession, dir: String,
      force: Boolean = false): Seq[String] =
    list().map(_.name)
      .filter(n => updateTask(n, tasks.get(n).dfs, spark, dir, force))

  def updateByTags(tags: Seq[String], spark: SparkSession, dir: String,
      force: Boolean = false): Seq[String] =
    listByTags(tags).map(_.name)
      .filter(n => updateTask(n, tasks.get(n).dfs, spark, dir, force))

  /** Delete every task (running ones stop); faxe reset_tasks. */
  def resetTasks(): Unit = {
    running.clear(); tasks.clear(); taskTags.clear()
    permanentTasks.clear(); groupOf.clear(); tempExpiry.clear()
  }

  def resetTemplates(): Unit = templates.clear()

  /** faxe.erl:74-82 start_many — N tasks `base1..baseN` from one
    * template, started immediately.
    */
  def startMany(templateName: String, base: String, n: Int,
      spark: SparkSession, dir: String): Seq[String] =
    (1 to n).map { i =>
      val name = s"$base$i"
      taskFromTemplate(templateName, name)
      start(name, spark, dir)
      name
    }

  // ---- temporary flows (SURVEY §3.2; faxe.erl:441-470 start_temp) ------
  // A temp flow is compile+start in one call with a TTL: the reference
  // arms a teardown timer and `ping` re-arms it (df_graph.erl:248-251,
  // 279-284). Batch analog: an expiry mark swept lazily on access — no
  // timer thread; an expired temp's frames are released on the next
  // registry touch.

  private val tempExpiry =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)] // (ttl, deadline)
  private val tempSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def sweepTemps(nowMs: Long): Unit = {
    val it = tempExpiry.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue._2 <= nowMs) { running.remove(e.getKey); it.remove() }
    }
  }

  /** Compile + start an UNREGISTERED flow with a TTL; returns its
    * generated name and frames. Expires `ttlMs` after the last ping.
    */
  def startTemp(dfs: String, spark: SparkSession, dir: String, ttlMs: Long,
      nowMs: Long = System.currentTimeMillis()): (String, Map[String, DataFrame]) = {
    sweepTemps(nowMs)
    val frames = DfsEngine.run(dfs, spark, dir)
    val name = s"temp_${tempSeq.incrementAndGet()}"
    running.put(name, frames)
    tempExpiry.put(name, (ttlMs, nowMs + ttlMs))
    (name, frames)
  }

  /** Keep-alive: re-arm a temp flow's TTL (faxe.erl task ping). */
  def ping(name: String, nowMs: Long = System.currentTimeMillis()): Unit = {
    sweepTemps(nowMs)
    val cur = tempExpiry.get(name)
    if (cur == null) throw DfsError(s"temp task '$name' is not running")
    tempExpiry.put(name, (cur._1, nowMs + cur._1))
  }

  /** Running temp flows after a lazy expiry sweep. */
  def listTemps(nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    sweepTemps(nowMs)
    import scala.jdk.CollectionConverters._
    tempExpiry.keySet().asScala.toSeq.sorted
  }

  def clear(): Unit = {
    tasks.clear(); running.clear(); tempExpiry.clear()
    taskTags.clear(); templates.clear(); permanentTasks.clear()
    groupOf.clear()
  }
}
