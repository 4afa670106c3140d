package graft

import graft.dfs.{DfsEngine, Ir, Macros, TaskRegistry}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Task lifecycle shell (faxe.erl:212-231 register/check_task,
  * rest_routes.config /v1/task ops): register → start → list → stop →
  * delete, plus the stored-task macro source (faxe_dfs.erl:49-57).
  */
class TaskRegistrySpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "task-registry-test")
  val sf = "/root/testdata/sf0.001"

  test("register/start/list/stop/delete lifecycle") {
    TaskRegistry.clear()
    try {
      val t = TaskRegistry.register("clicks_per_user",
        """|parquet_read(.table('events'))
          #|where(lambda: "event_type" == 'click')
          #|group_by('user_id')
          #|win_time(.period(1d))
          #|aggregate(.fields('value').functions('count').as('n'))
          #""".stripMargin('#'), nowMs = 1700000000000L)
      assert(t.name == "clicks_per_user")

      // task_exists on duplicate register (faxe.erl check_task)
      val dup = intercept[Ir.DfsError] {
        TaskRegistry.register("clicks_per_user", "|value_emitter(.count(1))")
      }
      assert(dup.msg.contains("exists"))

      // a broken script never lands in the registry (eval_dfs gate)
      intercept[Ir.DfsError] {
        TaskRegistry.register("broken", "|no_such_node()")
      }
      assert(TaskRegistry.get("broken").isEmpty)

      assert(TaskRegistry.list().map(i => (i.name, i.isRunning)) ==
        Seq(("clicks_per_user", false)))

      val frames = TaskRegistry.start("clicks_per_user", spark, sf)
      assert(frames.values.map(_.count()).sum > 0)
      assert(TaskRegistry.isRunning("clicks_per_user"))
      assert(TaskRegistry.list().head.isRunning)
      intercept[Ir.DfsError] {
        TaskRegistry.start("clicks_per_user", spark, sf) // already started
      }

      // delete refuses while running; stop releases; delete removes
      intercept[Ir.DfsError](TaskRegistry.delete("clicks_per_user"))
      TaskRegistry.stop("clicks_per_user")
      assert(!TaskRegistry.isRunning("clicks_per_user"))
      intercept[Ir.DfsError](TaskRegistry.stop("clicks_per_user"))
      TaskRegistry.delete("clicks_per_user")
      assert(TaskRegistry.list().isEmpty)
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("a stored task is a macro source for other scripts") {
    // the reference's macro resolution fetches another task's DFS by name
    // (faxe_dfs.erl:49-57 macro_fun -> faxe:get_task); registering the
    // fragment as a task makes ||high_value() expand inline
    TaskRegistry.clear()
    try {
      TaskRegistry.register("high_value",
        """def cutoff = 40
          #|where(lambda: "value" > cutoff)
          #|eval(lambda: "value" * 2)
          #  .as('boosted')
          #""".stripMargin('#'))
      val out = DfsEngine.runSingle(
        """|parquet_read(.table('events'))
          #||high_value()
          #  .cutoff(90)
          #""".stripMargin('#'), spark, sf)
      val expected = graft.core.Tables.events(spark, sf)
        .filter(col("value") > 90).count()
      assert(out.count() == expected && expected > 0)
      assert(out.filter(col("boosted") =!= col("value") * 2).count() == 0)
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("temp flows: TTL expiry swept lazily, ping re-arms") {
    // SURVEY §3.2 / faxe.erl:441-470: start_temp + TTL teardown + ping
    TaskRegistry.clear()
    try {
      val t0 = 1700000000000L
      val (name, frames) = TaskRegistry.startTemp(
        "|value_emitter(.count(4))", spark, sf, ttlMs = 10000L, nowMs = t0)
      assert(frames.values.head.count() == 4)
      assert(TaskRegistry.isRunning(name))
      assert(TaskRegistry.listTemps(t0 + 1000) == Seq(name))
      // ping at t0+8s pushes the deadline to t0+18s
      TaskRegistry.ping(name, t0 + 8000)
      assert(TaskRegistry.listTemps(t0 + 15000) == Seq(name))
      // past the re-armed deadline the flow is swept and released
      assert(TaskRegistry.listTemps(t0 + 18001).isEmpty)
      assert(!TaskRegistry.isRunning(name))
      intercept[Ir.DfsError](TaskRegistry.ping(name, t0 + 19000))
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("upsert replaces a task's dfs in place") {
    TaskRegistry.clear()
    try {
      TaskRegistry.register("t1", "|value_emitter(.count(3))")
      TaskRegistry.upsert("t1", "|value_emitter(.count(5))")
      val frames = TaskRegistry.start("t1", spark, sf)
      assert(frames.values.head.count() == 5)
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("graph: a stored task exposes its compiled deploy graph") {
    // the /v1/task/graph/:id payload (rest_task_handler.erl
    // get_graph_to_json) — instances, wiring, def-resolved options
    TaskRegistry.clear()
    try {
      TaskRegistry.register("g1",
        "def n = 4\n|value_emitter(.count(n))\n|batch(2)")
      val g = TaskRegistry.graph("g1", spark)
      assert(g.edges == Seq("value_emitter1" -> "batch2"))
      assert(g.node("value_emitter1").options("count") ==
        Seq(Ir.VNum(4, isInt = true)))
      intercept[Ir.DfsError](TaskRegistry.graph("nope", spark))
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("tags: add/remove/set, list-by-any-tag, all-tags, delete cleanup") {
    // faxe.erl:184-192 + list_tasks_by_tags — the /v1/task/tags ops
    TaskRegistry.clear()
    try {
      TaskRegistry.register("a", "|value_emitter(.count(1))")
      TaskRegistry.register("b", "|value_emitter(.count(1))")
      TaskRegistry.addTags("a", Seq("plant1", "energy"))
      TaskRegistry.addTags("b", Seq("plant2"))
      intercept[Ir.DfsError](TaskRegistry.addTags("nope", Seq("x")))
      assert(TaskRegistry.listByTags(Seq("plant1", "plant2"))
        .map(_.name) == Seq("a", "b"))
      assert(TaskRegistry.listByTags(Seq("energy")).map(_.name) == Seq("a"))
      assert(TaskRegistry.allTags() == Set("plant1", "plant2", "energy"))
      TaskRegistry.removeTags("a", Seq("energy"))
      assert(TaskRegistry.tags("a") == Set("plant1"))
      TaskRegistry.setTags("b", Seq("fresh"))
      assert(TaskRegistry.tags("b") == Set("fresh"))
      TaskRegistry.delete("a")
      assert(TaskRegistry.allTags() == Set("fresh")) // a's tags went too
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("templates: register, instantiate with baked vars, start_many") {
    // faxe.erl:246-292 register_template / task_from_template +
    // :74-82 start_many — vars override the template's defs, baked into
    // the task's stored text
    TaskRegistry.clear()
    try {
      TaskRegistry.registerTemplate("tpl",
        "def n = 2\n|value_emitter(.count(n))")
      intercept[Ir.DfsError](
        TaskRegistry.registerTemplate("tpl", "|value_emitter(.count(1))"))
      TaskRegistry.taskFromTemplate("tpl", "t1", Map("n" -> "5"))
      assert(TaskRegistry.list().map(_.name) == Seq("t1"))
      // the var is baked into the stored text, not just the plan
      assert(TaskRegistry.list().head.dfs.contains("def n = 5"))
      val frames = TaskRegistry.start("t1", spark, sf)
      assert(frames.values.head.count() == 5)
      // faxe's check order: task-exists beats template-not-found
      intercept[Ir.DfsError](
        TaskRegistry.taskFromTemplate("missing", "t1"))
      intercept[Ir.DfsError](
        TaskRegistry.taskFromTemplate("missing", "t2"))
      // unknown var rejects with a suggestion
      val e = intercept[Ir.DfsError](
        TaskRegistry.taskFromTemplate("tpl", "t3", Map("m" -> "1")))
      assert(e.msg.contains("has no def 'm'"))
      // start_many: tpl base names 1..N, all running
      val names = TaskRegistry.startMany("tpl", "many", 3, spark, sf)
      assert(names == Seq("many1", "many2", "many3"))
      assert(names.forall(TaskRegistry.isRunning))
      TaskRegistry.deleteTemplate("tpl")
      intercept[Ir.DfsError](TaskRegistry.deleteTemplate("tpl"))
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("permanent flag + update-and-restart semantics") {
    // faxe.erl:70-72 start_permanent_tasks, stop_task/2's flag clear,
    // update_task's crc no-op and running re-plan
    TaskRegistry.clear()
    try {
      TaskRegistry.register("p1", "|value_emitter(.count(2))")
      TaskRegistry.register("p2", "|value_emitter(.count(2))")
      TaskRegistry.start("p1", spark, sf, permanent = true)
      TaskRegistry.start("p2", spark, sf) // not permanent
      assert(TaskRegistry.listPermanent() == Seq("p1"))
      // boot restart: only the stopped permanent task comes back
      TaskRegistry.stop("p1")
      TaskRegistry.stop("p2")
      assert(TaskRegistry.startPermanentTasks(spark, sf) == Seq("p1"))
      assert(TaskRegistry.isRunning("p1") && !TaskRegistry.isRunning("p2"))
      // stop with the permanent flag clears it for the next boot
      TaskRegistry.stop("p1", permanent = true)
      assert(TaskRegistry.startPermanentTasks(spark, sf).isEmpty)
      // update: same text -> no-op; new text on a running task re-plans
      TaskRegistry.start("p2", spark, sf)
      assert(!TaskRegistry.updateTask("p2",
        "|value_emitter(.count(2))", spark, sf))
      assert(TaskRegistry.updateTask("p2",
        "|value_emitter(.count(7))", spark, sf))
      assert(TaskRegistry.frames("p2").get.values.head.count() == 7)
      intercept[Ir.DfsError](TaskRegistry.updateTask("nope", "x", spark, sf))
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("groups: leader + ranked copies, resize both ways, leader update " +
      "propagates") {
    // faxe.erl:515-589 start_concurrent/start_copy/set_group_size —
    // copies are tasks named leader--N; shrink removes highest ranks
    TaskRegistry.clear()
    try {
      TaskRegistry.register("g", "|value_emitter(.count(2))")
      assert(TaskRegistry.startGroup("g", 3, spark, sf) ==
        Seq("g", "g--2", "g--3"))
      assert(TaskRegistry.listByGroup("g").map(_.name) ==
        Seq("g", "g--2", "g--3"))
      assert(TaskRegistry.listByGroup("g").forall(_.isRunning))
      // grow: new ranks continue past the current max
      assert(TaskRegistry.setGroupSize("g", 4, spark, sf) == Seq("g--4"))
      // shrink: highest ranks go first, never the leader
      assert(TaskRegistry.setGroupSize("g", 2, spark, sf) ==
        Seq("g--4", "g--3"))
      assert(TaskRegistry.listByGroup("g").map(_.name) == Seq("g", "g--2"))
      // leader update re-plans every member
      TaskRegistry.updateTask("g", "|value_emitter(.count(6))", spark, sf)
      assert(TaskRegistry.frames("g--2").get.values.head.count() == 6)
      // stop_group stops members but keeps registrations
      assert(TaskRegistry.stopGroup("g") == Seq("g", "g--2"))
      assert(TaskRegistry.listByGroup("g").map(_.name) == Seq("g", "g--2"))
      assert(!TaskRegistry.isRunning("g--2"))
      intercept[Ir.DfsError](TaskRegistry.setGroupSize("g", 3, spark, sf))
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("bulk maintenance: updateAll force, updateByTags, resets") {
    TaskRegistry.clear()
    try {
      TaskRegistry.register("a", "|value_emitter(.count(2))")
      TaskRegistry.register("b", "|value_emitter(.count(3))")
      TaskRegistry.addTags("b", Seq("hot"))
      // unchanged text: no-ops without force, everything with it
      assert(TaskRegistry.updateAll(spark, sf).isEmpty)
      assert(TaskRegistry.updateAll(spark, sf, force = true) ==
        Seq("a", "b"))
      assert(TaskRegistry.updateByTags(Seq("hot"), spark, sf,
        force = true) == Seq("b"))
      TaskRegistry.registerTemplate("t", "|value_emitter(.count(1))")
      TaskRegistry.resetTasks()
      assert(TaskRegistry.list().isEmpty)
      assert(TaskRegistry.listTemplates().map(_.name) == Seq("t"))
      TaskRegistry.resetTemplates()
      assert(TaskRegistry.listTemplates().isEmpty)
    } finally { TaskRegistry.clear(); Macros.clear() }
  }

  test("registry is process-global across SparkSessions (faxe_db is node-wide)") {
    // Two sessions share ONE task namespace, like the reference's Mnesia
    // store shared by every connection. Tasks are session-free DFS text;
    // only start() binds a session, and the running flag is global: the
    // second session must stop/restart to re-plan under itself.
    TaskRegistry.clear()
    try {
      val other = spark.newSession()
      TaskRegistry.register("shared", "|value_emitter(.count(3))")
      assert(TaskRegistry.list().map(_.name) == Seq("shared"))

      TaskRegistry.start("shared", spark, sf)
      // visible as running from the other session's point of view too
      assert(TaskRegistry.isRunning("shared"))
      intercept[Ir.DfsError](TaskRegistry.start("shared", other, sf))

      // stop, then the other session can claim it and plan its own frames
      TaskRegistry.stop("shared")
      val frames = TaskRegistry.start("shared", other, sf)
      assert(frames.values.head.sparkSession eq other)
      assert(frames.values.head.count() == 3)
    } finally { TaskRegistry.clear(); Macros.clear() }
  }
}
