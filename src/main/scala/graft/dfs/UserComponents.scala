package graft.dfs

import graft.core.Paths
import Ir._
import org.apache.spark.sql.functions._

/** Engine-side ports of the user components the reference SHIPS with its
  * repo (the .py examples under /root/reference/python — the worked
  * examples of the c_python extension surface, faxe_dfs.erl:12-16
  * USER_NODE_PREFIX).
  * Each registers through the same [[Planner.registerNode]] door a user's
  * own component would use; components the reference does NOT ship
  * (`@mirror`, `@batch_start` appear in dev scripts but have no class in
  * the repo) stay unregistered and fail exactly as they would in a faxe
  * install without the user's classes.
  *
  * Python-class semantics → Spark, per file:
  *  - `@double` (double.py): `as` field := `field` * 2, deep paths
  *    honored (Point.value set_field semantics).
  *  - `@callback` (callback.py): pass-through (noop emit).
  *  - `@python_time` (python_time.py): adds field `python.time` =
  *    Faxe.now() — wall-clock ms, processing-time by definition, so
  *    run-level only (never oracle'd).
  *  - `@path` (path.py): Point.default of 'pyth.field2'/'pyth.field22'.
  *  - `@less_than` (less_than.py): drops rows where ANY listed numeric
  *    field is >= its threshold (filter_fun returns False on the first
  *    field at-or-over; missing/non-numeric fields don't veto).
  */
object UserComponents {

  @volatile private var installed = false

  def registerAll(): Unit = synchronized {
    if (installed) return
    installed = true

    def pt(opts: Set[String])(
        f: (Planner.Ctx, NodeSpec, Planner.Env) => org.apache.spark.sql.DataFrame) =
      Planner.NodeDef(Some(Both), Both, opts, (c, n, e) => {
        val ctx = c.getOrElse(throw DfsError(s"${n.name} needs an upstream input"))
        ctx.copy(df = f(ctx, n, e))
      })

    // double.py: Point.value(p, as, Point.value(p, field) * 2)
    Planner.registerNode("@double", pt(Set("field", "as")) { (ctx, n, env) =>
      val field = Planner.optionStr(n, "field", env)
        .getOrElse(throw DfsError("@double: .field"))
      val as = Planner.optionStr(n, "as", env)
        .getOrElse(throw DfsError("@double: .as"))
      Paths.set(ctx.df, as, Paths.ref(field) * 2)
    })

    // callback.py: noop emit
    Planner.registerNode("@callback", pt(Set.empty) { (ctx, _, _) => ctx.df })

    // python_time.py: field 'python.time' = Faxe.now() (wall-clock ms)
    Planner.registerNode("@python_time", pt(Set.empty) { (ctx, _, _) =>
      Paths.set(ctx.df, "python.time", unix_millis(current_timestamp()))
    })

    // path.py: Point.default twice under 'pyth.'
    Planner.registerNode("@path", pt(Set("field")) { (ctx, _, _) =>
      val d1 = Paths.set(ctx.df, "pyth.field2",
        coalesce(Paths.ref("pyth.field2").cast("string"),
          lit("did not have field2")))
      Paths.set(d1, "pyth.field22",
        coalesce(Paths.ref("pyth.field22").cast("string"),
          lit("did not have field22")))
    })

    // less_than.py: keep rows where every listed numeric field is under
    // its threshold (None / non-numeric values do not veto)
    Planner.registerNode("@less_than", pt(Set("fields", "values")) {
      (ctx, n, env) =>
        val fields = Planner.optionStrs(n, "fields", env)
        val values = Planner.optionNums(n, "values", env)
        if (fields.size != values.size)
          throw DfsError("@less_than: .fields/.values same length")
        val veto = fields.zip(values).map { case (f, v) =>
          val c = Paths.ref(f)
          c.isNotNull && c.cast("double") >= v
        }.reduceOption(_ || _).getOrElse(lit(false))
        ctx.df.filter(!veto)
    })
  }
}
