package graft.dfs

import Ir._
import Planner._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The DFS front-end entry point: script string → validated IR →
  * DataFrames (one per terminal chain), mirroring the reference lifecycle
  * faxe:eval_dfs → faxe_dfs:data → graph start (faxe.erl:396-419,
  * faxe_dfs.erl:42-47) with Spark plans instead of actor graphs.
  */
object DfsEngine {

  /** Parse + macro expansion + static validation (node names, options,
    * edge typing). Macro invocations (`||name(...)`) are resolved against
    * [[Macros]]' registry and spliced before validation, so an expanded
    * script validates exactly like hand-written DFS.
    */
  def compile(src: String): Script = {
    val script = Macros.expand(Parser.parse(src))
    Planner.validate(script)
    script
  }

  /** Plan every chain. Named chains (`def x = |…`) are planned once and
    * reused by reference — fan-out shares the DataFrame (Catalyst reuses
    * the subplan). Returns the terminal DataFrame of each anonymous chain
    * as chain_1, chain_2, … plus named chains under their own names.
    */
  def run(src: String, spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val script0 = compile(src)
    val script = script0.copy(defs = foldDefs(script0.defs, spark))
    val memo = collection.mutable.Map.empty[String, Ctx]

    lazy val env: Env = Env(spark, dir, script.defs, frameOf,
      script.namedChains.contains)

    def planChain(chain: Chain): Ctx = {
      val start: Option[Ctx] = chain.sourceRef.map(frameOf)
      chain.nodes.foldLeft(start) { (ctxOpt, n) =>
        val nd = Planner.lookup(n.name)
        // a source mid-chain ignores upstream (timer-driven emitters
        // drop received items in the reference)
        Some(nd.plan(if (nd.wants.isEmpty) None else ctxOpt, n, env))
      }.getOrElse(throw DfsError("empty chain"))
    }

    def frameOf(name: String): Ctx =
      memo.getOrElseUpdate(name,
        planChain(script.namedChains.getOrElse(name,
          throw DfsError(s"undefined stream reference '$name'"))))

    val named = script.namedChains.keys.map(n => n -> frameOf(name = n).df)
    // detached segments (no source — macro body form) compile but have
    // nothing to fire them: skipped, keeping the chain_N numbering of the
    // chains that do run
    val anon = script.chains.zipWithIndex.collect {
      case (c, i) if !Planner.detached(c) => s"chain_${i + 1}" -> planChain(c).df
    }
    (named ++ anon).toMap
  }

  /** Constant-fold `e:` expression defs to literal values before
    * planning (dfs/test/env.dfs — faxe resolves these at deploy time).
    * Catalyst does the evaluation: the expression runs over one literal
    * row, so env()/string/bool logic all work; an expression that
    * references a data field cannot be a constant and throws here.
    */
  private def foldDefs(defs: Map[String, Ir.Value],
      spark: SparkSession): Map[String, Ir.Value] =
    defs.map {
      case (name, Ir.VLambda(e)) =>
        val v =
          try spark.range(1).select(Planner.lambdaColumn(e, defs).as("v"))
            .head.get(0)
          catch {
            case ex: Exception => throw Ir.DfsError(
              s"def '$name': expression is not a constant (${ex.getMessage})")
          }
        name -> (v match {
          case null => Ir.VStr("")
          case s: String => Ir.VStr(s)
          case b: Boolean => Ir.VBool(b)
          case i: Int => Ir.VNum(i.toDouble, isInt = true)
          // Longs keep 64-bit exactness (ns epochs, wide ids would be
          // corrupted by a Double round-trip above 2^53)
          case l: Long => Ir.VLong(l)
          case d: Double => Ir.VNum(d, isInt = false)
          case f: Float => Ir.VNum(f.toDouble, isInt = false)
          case other => Ir.VStr(other.toString)
        })
      case kv => kv
    }

  /** Single-result convenience: the last runnable anonymous chain's
    * DataFrame (detached segments don't run, see [[run]]).
    */
  def runSingle(src: String, spark: SparkSession, dir: String): DataFrame = {
    val script = compile(src)
    val all = run(src, spark, dir)
    (script.chains.size to 1 by -1).iterator
      .map(i => all.get(s"chain_$i")).collectFirst { case Some(df) => df }
      .getOrElse(throw Ir.DfsError("no runnable chain in script"))
  }
}
