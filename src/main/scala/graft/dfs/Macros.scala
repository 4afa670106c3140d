package graft.dfs

import Ir._

/** DFS macro expansion (ref: faxe_dfs.erl:49-57 `macro_fun` — a macro
  * name resolves to another stored task's DFS text, which the parser
  * expands inline; dfs/other/macro1.dfs shows the call form
  * `||ctc_module_condition().val(2)`).
  *
  * Expansion is purely compile-time: the macro's body chain is spliced
  * into the host chain at the invocation position, and the invocation's
  * options override the macro's `def`s (`.val(2)` rebinds `def val = 1`).
  * The overridden defs are substituted into the spliced nodes as
  * literals, so the expanded script plans exactly like hand-written DFS
  * and the macro's internal names never leak into the host scope.
  */
object Macros {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Pluggable lookup for unregistered names — the analog of faxe's
    * `faxe:get_task(MacroName)` stored-task fetch.
    */
  @volatile private var resolver: String => Option[String] = _ => None

  /** Register a named macro body (a DFS fragment: defs + one headless
    * chain). The analog of storing a task under this flow id.
    */
  def register(name: String, dfs: String): Unit = registry.put(name, dfs)

  def setResolver(f: String => Option[String]): Unit = resolver = f

  def clear(): Unit = { registry.clear(); resolver = _ => None }

  private def lookup(name: String): String =
    Option(registry.get(name)).orElse(resolver(name)).getOrElse(
      // reference error shape, faxe_dfs.erl:56
      throw DfsError(s"macro '$name' could not be found"))

  /** Expand every macro invocation in the script. Recursive (a macro may
    * invoke macros) with a depth cap against cycles.
    */
  def expand(script: Script): Script =
    if (!hasMacro(script)) script
    else Script(script.defs,
      script.namedChains.map { case (k, c) => k -> expandChain(c, 0) },
      script.chains.map(expandChain(_, 0)))

  private def hasMacro(s: Script): Boolean =
    (s.namedChains.values ++ s.chains).exists(_.nodes.exists(_.isMacro))

  private def expandChain(c: Chain, depth: Int): Chain =
    c.copy(nodes = expandNodes(c.nodes, depth))

  private def expandNodes(ns: Seq[NodeSpec], depth: Int): Seq[NodeSpec] =
    ns.flatMap { n =>
      if (!n.isMacro) Seq(n)
      else {
        if (depth >= 16)
          throw DfsError(s"macro '${n.name}': expansion too deep (cycle?)")
        if (n.args.nonEmpty) throw DfsError(
          s"macro '${n.name}': positional args are not supported — " +
            "override a def with .<defname>(value)")
        val mac = Parser.parse(lookup(n.name))
        if (mac.namedChains.nonEmpty) throw DfsError(
          s"macro '${n.name}': named chains inside a macro body are not supported")
        val body = mac.chains match {
          case Seq(one) if one.sourceRef.isEmpty => one.nodes
          case Seq(_) => throw DfsError(
            s"macro '${n.name}': body chain must not have a source ref")
          case _ => throw DfsError(
            s"macro '${n.name}': body must be a single chain " +
              s"(found ${mac.chains.size})")
        }
        val eff = mac.defs ++ n.options.map { case (k, vs) =>
          if (!mac.defs.contains(k)) throw DfsError(
            s"macro '${n.name}' has no def '$k'.${suggest(k, mac.defs.keys)}")
          k -> vs.headOption.getOrElse(
            throw DfsError(s"macro '${n.name}': .$k needs a value"))
        }
        expandNodes(body.map(substNode(_, eff)), depth + 1)
      }
    }

  // ---- def substitution into the spliced nodes -------------------------

  private def substNode(n: NodeSpec, defs: Map[String, Value]): NodeSpec =
    n.copy(args = n.args.map(substValue(_, defs)),
      options = n.options.map { case (k, vs) =>
        k -> vs.map(substValue(_, defs))
      })

  private def substValue(v: Value, defs: Map[String, Value]): Value = v match {
    case VRef(name) => defs.getOrElse(name, v) // unknown → host-scope def
    case VLambda(e) => VLambda(substExpr(e, defs))
    case VStr(s) => VStr(interpKeep(s, defs))
    case other => other
  }

  private def substExpr(e: LExpr, defs: Map[String, Value]): LExpr = e match {
    case LCall("__ref__", Seq(LStr(name))) if defs.contains(name) =>
      valueToLit(defs(name))
    case LCall(fn, args) => LCall(fn, args.map(substExpr(_, defs)))
    case LBin(op, l, r) => LBin(op, substExpr(l, defs), substExpr(r, defs))
    case LNot(x) => LNot(substExpr(x, defs))
    case LStr(s) => LStr(interpKeep(s, defs))
    case other => other
  }

  /** `{{var}}` interpolation against the macro's defs only — unknown vars
    * stay verbatim for the host script's plan-time interpolation.
    */
  private def interpKeep(s: String, defs: Map[String, Value]): String =
    "\\{\\{(\\w+)\\}\\}".r.replaceAllIn(s, m =>
      defs.get(m.group(1)) match {
        case Some(VStr(x)) => java.util.regex.Matcher.quoteReplacement(x)
        case Some(VNum(d, true)) => d.toLong.toString
        case Some(VNum(d, false)) => d.toString
        case Some(VLong(l)) => l.toString
        case Some(VBool(b)) => b.toString
        case Some(VDur(_, raw)) => raw
        case _ => java.util.regex.Matcher.quoteReplacement(m.matched)
      })

  private def valueToLit(v: Value): LExpr = v match {
    case VStr(s) => LStr(s)
    case VNum(d, i) => LNum(d, i)
    case VLong(l) => LLong(l)
    case VBool(b) => LBool(b)
    case VDur(ms, _) => LNum(ms.toDouble, isInt = true)
    case VLambda(e) => e
    case VRef(name) => LCall("__ref__", Seq(LStr(name)))
  }
}
