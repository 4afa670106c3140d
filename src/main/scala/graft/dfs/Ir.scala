package graft.dfs

/** DFS script IR — the analog of faxe's compiled graph definition
  * (ref: faxe_dfs.erl:94-162 eval → {Nodes, Connections} map).
  */
object Ir {

  /** Lambda expression AST (ref: faxe_dfs.erl:480-499 lambda compile). */
  sealed trait LExpr
  final case class LField(path: String) extends LExpr
  final case class LStr(s: String) extends LExpr
  final case class LNum(v: Double, isInt: Boolean) extends LExpr
  /** Exact 64-bit literal — folded defs beyond Double's 2^53 integral
    * range (ns epochs, wide ids) must not round-trip through Double.
    */
  final case class LLong(v: Long) extends LExpr
  final case class LBool(v: Boolean) extends LExpr
  final case class LCall(name: String, args: Seq[LExpr]) extends LExpr
  final case class LBin(op: String, l: LExpr, r: LExpr) extends LExpr
  final case class LNot(e: LExpr) extends LExpr

  /** Option / argument values. */
  sealed trait Value
  final case class VStr(s: String) extends Value
  final case class VNum(v: Double, isInt: Boolean) extends Value
  /** Exact 64-bit constant (see [[LLong]]) — produced by def folding. */
  final case class VLong(v: Long) extends Value
  final case class VBool(v: Boolean) extends Value
  final case class VDur(ms: Long, raw: String) extends Value
  final case class VLambda(e: LExpr) extends Value
  /** `e:` def — evaluated eagerly at plan time (deploy-time constant). */
  final case class VEager(e: LExpr) extends Value
  final case class VRef(name: String) extends Value

  /** One `|node(args).opt(vals)…` element. A `||name(...)` element is a
    * macro invocation (faxe_dfs.erl:49-57): `name` resolves to another
    * stored script whose body chain is spliced in at this position, with
    * the invocation's options overriding the macro's `def`s.
    */
  final case class NodeSpec(
      name: String,
      args: Seq[Value],
      options: Map[String, Seq[Value]],
      id: Int,
      isMacro: Boolean = false)

  /** A chain: optional named source ref + nodes in pipe order. */
  final case class Chain(sourceRef: Option[String], nodes: Seq[NodeSpec])

  /** Statement level: `def name = <value | chain>` or a bare chain. */
  final case class Script(
      defs: Map[String, Value],
      namedChains: Map[String, Chain],
      chains: Seq[Chain])

  /** Edge item typing (ref: esp_win_time.erl:34-35 wants/emits;
    * type-check faxe_dfs.erl:165-183).
    */
  sealed trait IoType { def label: String }
  case object Point extends IoType { val label = "point" }
  case object Batch extends IoType { val label = "batch" }
  case object Both extends IoType { val label = "both" }

  final case class DfsError(msg: String) extends RuntimeException(msg)

  /** Levenshtein distance for unknown-option suggestions
    * (ref: faxe_dfs.erl:356-367).
    */
  def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  def suggest(name: String, known: Iterable[String]): String =
    known.minByOption(levenshtein(name, _))
      .filter(levenshtein(name, _) <= 3)
      .map(s => s" Did you mean '$s'?").getOrElse("")
}
