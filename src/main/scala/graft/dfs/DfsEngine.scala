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
    UserComponents.registerAll() // reference-shipped examples, idempotent
    val script = Macros.expand(Parser.parse(src))
    Planner.validate(script)
    script
  }

  /** Plan every chain. Named chains (`def x = |…`) are planned once and
    * reused by reference — fan-out shares the DataFrame (Catalyst reuses
    * the subplan). Returns the terminal DataFrame of each anonymous chain
    * as chain_1, chain_2, … plus named chains under their own names.
    */
  def run(src: String, spark: SparkSession, dir: String): Map[String, DataFrame] =
    run(compile(src), spark, dir)

  /** Plan a pre-compiled script (one compile serves both the caller's
    * chain inspection and the run — runSingle would otherwise compile
    * twice, and a Macros registry change between the two compiles could
    * desync chain numbering from the planned chains).
    */
  def run(script0: Script, spark: SparkSession,
      dir: String): Map[String, DataFrame] = {
    val script = script0.copy(defs = foldDefs(script0.defs, spark))
    val memo = collection.mutable.Map.empty[String, Ctx]
    val planning = collection.mutable.Set.empty[String]

    lazy val env: Env = Env(spark, dir, script.defs, frameOf,
      script.namedChains.contains)

    def planChain(chain: Chain): Ctx = {
      val start: Option[Ctx] = chain.sourceRef.map(frameOf)
      chain.nodes.foldLeft(start) { (ctxOpt, n) =>
        val nd = Planner.lookup(n.name)
        // a source mid-chain ignores upstream (timer-driven emitters
        // drop received items in the reference)
        Some(planNode(nd, if (nd.wants.isEmpty) None else ctxOpt, n, env))
      }.getOrElse(throw DfsError("empty chain"))
    }

    // Lenient field resolution (reference parity): a lambda path the
    // stream does not carry is `undefined` in faxe, never an error. On an
    // unresolved-column failure, record the missing root (→ NULL literal,
    // Paths.lenientScope) and replan the node. Bounded: each retry must
    // add a NEW missing root or the error rethrows.
    def planNode(nd: Planner.NodeDef, c: Option[Ctx], n: NodeSpec,
        env: Env): Ctx = {
      // roots recorded missing are scoped to THIS node's retries: once it
      // plans (nulls baked into its frame), the names revert to strict
      // resolution — a field one stream lacks may exist in a later node
      // or sibling chain and must not silently null there
      val added = scala.collection.mutable.Set.empty[String]
      def record(root: String): Boolean = {
        val fresh = graft.core.Paths.addLenientMissing(root)
        if (fresh) added += root
        fresh
      }
      // the node's input schema backs the retry-time schema walk (null
      // exactly the deep paths the schema PROVES undefined — see
      // Paths.walkMarker for why it only activates on retry)
      try graft.core.Paths.withLenientSchema(c.map(_.df.schema)) {
        planNodeLoop(nd, c, n, env, record)
      }
      finally added.foreach(graft.core.Paths.removeLenientMissing)
    }

    def planNodeLoop(nd: Planner.NodeDef, c: Option[Ctx], n: NodeSpec,
        env: Env, record: String => Boolean): Ctx = {
      while (true) {
        try return nd.plan(c, n, env)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(_.startsWith("UNRESOLVED_COLUMN")) =>
            // objectName may render a dotted literal key as multiple
            // quoted parts (`SHx`.`OpDstRet` for the flat key
            // "SHx.OpDstRet") — try the full joined name first, the first
            // segment second
            val full = Option(e.getMessageParameters.get("objectName"))
              .getOrElse("").replace("`", "")
            val root = full.takeWhile(_ != '.')
            if (full.isEmpty ||
                (!record(full) && (root == full || !record(root))))
              throw e
          // a deep path whose root is a scalar ("val.val" where val is a
          // BIGINT) is equally `undefined` in the reference — null the
          // root's DEEP refs and replan (jpath.dfs, stats_test.dfs). The
          // deep marker leaves bare refs of the same root resolving to
          // the real column: `eval(lambda: "val" * 2, lambda: "val.deep")`
          // must keep val*2 intact while val.deep goes NULL
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition)
                .exists(_.startsWith("INVALID_EXTRACT_BASE_FIELD_TYPE")) =>
            // the error names the scalar ROOT, so the deep marker is
            // already per-root precise: only extractions INTO it null
            val base = Option(e.getMessageParameters.get("base")).getOrElse("")
            val root = base.stripPrefix("\"").takeWhile(_ != '"')
            if (root.isEmpty || !root.forall(ch => ch.isLetterOrDigit ||
                ch == '_' || ch == '.') ||
                !record(graft.core.Paths.deepMarker(root)))
              throw e
          // a struct that exists but lacks the referenced SUBfield
          // (FIELD_NOT_FOUND names only the missing leaf): the
          // leaf-scoped schema walk nulls exactly the paths whose
          // parent struct provably lacks that leaf; the coarse leaf
          // marker is the last resort when the walk can't prove any
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition)
                .exists(_.startsWith("FIELD_NOT_FOUND")) =>
            val leaf = Option(e.getMessageParameters.get("fieldName"))
              .getOrElse("").replace("`", "")
            record(graft.core.Paths.WalkFlag) // cheap gate for ref()
            if (leaf.isEmpty ||
                (!record(graft.core.Paths.walkMarker(leaf)) &&
                  !record(graft.core.Paths.leafMarker(leaf))))
              throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }

    def frameOf(name: String): Ctx =
      memo.getOrElseUpdate(name, {
        // a chain that (transitively) references itself would recurse
        // forever — surface the cycle as a script error instead
        if (!planning.add(name))
          throw DfsError(s"circular stream reference '$name'")
        try planChain(script.namedChains.getOrElse(name,
          throw DfsError(s"undefined stream reference '$name'")))
        finally planning.remove(name)
      })

    graft.core.Paths.lenientScope {
      // a DETACHED named chain (starts with an input-needing node, no
      // source — cond_test1.dfs trailing `def` fragments) has nothing to
      // fire it: planned only if another chain references it as a frame,
      // never eagerly
      val named = script.namedChains.collect {
        case (nm, ch) if !Planner.detached(ch) => nm -> frameOf(nm).df
      }
      // detached segments (no source — macro body form) compile but have
      // nothing to fire them: skipped, keeping the chain_N numbering of the
      // chains that do run
      val anon = script.chains.zipWithIndex.collect {
        case (c, i) if !Planner.detached(c) => s"chain_${i + 1}" -> planChain(c).df
      }
      (named ++ anon).toMap
    }
  }

  /** Constant-fold `e:` expression defs to literal values before
    * planning (dfs/test/env.dfs — faxe resolves these at deploy time).
    * Catalyst does the evaluation: the expression runs over one literal
    * row, so env()/string/bool logic all work. Deploy-time evaluation has
    * NO data point in the reference, so a field reference inside an `e:`
    * def is `undefined` — replicated by folding inside a lenient scope
    * where unresolved roots become nulls (template_test.dfs
    * `def rewrite_fun = e: …"data.x"…`).
    */
  private def foldDefs(defs: Map[String, Ir.Value],
      spark: SparkSession): Map[String, Ir.Value] =
    defs.map {
      case (name, Ir.VEager(e)) =>
        def eval(): Any = spark.range(1)
          .select(Planner.lambdaColumn(e, defs).as("v")).head.get(0)
        val v =
          try graft.core.Paths.lenientScope {
            var out: Option[Any] = None
            while (out.isEmpty) {
              try out = Some(eval())
              catch {
                case ex: org.apache.spark.sql.AnalysisException
                    if Option(ex.getCondition)
                      .exists(_.startsWith("UNRESOLVED_COLUMN")) =>
                  val obj = Option(ex.getMessageParameters.get("objectName"))
                    .getOrElse("")
                  val root = obj.stripPrefix("`").takeWhile(_ != '`')
                  if (root.isEmpty ||
                      !graft.core.Paths.addLenientMissing(root)) throw ex
              }
            }
            out.get
          }
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
    val all = run(script, spark, dir)
    (script.chains.size to 1 by -1).iterator
      .map(i => all.get(s"chain_$i")).collectFirst { case Some(df) => df }
      .getOrElse(throw Ir.DfsError("no runnable chain in script"))
  }

  /** One node instance of the deploy graph: `instance` is the
    * reference's `{type}{parse-index}` naming (`mqtt_subscribe1`,
    * `debug2`, … — faxe_dfs.erl node naming as pinned by
    * test/dfs_to_graph.erl), `args` the positional arguments, `options`
    * the given `.option(...)`s — both with defs substituted.
    */
  final case class GraphNode(instance: String, node: String,
      args: Seq[Ir.Value], options: Map[String, Seq[Ir.Value]])

  /** The compiled deploy graph — the analog of `faxe_dfs:file/2`'s
    * `{Nodes, Edges}` map that the reference's test/dfs_to_graph.erl
    * eunit suite pins. Validation runs first (an unknown option raises
    * [[Ir.DfsError]], matching the suite's `unknown_opt_test`), then
    * `e:` defs are folded at plan time, so a def like
    * `e: str_replace(topic, '/', '.')` lands in options as the literal
    * string — exactly the bridge_expr_test expectation
    * (routing_key => "some.crazy.topic.this.is").
    */
  final case class DeployGraph(nodes: Seq[GraphNode],
      edges: Seq[(String, String)]) {
    def node(instance: String): GraphNode =
      nodes.find(_.instance == instance).getOrElse(
        throw Ir.DfsError(s"no node instance '$instance' in graph"))
  }

  def graph(src: String, spark: SparkSession): DeployGraph = {
    val script0 = compile(src)
    val script = script0.copy(defs = foldDefs(script0.defs, spark))
    def inst(n: NodeSpec): String = s"${n.name}${n.id}"
    def gnode(n: NodeSpec): GraphNode =
      GraphNode(inst(n), n.name,
        n.args.map(Planner.resolve(_, script.defs)),
        n.options.map { case (k, vs) =>
          k -> vs.map(Planner.resolve(_, script.defs))
        })
    val allChains =
      script.namedChains.toSeq.sortBy(_._2.nodes.head.id).map(_._2) ++
        script.chains
    val edges = Seq.newBuilder[(String, String)]
    allChains.foreach { c =>
      for (ref <- c.sourceRef; nc <- script.namedChains.get(ref);
           from <- nc.nodes.lastOption; to <- c.nodes.headOption)
        edges += inst(from) -> inst(to)
      c.nodes.sliding(2).foreach {
        case Seq(a, b) => edges += inst(a) -> inst(b)
        case _ =>
      }
    }
    DeployGraph(allChains.flatMap(_.nodes).sortBy(_.id).map(gnode),
      edges.result())
  }
}
