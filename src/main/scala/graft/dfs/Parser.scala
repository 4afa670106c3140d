package graft.dfs

import Ir._
import Lexer._

/** Recursive-descent parser for DFS scripts (grammar recovered from the
  * reference's dfs/ scripts and test/dfs_to_graph.erl expectations):
  *
  * {{{
  * script := ( "def" name "=" (chain|value) | chain )*
  * chain  := [sourceRef] node+
  * node   := "|" name "(" args ")" option*
  * option := "." name "(" args ")"
  * arg    := "lambda:" expr | literal | ref
  * }}}
  */
object Parser {

  def parse(src: String): Script = new Parser(Lexer.lex(src)).script()

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private var nextId = 0
    private def peek(k: Int = 0): Option[Tok] =
      if (pos + k < toks.length) Some(toks(pos + k)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(t: Tok): Unit = {
      if (peek().contains(t)) pos += 1
      else throw DfsError(s"expected $t, found ${peek().getOrElse("EOF")}")
    }

    def script(): Script = {
      var defs = Map.empty[String, Value]
      // declaration order matters: unreferenced named chains (e.g. a `mem`
      // side-effect chain) plan in script order, and a plain Map loses
      // insertion order past 4 entries
      var named = scala.collection.immutable.ListMap.empty[String, Chain]
      val chains = Seq.newBuilder[Chain]
      while (peek().isDefined) {
        peek() match {
          // `var` is def's mutable-template twin in the reference scripts
          // (other/win_time_test.dfs:1) — same statement shape here
          case Some(Ident("def")) | Some(Ident("var")) =>
            next()
            val name = ident()
            expect(Eq)
            if (peek().contains(Pipe) || peek().contains(DPipe))
              named += name -> chain(None)
            else if (peek().exists(_.isInstanceOf[Ident]) &&
                (peek(1).contains(Pipe) || peek(1).contains(DPipe))) {
              // `def x = other |node…` — a named chain sourced from a ref
              val ref = ident()
              named += name -> chain(Some(ref))
            }
            else if (peek().contains(LambdaKw)) {
              // `def x = lambda: <expr>` — a lambda VALUE: substitutes
              // into node options as a lambda (template_test.dfs
              // eval(rewrite_fun)), never folded
              next()
              defs += name -> VLambda(orExpr())
            }
            else if (peek().contains(EagerKw)) {
              // `def x = e: <expr>` — an expression def, constant-folded
              // by the engine before planning (dfs/test/env.dfs)
              next()
              defs += name -> VEager(orExpr())
            }
            else defs += name -> literal()
          case Some(Ident(a)) if a.startsWith("@") && peek(1).contains(LParen) =>
            // a user-component node continues (or starts) a chain with no
            // leading pipe (python1.dfs `@callback()`)
            chains += chain(None)
          case Some(Ident(ref))
              if peek(1).contains(Pipe) || peek(1).contains(DPipe) =>
            next()
            chains += chain(Some(ref))
          case Some(Pipe) | Some(DPipe) =>
            chains += chain(None)
          case other =>
            throw DfsError(s"unexpected token $other at statement level")
        }
      }
      Script(defs, named, chains.result())
    }

    private def ident(): String = next() match {
      case Ident(s) => s
      case t => throw DfsError(s"expected identifier, found $t")
    }

    private def chain(sourceRef: Option[String]): Chain = {
      val nodes = Seq.newBuilder[NodeSpec]
      def atUserNode: Boolean = peek().exists {
        case Ident(s) => s.startsWith("@") && peek(1).contains(LParen)
        case _ => false
      }
      while (peek().contains(Pipe) || peek().contains(DPipe) || atUserNode) {
        val isMacro = peek() match {
          case Some(DPipe) => next(); true
          case Some(Pipe) => next(); false
          case _ => false // bare @user_node() — no pipe to consume
        }
        val name = ident()
        expect(LParen)
        // node parens hold positional args and/or inline `.option(...)`s
        // (both forms appear in the reference scripts / SURVEY §7.2)
        val as = Seq.newBuilder[Value]
        var opts = Map.empty[String, Seq[Value]]
        def option(): Unit = {
          next()
          val on = ident()
          expect(LParen)
          val ov = args()
          expect(RParen)
          opts += on -> ov
        }
        while (!peek().contains(RParen)) {
          if (peek().contains(Dot)) option()
          else {
            as += arg()
            if (peek().contains(Comma)) next()
          }
        }
        expect(RParen)
        // trailing `.option(...)`s after the closing paren
        while (peek().contains(Dot) && peek(1).exists(_.isInstanceOf[Ident]) &&
            peek(2).contains(LParen)) option()
        nodes += NodeSpec(name, as.result(), opts, { nextId += 1; nextId },
          isMacro)
      }
      val ns = nodes.result()
      if (ns.isEmpty) throw DfsError("empty chain")
      Chain(sourceRef, ns)
    }

    /** One argument: `lambda:`-prefixed expression, a bare function call
      * (reference scripts write `random_latin_string(12)` without the
      * prefix), or a literal.
      */
    private def arg(): Value = peek() match {
      case Some(LambdaKw) | Some(EagerKw) => next(); VLambda(orExpr())
      case Some(Ident(_)) if peek(1).contains(LParen) => VLambda(orExpr())
      case _ => literal()
    }

    private def args(): Seq[Value] = {
      val out = Seq.newBuilder[Value]
      while (!peek().contains(RParen)) {
        out += arg()
        if (peek().contains(Comma)) next()
        else if (!peek().contains(RParen))
          throw DfsError(s"expected ',' or ')', found ${peek().getOrElse("EOF")}")
      }
      out.result()
    }

    private def literal(): Value = next() match {
      case Str(s) => VStr(s)
      case Num(v, i) => VNum(v, i)
      case Dur(ms, raw) => VDur(ms, raw)
      case Ident("true") => VBool(true)
      case Ident("false") => VBool(false)
      case Ident(r) => VRef(r)
      case FieldRef(f) => VStr(f)
      case t => throw DfsError(s"expected literal, found $t")
    }

    // ---- lambda expression grammar, standard precedence ----------------
    private def orExpr(): LExpr = {
      var l = andExpr()
      while (peek().contains(Op("OR"))) { next(); l = LBin("OR", l, andExpr()) }
      l
    }
    private def andExpr(): LExpr = {
      var l = cmpExpr()
      while (peek().contains(Op("AND"))) { next(); l = LBin("AND", l, cmpExpr()) }
      l
    }
    private def cmpExpr(): LExpr = {
      var l = addExpr()
      while (peek().exists {
        case Op(o) => Seq(">", "<", ">=", "<=", "==", "!=").contains(o)
        case _ => false
      }) {
        val Op(o) = next(): @unchecked
        l = LBin(o, l, addExpr())
      }
      l
    }
    private def addExpr(): LExpr = {
      var l = mulExpr()
      while (peek().exists { case Op(o) => o == "+" || o == "-"; case _ => false }) {
        val Op(o) = next(): @unchecked
        l = LBin(o, l, mulExpr())
      }
      l
    }
    private def mulExpr(): LExpr = {
      var l = unary()
      while (peek().exists { case Op(o) => o == "*" || o == "/"; case _ => false }) {
        val Op(o) = next(): @unchecked
        l = LBin(o, l, unary())
      }
      l
    }
    private def unary(): LExpr = peek() match {
      case Some(Op("-")) => next(); LBin("-", LNum(0, isInt = true), unary())
      case Some(Ident("NOT")) => next(); LNot(unary())
      case _ => primary()
    }
    private def primary(): LExpr = next() match {
      case FieldRef(f) => LField(f)
      case Str(s) => LStr(s)
      case Num(v, i) => LNum(v, i)
      case Dur(ms, _) => LNum(ms.toDouble, isInt = true)
      case Ident("true") => LBool(true)
      case Ident("false") => LBool(false)
      case Ident(name) if peek().contains(LParen) =>
        next()
        val as = Seq.newBuilder[LExpr]
        while (!peek().contains(RParen)) {
          as += orExpr()
          if (peek().contains(Comma)) next()
        }
        expect(RParen)
        LCall(name, as.result())
      case Ident(name) => LCall("__ref__", Seq(LStr(name)))
      case LParen =>
        val e = orExpr()
        expect(RParen)
        e
      case LBracket =>
        // [a, b, c] list literal (vararg argument form in reference
        // scripts, e.g. str_concat([...]))
        val es = Seq.newBuilder[LExpr]
        while (!peek().contains(RBracket)) {
          es += orExpr()
          if (peek().contains(Comma)) next()
        }
        expect(RBracket)
        LCall("__list__", es.result())
      case t => throw DfsError(s"unexpected token in expression: $t")
    }
  }
}
