package graft.dfs

import Ir.DfsError

/** Hand-rolled DFS lexer. Comment = `%` to end of line (the scripts use
  * `%%` and `%def …`); strings are single-quoted, lambda field refs are
  * double-quoted; durations are number+unit literals (faxe_time durations,
  * e.g. 30s / 100ms / 7d).
  */
object Lexer {

  sealed trait Tok
  case object Pipe extends Tok
  /** `||` — macro invocation prefix (faxe_dfs.erl:49-57 macro_fun;
    * dfs/other/macro1.dfs `||ctc_module_condition()`).
    */
  case object DPipe extends Tok
  case object Dot extends Tok
  case object LParen extends Tok
  case object RParen extends Tok
  case object LBracket extends Tok
  case object RBracket extends Tok
  case object Comma extends Tok
  case object Eq extends Tok
  final case class Ident(s: String) extends Tok
  final case class Str(s: String) extends Tok
  final case class FieldRef(s: String) extends Tok
  final case class Num(v: Double, isInt: Boolean) extends Tok
  final case class Dur(ms: Long, raw: String) extends Tok
  final case class Op(s: String) extends Tok
  case object LambdaKw extends Tok
  case object EagerKw extends Tok

  private val durUnits = Map(
    "ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L)

  def durationMs(raw: String): Option[Long] = {
    // negative durations are legal (shift(-3m), esp_shift.erl default -30s)
    val m = "^(-?\\d+)(ms|s|m|h|d|w)$".r.findFirstMatchIn(raw)
    m.map(g => g.group(1).toLong * durUnits(g.group(2)))
  }

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src(i + k) else '\u0000'
    while (i < n) {
      val c = src(i)
      if (c == '%') { while (i < n && src(i) != '\n') i += 1 }
      else if (c.isWhitespace) i += 1
      else if (c == '|' && peek(1) == '|') { out += DPipe; i += 2 }
      else if (c == '|') { out += Pipe; i += 1 }
      else if (c == '.' && !peek(1).isDigit) { out += Dot; i += 1 }
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == '[') { out += LBracket; i += 1 }
      else if (c == ']') { out += RBracket; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else if (c == '<' && peek(1) == '<' && peek(2) == '<') {
        // <<<raw json>>> literals (json_emitter docs in reference scripts)
        val j = src.indexOf(">>>", i + 3)
        if (j < 0) throw DfsError(s"unterminated <<<...>>> at offset $i")
        out += Str(src.substring(i + 3, j)); i = j + 3
      }
      else if (c == '\'') {
        val j = src.indexOf('\'', i + 1)
        if (j < 0) throw DfsError(s"unterminated string at offset $i")
        out += Str(src.substring(i + 1, j)); i = j + 1
      } else if (c == '"') {
        val j = src.indexOf('"', i + 1)
        if (j < 0) throw DfsError(s"unterminated field ref at offset $i")
        out += FieldRef(src.substring(i + 1, j)); i = j + 1
      } else if (c.isDigit || (c == '-' && peek(1).isDigit &&
          !out.result().lastOption.exists(t =>
            t.isInstanceOf[Num] || t.isInstanceOf[Ident] ||
              t.isInstanceOf[FieldRef] || t == RParen))) {
        val start = i
        if (c == '-') i += 1
        while (peek().isDigit) i += 1
        var isInt = true
        if (peek() == '.' && peek(1).isDigit) {
          isInt = false; i += 1
          while (peek().isDigit) i += 1
        }
        // duration suffix?
        val numEnd = i
        while (peek().isLetter) i += 1
        val suffix = src.substring(numEnd, i)
        val numStr = src.substring(start, numEnd)
        if (suffix.nonEmpty) {
          durationMs(numStr + suffix) match {
            case Some(ms) => out += Dur(ms, numStr + suffix)
            case None => throw DfsError(s"bad duration '$numStr$suffix'")
          }
        } else out += Num(numStr.toDouble, isInt)
      } else if (c.isLetter || c == '_' || c == '@') {
        // '@name' is a user-component node (faxe_dfs.erl:14 USER_NODE_PREFIX)
        val start = i
        if (c == '@') i += 1
        while (peek().isLetterOrDigit || peek() == '_') i += 1
        val word = src.substring(start, i)
        // `lambda:` introduces a lambda; `e:` an eagerly-evaluated
        // expression def (dfs/test/env.dfs:1) — same expression grammar,
        // the def is constant-folded at plan time
        if (word == "lambda" && peek() == ':') {
          out += LambdaKw; i += 1
        }
        else if (word == "e" && peek() == ':') {
          out += EagerKw; i += 1
        }
        else if (word == "AND" || word == "OR") out += Op(word)
        else out += Ident(word)
      } else if ("><=!".contains(c)) {
        val two = "" + c + peek(1)
        if (Seq(">=", "<=", "==", "!=").contains(two)) { out += Op(two); i += 2 }
        else if (c == '=') { out += Eq; i += 1 }
        else { out += Op(c.toString); i += 1 }
      } else if ("+-*/".contains(c)) { out += Op(c.toString); i += 1 }
      else throw DfsError(s"unexpected character '$c' at offset $i")
    }
    out.result()
  }
}
