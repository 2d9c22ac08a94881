package graft.lang

import Lexer._

/** SaneQL AST + recursive-descent parser (reference:
  * src/silo/query_engine/saneql/{ast.h,parser.cpp}). Precedence:
  * `||` < `&&` < comparisons < `!`/postfix. Method-call sugar:
  * `t.f(a)` ≡ `f(t, a)`; named args `name := value` must follow all
  * positional ones. `'...'::date` is the only cast form.
  */
object Ast {
  sealed trait Expr
  case class IntLit(v: Long) extends Expr
  case class FloatLit(v: Double) extends Expr
  case class StringLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class Ident(name: String) extends Expr
  case class SetLit(items: Seq[Expr]) extends Expr
  case class RecordLit(items: Seq[(String, Expr)]) extends Expr
  case class Binary(op: String, l: Expr, r: Expr) extends Expr
  case class Not(e: Expr) extends Expr
  case class Cast(e: Expr, ty: String) extends Expr
  case class Call(name: String, pos: Seq[Expr], named: Seq[(String, Expr)]) extends Expr
}

object Parser {
  import Ast._

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): Expr = {
    val p = new Parser(Lexer.tokenize(input))
    val e = p.parseExpr()
    p.expectEnd()
    e
  }
}

final class Parser(tokens: Vector[Token]) {
  import Ast._
  import Parser.ParseError

  private var i = 0
  // recursion guard: a hostile deeply-nested input ("((((…") would
  // otherwise blow the JVM stack as a StackOverflowError — an Error no
  // NonFatal catch-all (e.g. the HTTP server's typed-400 handler)
  // intercepts. 256 levels is far beyond any legitimate query.
  private var depth = 0
  private def descend[T](body: => T): T = {
    depth += 1
    if (depth > 256) throw ParseError("expression nested too deeply")
    try body finally depth -= 1
  }
  private def peek: Token = tokens(i)
  private def next(): Token = { val t = tokens(i); i += 1; t }
  private def accept(p: String): Boolean = peek match {
    case TPunct(`p`) => i += 1; true
    case _ => false
  }
  private def expect(p: String): Unit =
    if (!accept(p)) throw ParseError(s"expected '$p', got $peek")

  def expectEnd(): Unit = peek match {
    case TEnd =>
    case t => throw ParseError(s"trailing input at $t")
  }

  def parseExpr(): Expr = descend(parseOr())

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (accept("||")) l = Binary("||", l, parseAnd())
    l
  }

  private def parseAnd(): Expr = {
    var l = parseCmp()
    while (accept("&&")) l = Binary("&&", l, parseCmp())
    l
  }

  private val cmpOps = Seq("=", "<>", "<=", ">=", "<", ">")

  private def parseCmp(): Expr = {
    val l = parseUnary()
    cmpOps.find(accept) match {
      case Some(op) => Binary(op, l, parseUnary())
      case None => l
    }
  }

  private def parseUnary(): Expr = descend {
    if (accept("!")) Not(parseUnary())
    else if (accept("-")) peek match {
      // negate at the token level so Long.MinValue (whose magnitude
      // overflows as a bare positive literal) round-trips
      case TInt(v) =>
        i += 1
        val n = -v
        if (n < BigInt(Long.MinValue)) throw ParseError("integer literal out of range")
        IntLit(n.toLong)
      case TFloat(v) => i += 1; FloatLit(-v)
      case _ => throw ParseError(s"cannot negate ${parseUnary()}")
    }
    else parsePostfix()
  }

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var continue = true
    while (continue) {
      if (accept(".")) {
        next() match {
          case TIdent(name) =>
            if (accept("(")) {
              val (pos, named) = parseArgs()
              e = Call(name, e +: pos, named)
            } else e = Call(name, Seq(e), Nil) // t.f ≡ f(t)
          case t => throw ParseError(s"expected method name after '.', got $t")
        }
      } else if (accept("::")) {
        next() match {
          case TIdent(ty) => e = Cast(e, ty)
          case t => throw ParseError(s"expected type name after '::', got $t")
        }
      } else continue = false
    }
    e
  }

  private def parseArgs(): (Seq[Expr], Seq[(String, Expr)]) = {
    val pos = Seq.newBuilder[Expr]
    val named = Seq.newBuilder[(String, Expr)]
    var sawNamed = false
    if (!accept(")")) {
      var more = true
      while (more) {
        (peek, tokens.lift(i + 1)) match {
          case (TIdent(name), Some(TPunct(":="))) =>
            i += 2
            named += name -> parseExpr()
            sawNamed = true
          case _ =>
            if (sawNamed)
              throw ParseError("positional argument after named argument")
            pos += parseExpr()
        }
        more = accept(",")
      }
      expect(")")
    }
    (pos.result(), named.result())
  }

  private def parsePrimary(): Expr = next() match {
    case TInt(v) =>
      if (v > BigInt(Long.MaxValue) || v < BigInt(Long.MinValue))
        throw ParseError("integer literal out of range")
      IntLit(v.toLong)
    case TFloat(v) => FloatLit(v)
    case TString(s) => StringLit(s)
    case TIdent("true") => BoolLit(true)
    case TIdent("false") => BoolLit(false)
    case TIdent("null") => NullLit
    case TIdent(name) =>
      if (accept("(")) { val (p, n) = parseArgs(); Call(name, p, n) }
      else Ident(name)
    case TPunct("(") =>
      val e = parseExpr(); expect(")"); e
    case TPunct("{") => parseBraced()
    case t => throw ParseError(s"unexpected token $t")
  }

  /** `{a, b}` set or `{x := 1, y := 2}` record (no mixing). */
  private def parseBraced(): Expr = {
    if (accept("}")) return SetLit(Nil)
    (peek, tokens.lift(i + 1)) match {
      case (TIdent(_), Some(TPunct(":="))) =>
        val items = Seq.newBuilder[(String, Expr)]
        var more = true
        while (more) {
          next() match {
            case TIdent(name) =>
              expect(":=")
              items += name -> parseExpr()
            case t => throw ParseError(s"expected field name in record, got $t")
          }
          more = accept(",")
        }
        expect("}")
        RecordLit(items.result())
      case _ =>
        val items = Seq.newBuilder[Expr]
        var more = true
        while (more) { items += parseExpr(); more = accept(",") }
        expect("}")
        SetLit(items.result())
    }
  }
}
