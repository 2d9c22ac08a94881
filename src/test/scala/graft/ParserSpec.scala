package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang.{Ast, Lexer, Parser}
import graft.lang.Lexer._
import graft.lang.Ast._

/** Lexer/parser edge cases ported from the reference's
  * saneql/lexer.test.cpp and saneql/parser.test.cpp — the corners beyond
  * the golden corpus's 19 typed rejections: comment handling, quoted/
  * escaped identifiers, numeric-literal boundaries, partial operators,
  * and malformed argument/record shapes.
  */
class ParserSpec extends AnyFunSuite {

  private def toks(s: String): Vector[Token] = Lexer.tokenize(s)

  // ---- fuzz: arbitrary input must parse or raise the TYPED errors ----
  //      (LexError / ParseError) — never a StackOverflow, MatchError, or
  //      NumberFormatException escaping to the server's catch-all. The
  //      generator mixes the whole token alphabet with raw junk so deep
  //      nesting, dangling operators, unterminated quotes, and numeric
  //      edge cases all appear.
  test("fuzz: 2000 random inputs either parse or throw LexError/ParseError") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val atom: Gen[String] = Gen.oneOf(
      Gen.identifier.map(_.take(8)),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.oneOf("(", ")", "{", "}", ",", ".", "::", ":=", "&&", "||", "!",
        "=", "<>", "<", "<=", ">", ">=", "'", "\"", "--", "\n", " ", "-",
        "null", "true", "false", "between", "filter", "count", "0x", "1e9",
        "9223372036854775808", "''", "'a", "", "€"),
      Gen.choose(0, 0x7f).map(_.toChar.toString))
    val inputGen: Gen[String] =
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, atom)).map(_.mkString)
    var parsed = 0; var rejected = 0
    (0 until 2000).foreach { i =>
      val s = inputGen(Gen.Parameters.default, Seed(1234L + i)).getOrElse("")
      try { Parser.parse(s); parsed += 1 }
      catch {
        case _: Parser.ParseError => rejected += 1
        case _: Lexer.LexError => rejected += 1
      }
    }
    assert(parsed + rejected === 2000)
    assert(parsed > 0 && rejected > 0) // the generator exercises both paths
  }

  test("fuzz: deep nesting fails typed, not with a stack overflow") {
    for (deep <- Seq("(" * 5000 + "a" + ")" * 5000, "!" * 5000 + "a",
        "f(" * 5000 + "a" + ")" * 5000, "{x := " * 2000 + "1" + "}" * 2000)) {
      val e = intercept[Parser.ParseError](Parser.parse(deep))
      assert(e.getMessage.contains("nested too deeply"))
    }
    // legitimate nesting well under the bound still parses
    assert(Parser.parse("(" * 100 + "a" + ")" * 100) === Ident("a"))
  }

  // ---- lexer: comments (lexer.test.cpp:253-261,401-408,492-531) ----

  test("line comments: mid-line, at EOF without newline, consecutive, comment-only") {
    assert(toks("a -- this is a comment\nb") ===
      Vector(TIdent("a"), TIdent("b"), TEnd))
    assert(toks("a -- comment") === Vector(TIdent("a"), TEnd))
    assert(toks("-- first\n-- second\na") === Vector(TIdent("a"), TEnd))
    assert(toks("-- foo") === Vector(TEnd))
    assert(toks("   ") === Vector(TEnd))
  }

  // ---- lexer: quoted identifiers (lexer.test.cpp:293-327,477-505) ----

  test("quoted identifiers: plain, escaped quotes, numeric, newline, empty") {
    assert(toks("\"my column\"") === Vector(TIdent("my column"), TEnd))
    assert(toks("\"say \"\"hello\"\"\"") === Vector(TIdent("say \"hello\""), TEnd))
    assert(toks("\"2\"") === Vector(TIdent("2"), TEnd))
    assert(toks("\"col\nname\"") === Vector(TIdent("col\nname"), TEnd))
    assert(toks("\"\"") === Vector(TIdent(""), TEnd))
    val e = intercept[LexError](toks("\"unterminated"))
    assert(e.getMessage.contains("unterminated quoted identifier"))
    assert(e.line === 1 && e.col === 1)
  }

  // ---- lexer: string escapes (lexer.test.cpp:277-291,358-364) ----

  test("string literals: '' escape mid-string, at end, empty, unterminated") {
    assert(toks("'it''s'") === Vector(TString("it's"), TEnd))
    assert(toks("'it'''") === Vector(TString("it'"), TEnd))
    assert(toks("''") === Vector(TString(""), TEnd))
    assert(intercept[LexError](toks("'unterminated"))
      .getMessage.contains("unterminated string literal"))
  }

  // ---- lexer: numeric corners (lexer.test.cpp:36-74,329-399) ----

  test("numeric literals: leading/trailing dot, double dot, overflow") {
    // .5 is DOT + int, not a float
    assert(toks(".5") === Vector(TPunct("."), TInt(5), TEnd))
    // 5. IS a float
    assert(toks("5.") === Vector(TFloat(5.0), TEnd))
    assert(toks("3.14") === Vector(TFloat(3.14), TEnd))
    // 1.2.3 is one invalid float, not FLOAT DOT INT
    assert(intercept[LexError](toks("1.2.3"))
      .getMessage.contains("invalid float literal"))
    // unsigned-64 overflow rejected at lex time (u64max followed by 0)
    assert(intercept[LexError](toks("184467440737095516150"))
      .getMessage.contains("invalid integer literal"))
    // minus binds as its own token
    assert(toks("-42") === Vector(TPunct("-"), TInt(42), TEnd))
    assert(toks("x -42") === Vector(TIdent("x"), TPunct("-"), TInt(42), TEnd))
  }

  // ---- lexer: partial operators (lexer.test.cpp:109-138,430-459) ----

  test("partial operators produce targeted errors with line:column") {
    val e1 = intercept[LexError](toks("a & b"))
    assert(e1.getMessage.contains("expected '&&'"))
    assert(e1.line === 1 && e1.col === 3)
    assert(intercept[LexError](toks("a | b")).getMessage.contains("expected '||'"))
    assert(intercept[LexError](toks("a : b"))
      .getMessage.contains("expected '::' or ':='"))
    assert(intercept[LexError](toks("&")).getMessage.contains("expected '&&'"))
    assert(intercept[LexError](toks("|")).getMessage.contains("expected '||'"))
    assert(intercept[LexError](toks(":")).getMessage.contains("expected '::' or ':='"))
    // lone < and > are fine
    assert(toks("<") === Vector(TPunct("<"), TEnd))
    assert(toks(">") === Vector(TPunct(">"), TEnd))
    val e2 = intercept[LexError](toks("a\nb @"))
    assert(e2.getMessage.contains("unexpected character '@'"))
    assert(e2.line === 2 && e2.col === 3)
  }

  test("CRLF and tabs are whitespace") {
    assert(toks("a\r\nb") === Vector(TIdent("a"), TIdent("b"), TEnd))
    assert(toks("a\tb") === Vector(TIdent("a"), TIdent("b"), TEnd))
  }

  // ---- parser: desugaring & precedence (parser.test.cpp:95,290-312,482,628) ----

  test("property access and method calls desugar to calls with receiver first") {
    assert(Parser.parse("a.b") === Call("b", Seq(Ident("a")), Nil))
    assert(Parser.parse("'hello'.upper()") ===
      Call("upper", Seq(StringLit("hello")), Nil))
    assert(Parser.parse("(a || b).filter(true)") ===
      Call("filter", Seq(Binary("||", Ident("a"), Ident("b")), BoolLit(true)), Nil))
    assert(Parser.parse("a.f(x:=1)") ===
      Call("f", Seq(Ident("a")), Seq("x" -> IntLit(1))))
  }

  test("precedence: || over && over comparisons; double negation; nested parens") {
    assert(Parser.parse("a = 1 && b = 2 || c = 3") ===
      Binary("||",
        Binary("&&",
          Binary("=", Ident("a"), IntLit(1)),
          Binary("=", Ident("b"), IntLit(2))),
        Binary("=", Ident("c"), IntLit(3))))
    assert(Parser.parse("!!(age > -1)") ===
      Not(Not(Binary(">", Ident("age"), IntLit(-1)))))
    assert(Parser.parse("(((a)))") === Ident("a"))
    assert(Parser.parse("a || b || c") ===
      Binary("||", Binary("||", Ident("a"), Ident("b")), Ident("c")))
  }

  test("type casts chain left-to-right") {
    assert(Parser.parse("a::t1::t2") === Cast(Cast(Ident("a"), "t1"), "t2"))
    assert(Parser.parse("42::int") === Cast(IntLit(42), "int"))
    assert(Parser.parse("'2020-01-01'::date") === Cast(StringLit("2020-01-01"), "date"))
  }

  test("sets vs records: single element, empty set, no mixing") {
    assert(Parser.parse("{a}") === SetLit(Seq(Ident("a"))))
    assert(Parser.parse("{}") === SetLit(Nil))
    assert(Parser.parse("{x:=1}") === RecordLit(Seq("x" -> IntLit(1))))
    assert(Parser.parse("f(x:=(a && b))") ===
      Call("f", Nil, Seq("x" -> Binary("&&", Ident("a"), Ident("b")))))
    // duplicate named args are accepted by the PARSER (the planner layer
    // rejects them, mirroring the reference's function registry)
    assert(Parser.parse("f(x:=1, x:=2)") ===
      Call("f", Nil, Seq("x" -> IntLit(1), "x" -> IntLit(2))))
  }

  // ---- parser: int64 boundaries (parser.test.cpp:587-626) ----

  test("int64 boundaries: max/min parse, one-past rejects") {
    assert(Parser.parse("9223372036854775807") === IntLit(Long.MaxValue))
    assert(Parser.parse("-9223372036854775807") === IntLit(-Long.MaxValue))
    assert(Parser.parse("-9223372036854775808") === IntLit(Long.MinValue))
    assert(intercept[Parser.ParseError](Parser.parse("9223372036854775808"))
      .getMessage.contains("out of range"))
    assert(intercept[Parser.ParseError](Parser.parse("-9223372036854775809"))
      .getMessage.contains("out of range"))
  }

  // ---- parser: malformed input (parser.test.cpp:210-282,353-441,507-585) ----

  test("malformed inputs reject with typed parse errors") {
    def rejects(q: String): Unit =
      assert(intercept[RuntimeException](Parser.parse(q)).isInstanceOf[RuntimeException], q)
    rejects("= 'broken'") // leading operator
    rejects("func(a, b") // unclosed args
    rejects("a b") // trailing garbage
    rejects("x < x <") // repeated comparison
    rejects("   ") // empty input
    rejects(".foo") // bare leading dot
    rejects("a..b") // double dot
    rejects("a.") // trailing dot
    rejects("a::") // trailing cast
    rejects("(a") // unclosed paren
    rejects("f(a,,b)") // double comma
    rejects("f(,a)") // leading comma
    rejects("{x:=1,}") // record trailing comma
    rejects("{a, b") // unclosed set
    rejects("{a:=1, 42:=2}") // non-identifier record field
    rejects("{a:=1, b 2}") // missing := in record
    rejects("{a.b := 'c'}") // non-simple record field name
    rejects("test(1, x(1) := false)") // non-simple named-arg name
    rejects("&&") // bare operator
    rejects("f(x:=1, 2)") // positional after named
    rejects("-'hello'") // minus on non-number
    rejects("x - 5") // arithmetic minus is not an operator
  }
}
