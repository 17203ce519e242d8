package graft.dsl

/** Parser for the `fn_transform_*` column-transformation mini-DSL.
  *
  * Grammar (from the reference's ExpressionParser,
  * artifacts/aws-glue/code/stage/light_transform.py:619-692 and the recursive
  * nested-call handling at :754-797):
  *
  *   expr   := call | token
  *   call   := fn_transform_NAME '(' args ')'
  *   args   := ''  |  expr (',' expr)*      -- split on TOP-LEVEL commas only,
  *                                             respecting () nesting and '/"
  *                                             quoting (reference
  *                                             extract_data.py:523-563)
  *   token  := bare text — resolved at compile time to a column reference if it
  *             names an input column, else a literal; '$'-prefix forces literal
  *             (light_transform.py:746-748, 788-794)
  */
sealed trait DslExpr
final case class FnCall(name: String, args: List[DslExpr]) extends DslExpr
final case class Token(text: String) extends DslExpr

object Parser {
  private val FnPrefix = "fn_transform_"

  /** Split `s` on top-level commas, respecting () nesting and quotes.
    * Mirrors reference extract_data.py:523-563 / query_builder.py:167-203. */
  def splitTopLevel(s: String, sep: Char = ','): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != 0) {
        cur += ch
        if (ch == quote) quote = 0
      } else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one DSL expression (possibly nested). */
  def parse(raw: String): DslExpr = {
    val s = raw.trim
    val open = s.indexOf('(')
    if (s.startsWith(FnPrefix) && open > 0 && s.endsWith(")")) {
      val name = s.substring(FnPrefix.length, open)
      val inner = s.substring(open + 1, s.length - 1)
      FnCall(name, splitTopLevel(inner).map(parse))
    } else Token(s)
  }
}
