package graft.dsl

/** Config-fragment translator (SURVEY §7.4.4): the reference's COLUMNS /
  * ID_COLUMN / FILTER_EXP strings are T-SQL-flavored. The OBSERVED surface in
  * the shipped config (tables.csv) is:
  *
  *   - `rtrim(ltrim(x)) + '|' + …`    string concatenation via `+`
  *   - `cast(x as varchar(20))`        varchar length casts
  *   - `dbo.func_cas_todatetime(f,h)`  magic date+time → datetime
  *   - `dbo.func_cas_todateint(f)`     magic day → yyyyMMdd int
  *   - `dbo.<table>` schema prefixes inside IN (SELECT …) filters
  *
  * Each is rewritten to Spark SQL built-ins; UNKNOWN `dbo.*` functions fail
  * loudly (explicit-failure policy for unobserved constructs). ltrim/rtrim
  * pass through — Spark has them natively.
  */
object TsqlTranslator {

  def translate(sql: String): String =
    translatePlus(stripSchema(rewriteFunctions(rewriteVarchar(sql))))

  /** `cast(x as varchar(n))` → `cast(x as string)` */
  private def rewriteVarchar(s: String): String =
    s.replaceAll("(?i)\\bas\\s+varchar\\s*\\(\\s*\\d+\\s*\\)", "as string")
      .replaceAll("(?i)\\bas\\s+varchar\\b", "as string")

  /** dbo.func_* → built-in compositions; unknown dbo.func → error. */
  private def rewriteFunctions(s: String): String = {
    var out = s
    // func_cas_todatetime(fec, hora): magic day + HHMMSS → timestamp
    // (args may be alias-qualified, e.g. t2.fecultimod)
    val dtRe = "(?i)dbo\\.func_cas_todatetime\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*,\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*\\)".r
    out = dtRe.replaceAllIn(out, m => {
      val (f, h) = (m.group(1), m.group(2))
      val time = s"lpad(cast($h as string), 6, '0')"
      s"to_timestamp(concat(cast(date_add(date'1900-01-01', " +
        s"cast($f as int) - 693596) as string), ' ', " +
        s"concat_ws(':', substring($time,1,2), substring($time,3,2), " +
        s"substring($time,5,2))))"
    })
    // func_cas_todateint(fec): magic day → yyyyMMdd int
    val diRe = "(?i)dbo\\.func_cas_todateint\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*\\)".r
    out = diRe.replaceAllIn(out, m => {
      val f = m.group(1)
      s"cast(date_format(date_add(date'1900-01-01', " +
        s"cast($f as int) - 693596), 'yyyyMMdd') as int)"
    })
    val leftover = "(?i)dbo\\.func_[a-z0-9_]*".r.findFirstIn(out)
    leftover.foreach(fn => sys.error(
      s"untranslated source function '$fn' — extend TsqlTranslator"))
    out
  }

  /** Strip `dbo.` schema prefixes from remaining table references. */
  private def stripSchema(s: String): String =
    s.replaceAll("(?i)\\bdbo\\.", "")

  /** Rewrite top-level `+` chains to concat(...) — in the observed config
    * `+` is always T-SQL string concatenation. Applied recursively inside
    * parenthesized groups via the paren/quote-aware splitter. */
  private def translatePlus(s: String): String = {
    val parts = Parser.splitTopLevel(s, '+')
    if (parts.length <= 1) s
    else parts.map(_.trim).mkString("concat(", ", ", ")")
  }

  /** Translate a full projection list (top-level comma split first so `+`
    * rewriting stays within each select item). */
  def translateProjection(columns: String): Seq[String] =
    Parser.splitTopLevel(columns).map(translate)
}
