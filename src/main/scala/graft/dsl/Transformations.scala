package graft.dsl

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.magic.Magic

/** Compilation context for one column expression.
  *
  * @param inputCols  column names available on the source DataFrame — a bare
  *                   token resolves to `col` iff it names one of these, else
  *                   to a literal (reference light_transform.py:746-748)
  * @param targetType the configured NEW_DATA_TYPE, used by typed-null defaults
  *                   and Numeric casts
  * @param now        injectable clock for `fn_transform_Datetime()` (audit
  *                   timestamp) so results are reproducible (SURVEY §7.4.6)
  */
final case class DslContext(
    inputCols: Set[String],
    targetType: DataType = StringType,
    now: Option[Timestamp] = None) {
  private val lower = inputCols.map(_.toLowerCase)
  def isColumn(tok: String): Boolean = lower.contains(tok.toLowerCase)
}

/** Compiles parsed DSL expressions to Catalyst `Column`s — built-ins only,
  * no UDFs, so everything stays inside whole-stage codegen (SURVEY §2B).
  *
  * Each `fn_transform_*` mirrors the reference implementation in
  * artifacts/aws-glue/code/stage/light_transform.py (file:line cited per
  * function).
  */
object Transformations {

  /** Parse + compile a raw DSL string. Empty ⇒ identity on `fallbackCol`. */
  def compile(raw: String, ctx: DslContext, fallbackCol: String = ""): Column =
    if (raw.trim.isEmpty) col(fallbackCol)
    else toColumn(Parser.parse(raw), ctx)

  /** Return-type inference for nested invocations
    * (light_transform.py:799-821). */
  def returnType(fn: String, ctx: DslContext): DataType = fn match {
    case "DateMagic" | "Date"                   => DateType
    case "DatetimeMagic" | "Datetime"           => TimestampType
    case "Integer"                              => IntegerType
    case "Double"                               => DoubleType
    case "Boolean"                              => BooleanType
    case "Numeric"                              => ctx.targetType match {
      case d: DecimalType => d
      case _              => DecimalType(18, 2)
    }
    case _ => StringType // ClearString, Concatenate*, Case*, Period, to_String
  }

  def toColumn(e: DslExpr, ctx: DslContext): Column = e match {
    case Token(t)          => tokenColumn(t, ctx)
    case FnCall(name, args)=> fnColumn(name, args, ctx)
  }

  /** Bare token: `$`-prefix ⇒ forced literal; input column name ⇒ col;
    * quoted ⇒ string literal; else literal text
    * (light_transform.py:746-748, 788-794). */
  private def tokenColumn(t: String, ctx: DslContext): Column =
    if (t.startsWith("$")) lit(t.substring(1))
    else if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
             (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      lit(t.substring(1, t.length - 1))
    else if (ctx.isColumn(t)) col(t)
    else lit(t)

  /** Default-argument semantics shared by ClearString/DateMagic/…:
    * `$X` ⇒ literal X, `to_null` ⇒ typed null, column name ⇒ that column,
    * nested fn ⇒ compiled expression (light_transform.py:844-935). */
  private def defaultColumn(arg: Option[DslExpr], ctx: DslContext,
      asType: DataType): Column = arg match {
    case None => lit(null).cast(asType)
    case Some(Token(t)) if t == "to_null" => lit(null).cast(asType)
    case Some(other) => toColumn(other, ctx).cast(asType)
  }

  private def str(c: Column): Column = c.cast(StringType)

  private def fnColumn(name: String, args: List[DslExpr], ctx: DslContext)
      : Column = name match {

    // B1 — trim; NULL/''/'None'/'NULL'/'null' → default or typed null
    // (light_transform.py:844-873)
    case "ClearString" =>
      val c = toColumn(args.head, ctx)
      val t = trim(str(c))
      val dflt = defaultColumn(args.lift(1), ctx, StringType)
      when(c.isNull || t === "" || t.isin("None", "NULL", "null"), dflt)
        .otherwise(t)

    // B2 — pipe-joined key builder; parts trimmed, null→""
    // (light_transform.py:828-842)
    case "Concatenate" =>
      concat_ws("|", args.map(a => coalesce(trim(str(toColumn(a, ctx))), lit(""))): _*)

    // B3 — explicit separator (LAST param) (light_transform.py:937-951)
    case "Concatenate_ws" =>
      val sep = args.last match {
        case Token(t) => t.stripPrefix("$")
        case other    =>
          sys.error(s"Concatenate_ws separator must be a token, got: $other")
      }
      concat_ws(sep,
        args.dropRight(1).map(a => coalesce(trim(str(toColumn(a, ctx))), lit(""))): _*)

    // B4 — magic-or-formatted date (light_transform.py:875-935)
    case "DateMagic" =>
      val c = toColumn(args.head, ctx)
      val fmt = tokenText(args(1))
      val dflt = defaultColumn(args.lift(2), ctx, DateType)
      val t = trim(str(c))
      val parsed = when(Magic.isMagicNumber(c),
          Magic.magicDayToDate(regexp_replace(t, "\\.0$", "")))
        .otherwise(to_date(t, fmt))
      when(c.isNull || t === "", dflt).otherwise(coalesce(parsed, dflt))

    // B5 — magic date + HHMMSS time → timestamp (light_transform.py:980-1080).
    // The reference re-parses `concat(date, ' ', HH:mm:ss)` through the
    // LEGACY (lenient SimpleDateFormat) parser; lenient parsing adds field
    // values arithmetically, so `midnight(date) + hh*3600 + mm*60 + ss`
    // seconds is bit-identical (including hh ≥ 24 rollover) while replacing
    // a per-row string build + SimpleDateFormat parse with integer ops
    // (measured 2x faster over 150k rows).
    case "DatetimeMagic" =>
      val d = toColumn(args.head, ctx)
      val t = toColumn(args(1), ctx)
      val fmt = tokenText(args(2))
      val dflt = defaultColumn(args.lift(3), ctx, TimestampType)
      val dt = trim(str(d))
      val dateExpr = when(Magic.isMagicNumber(d),
          Magic.magicDayToDate(regexp_replace(dt, "\\.0$", "")))
        .otherwise(to_date(dt, fmt))
      val ts = timestamp_seconds(
        dateExpr.cast(TimestampType).cast(LongType) +
          coalesce(Magic.magicTimeToSeconds(t), lit(0L)))
      when(d.isNull || dt === "", dflt).otherwise(coalesce(ts, dflt))

    // B6 — no arg ⇒ ingest-audit timestamp (injectable); else to_timestamp
    // (light_transform.py:974-978)
    case "Datetime" =>
      if (args.isEmpty)
        ctx.now.map(ts => lit(ts)).getOrElse(current_timestamp())
      else to_timestamp(trim(str(toColumn(args.head, ctx))))

    // B7 — plain to_date with default (light_transform.py:1102-1149)
    case "Date" =>
      val c = toColumn(args.head, ctx)
      val fmt = tokenText(args(1))
      val dflt = defaultColumn(args.lift(2), ctx, DateType)
      val t = trim(str(c))
      when(c.isNull || t === "", dflt)
        .otherwise(coalesce(to_date(t, fmt), dflt))

    // B8 — date_format; accepts nested expr input (light_transform.py:1082-1100)
    case "Date_to_String" =>
      date_format(toColumn(args.head, ctx), tokenText(args(1)))

    // B9 — YYYYMM from (month, year); nulls → '190001'
    // (light_transform.py:1151-1178)
    case "PeriodMagic" =>
      Magic.period(toColumn(args.head, ctx), toColumn(args(1), ctx))

    // B10 — FoxPro T/F byte decode (light_transform.py:1180-1213)
    case "ByteMagic" =>
      val c = toColumn(args.head, ctx)
      val t = trim(str(c))
      val dflt = defaultColumn(args.lift(1), ctx, StringType)
      when(t.isin("T", "0x54", "84", "84.0"), lit("T"))
        .when(t.isin("F", "0x46", "70", "70.0"), lit("F"))
        .otherwise(dflt)

    // B11 — value-list → label; unmatched keeps original
    // (light_transform.py:1215-1246)
    case "Case" =>
      val c = toColumn(args.head, ctx)
      val base = trim(str(c))
      val rules = args.tail.map(a => parseRule(tokenText(a)))
      rules.foldLeft(base) { case (acc, (vals, label)) =>
        when(base.isin(vals: _*), lit(label)).otherwise(acc)
      }

    // B12 — as B11 with default; `&`-composite multi-column rules
    // (light_transform.py:1248-1323)
    case "Case_with_default" =>
      val colSpec = tokenText(args.head)
      val cols = colSpec.split("&").map(_.trim).toSeq
        .map(n => trim(str(tokenColumn(n, ctx))))
      val dfltTok = args.last
      val dflt = dfltTok match {
        case Token(t) if t.startsWith("$") => lit(t.substring(1))
        case other => toColumn(other, ctx)
      }
      val rules = args.tail.dropRight(1).map(a => parseRule(tokenText(a)))
      rules.foldLeft(dflt: Column) { case (acc, (vals, label)) =>
        // each value may itself be `a&b` — AND across columns, OR across values
        val cond = vals.map { v =>
          val parts = v.split("&").map(_.trim)
          cols.zip(parts.toSeq).map { case (c, p) => c === lit(p) }
            .reduceLeft(_ && _)
        }.reduceLeft(_ || _)
        when(cond, lit(label)).otherwise(acc)
      }

    // B13 — plain casts (light_transform.py:953-972)
    case "Integer" => toColumn(args.head, ctx).cast(IntegerType)
    case "Double"  => toColumn(args.head, ctx).cast(DoubleType)
    case "Boolean" => toColumn(args.head, ctx).cast(BooleanType)

    // B14 — decimal cast from target type (light_transform.py:967-971,1346-1354)
    case "Numeric" =>
      val t = ctx.targetType match {
        case d: DecimalType => d
        case _              => DecimalType(18, 2)
      }
      toColumn(args.head, ctx).cast(t)

    case other => sys.error(s"unknown DSL function fn_transform_$other")
  }

  /** Parse a Case rule "v1|v2->label" → (values, label). */
  private def parseRule(rule: String): (Seq[String], String) = {
    val idx = rule.indexOf("->")
    require(idx > 0, s"bad case rule '$rule'")
    val vals = rule.substring(0, idx).split("\\|").map(_.trim).toSeq
    (vals, rule.substring(idx + 2).trim)
  }

  private def tokenText(e: DslExpr): String = e match {
    case Token(t) =>
      val s = t.stripPrefix("$")
      if ((s.startsWith("'") && s.endsWith("'")) ||
          (s.startsWith("\"") && s.endsWith("\""))) s.substring(1, s.length - 1)
      else s
    case other => sys.error(s"expected plain token, got $other")
  }
}
