package graft.sources.mock

import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSet,
  ResultSetMetaData, SQLException, SQLFeatureNotSupportedException,
  SQLSyntaxErrorException, Statement, Types}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.util.Properties
import java.util.logging.Logger

import scala.collection.concurrent.TrieMap

/** Emulated dialect JDBC endpoints (SURVEY A16 execution evidence).
  *
  * The reference's primary deployment target is SQL Server, with Oracle
  * and MySQL variants selected by BD_TYPE (`extract_data.py:267-277`);
  * embedded Derby can execute the ANSI subset live but cannot witness the
  * dialect-SPECIFIC text ([[graft.extract.SqlRender]]'s CONVERT /
  * TO_DATE / LIMIT-vs-OFFSET-FETCH forms). This mock is a deterministic
  * fake of each endpoint's grammar: an in-process `java.sql.Driver`
  * (`jdbc:graftmock:<dialect>:<endpoint>`) serving in-memory tables
  * through a mini-interpreter that
  *
  *  - ACCEPTS exactly the constructs its dialect would (CONVERT/CAST
  *    DATETIME2 + OFFSET-FETCH on mssql, TO_DATE/TO_TIMESTAMP +
  *    OFFSET-FETCH on oracle, quoted literals + LIMIT/OFFSET on mysql),
  *  - REJECTS the other dialects' forms with SQLSyntaxErrorException —
  *    so a gate passing against `jdbc:graftmock:oracle:…` is live
  *    evidence the renderer emitted Oracle grammar, not merely ANSI that
  *    happens to run everywhere;
  *  - speaks enough real JDBC (prepareStatement → executeQuery →
  *    ResultSet + metadata) that Spark's own JDBC relation does the
  *    reading — schema inference via the `WHERE 1=0` probe, column-pruned
  *    partition reads — i.e. the exact code path a production endpoint
  *    would exercise.
  *
  * JDBC surface objects are reflection proxies: the handful of methods
  * Spark's reader calls are implemented, everything else defaults by
  * return type — small, and robust to reader-version drift.
  */
object MockDb {

  final case class Col(name: String, sqlType: Int)
  final case class Table(cols: Seq[Col], rows: Seq[Array[Any]])

  private val tables = TrieMap.empty[(String, String), Table]

  /** Register (replace) a table on an endpoint. Values must be
    * Long/Double/String/null matching `sqlType` BIGINT/DOUBLE/VARCHAR. */
  def register(endpoint: String, name: String, cols: Seq[Col],
      rows: Seq[Array[Any]]): Unit =
    tables((endpoint, name.toLowerCase)) = Table(cols, rows)

  def lookup(endpoint: String, name: String): Table =
    tables.getOrElse((endpoint, name.toLowerCase),
      throw new SQLException(s"mock endpoint '$endpoint': unknown table $name"))

  // ---------------------------------------------------------------- grammar

  /** Constructs each dialect must NOT see (uppercase scan). A real
    * endpoint's parser is the enforcement; this list is its stand-in. */
  private val forbidden: Map[String, Seq[String]] = Map(
    "mssql" -> Seq("TO_DATE(", "TO_TIMESTAMP(", " LIMIT "),
    "oracle" -> Seq("CONVERT(", "DATETIME2", " LIMIT ", "SMALLDATETIME"),
    "mysql" -> Seq("CONVERT(", "TO_DATE(", "TO_TIMESTAMP(", "FETCH NEXT",
      "DATETIME2", "SMALLDATETIME"))

  /** Dialect date/datetime literal forms → the ISO payload, for compare. */
  private val litForms = Seq(
    "(?i)CONVERT\\s*\\(\\s*smalldatetime\\s*,\\s*'([^']*)'\\s*,\\s*120\\s*\\)".r,
    "(?i)CONVERT\\s*\\(\\s*DATETIME\\s*,\\s*'([^']*)'\\s*,\\s*102\\s*\\)".r,
    "(?i)CAST\\s*\\(\\s*'([^']*)'\\s+AS\\s+DATETIME2\\s*\\(\\s*\\d+\\s*\\)\\s*\\)".r,
    "(?i)TO_DATE\\s*\\(\\s*'([^']*)'\\s*,\\s*'[^']*'\\s*\\)".r,
    "(?i)TO_TIMESTAMP\\s*\\(\\s*'([^']*)'\\s*,\\s*'[^']*'\\s*\\)".r)

  /** Evaluate one SELECT against an endpoint. Returns (columns, rows). */
  def query(dialect: String, endpoint: String, sql: String)
      : (Seq[Col], Seq[Array[Any]]) = {
    val up = " " + sql.toUpperCase.replaceAll("\\s+", " ") + " "
    forbidden.getOrElse(dialect, Nil).foreach { tok =>
      if (up.contains(tok.toUpperCase))
        throw new SQLSyntaxErrorException(
          s"$dialect endpoint: syntax not in this dialect: $tok")
    }
    evalSelect(dialect, endpoint, sql.trim.stripSuffix(";").trim)
  }

  private def evalSelect(dialect: String, endpoint: String, sql: String)
      : (Seq[Col], Seq[Array[Any]]) = {
    val m = "(?is)^SELECT\\s+(.*?)\\s+FROM\\s+(.*)$".r.findFirstMatchIn(sql)
      .getOrElse(throw new SQLSyntaxErrorException(s"not a SELECT: $sql"))
    val projText = m.group(1).trim
    val rest = m.group(2).trim

    // FROM target: subquery `( … ) alias` (evaluated recursively — Spark
    // wraps the dbtable query this way, twice for the schema probe) or a
    // bare table name.
    val (cols0, rows0, tail) =
      if (rest.startsWith("(")) {
        val close = matchParen(rest, 0)
        val (c, r) = evalSelect(dialect, endpoint,
          rest.substring(1, close).trim)
        var t = rest.substring(close + 1).trim
        // optional alias
        val am = "(?is)^([A-Za-z_][A-Za-z0-9_]*)\\b(.*)$".r.findFirstMatchIn(t)
        am.filterNot(x => keyword(x.group(1))).foreach(x => t = x.group(2).trim)
        (c, r, t)
      } else {
        val tm = "(?is)^([A-Za-z_][A-Za-z0-9_.]*)\\b(.*)$".r
          .findFirstMatchIn(rest).getOrElse(
            throw new SQLSyntaxErrorException(s"bad FROM: $rest"))
        val t = lookup(endpoint, tm.group(1).split("\\.").last)
        (t.cols, t.rows, tm.group(2).trim)
      }

    // clause split: [WHERE …] [ORDER BY …] [pagination]
    var whereText = ""
    var orderText = ""
    var pageText = tail
    // cut at the EARLIEST following clause keyword, not a fixed priority —
    // MySQL's `… LIMIT f OFFSET o` puts LIMIT before OFFSET
    def earliest(body: String, words: String*): Option[Int] =
      words.flatMap(w => indexOfTopLevel(body, w)) match {
        case s if s.isEmpty => None
        case s => Some(s.min)
      }
    val wm = "(?is)^WHERE\\s+(.*)$".r.findFirstMatchIn(pageText)
    wm.foreach { x =>
      val body = x.group(1)
      val cut = earliest(body, "ORDER BY", "OFFSET ", "LIMIT ")
      whereText = cut.map(i => body.substring(0, i)).getOrElse(body).trim
      pageText = cut.map(i => body.substring(i)).getOrElse("").trim
    }
    val om = "(?is)^ORDER\\s+BY\\s+(.*)$".r.findFirstMatchIn(pageText)
    om.foreach { x =>
      val body = x.group(1)
      val cut = earliest(body, "OFFSET ", "LIMIT ")
      orderText = cut.map(i => body.substring(0, i)).getOrElse(body).trim
      pageText = cut.map(i => body.substring(i)).getOrElse("").trim
    }

    def colIdx(name: String): Int = {
      val n = unquote(name)
      val i = cols0.indexWhere(_.name.equalsIgnoreCase(n))
      if (i < 0) throw new SQLException(
        s"unknown column $n of ${cols0.map(_.name)}")
      i
    }

    // WHERE: top-level AND of binary comparisons
    var rows = rows0
    if (whereText.nonEmpty)
      splitTopLevelAnd(whereText).foreach { predRaw =>
        val pred = stripParens(predRaw.trim)
        val pm = "(?is)^(.+?)\\s*(>=|<=|<>|!=|=|>|<)\\s*(.+)$".r
          .findFirstMatchIn(pred).getOrElse(
            throw new SQLSyntaxErrorException(s"bad predicate: $pred"))
        val (l, op, r) = (pm.group(1).trim, pm.group(2), pm.group(3).trim)
        def side(s: String): Either[Int, Any] = literal(s) match {
          case Some(v) => Right(v)
          case None => Left(colIdx(s))
        }
        val (ls, rs) = (side(l), side(r))
        rows = rows.filter { row =>
          val lv = ls.fold(row(_), identity)
          val rv = rs.fold(row(_), identity)
          compare(lv, rv).exists { c =>
            op match {
              case ">=" => c >= 0
              case "<=" => c <= 0
              case ">" => c > 0
              case "<" => c < 0
              case "=" => c == 0
              case "<>" | "!=" => c != 0
            }
          }
        }
      }

    // ORDER BY (stable)
    if (orderText.nonEmpty) {
      val keys = orderText.split(",").map(_.trim).map { k =>
        val desc = k.toUpperCase.endsWith(" DESC")
        val name = k.replaceAll("(?i)\\s+(ASC|DESC)$", "")
        (colIdx(name), desc)
      }
      val ord = new Ordering[Array[Any]] {
        def compare(a: Array[Any], b: Array[Any]): Int = {
          keys.foreach { case (i, desc) =>
            val c = MockDb.compare(a(i), b(i)).getOrElse(0)
            if (c != 0) return if (desc) -c else c
          }
          0
        }
      }
      rows = rows.sortWith((a, b) => ord.compare(a, b) < 0)
    }

    // pagination — per-dialect form
    if (pageText.nonEmpty) {
      val off = "(?is)^OFFSET\\s+(\\d+)\\s+ROWS\\s+FETCH\\s+NEXT\\s+(\\d+)\\s+ROWS\\s+ONLY$".r
      val lim = "(?is)^LIMIT\\s+(\\d+)(?:\\s+OFFSET\\s+(\\d+))?$".r
      pageText.trim match {
        case off(o, f) =>
          if (dialect == "mysql") throw new SQLSyntaxErrorException(
            "mysql endpoint: OFFSET…FETCH is not MySQL grammar")
          rows = rows.slice(o.toInt, o.toInt + f.toInt)
        case lim(f, o) =>
          val o1 = Option(o).map(_.toInt).getOrElse(0)
          rows = rows.slice(o1, o1 + f.toInt)
        case other =>
          throw new SQLSyntaxErrorException(s"bad pagination: $other")
      }
    }

    // projection: `*` or comma list of [quoted] columns / literals with
    // optional AS — Spark's count() over a JDBC relation prunes to the
    // constant list `SELECT 1 FROM …`, so literals must evaluate
    if (projText == "*") (cols0, rows)
    else {
      def litType(v: Any): Int = v match {
        case _: Long => Types.BIGINT
        case _: Double => Types.DOUBLE
        case _ => Types.VARCHAR
      }
      val picks: Seq[(Either[Int, Any], Col)] =
        graft.dsl.Parser.splitTopLevel(projText, ',').map(_.trim).map { p =>
          val am = "(?is)^(.+?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
            .findFirstMatchIn(p)
          val (exprText, alias) = am match {
            case Some(x) => (x.group(1).trim, Some(x.group(2)))
            case None => (p, None)
          }
          literal(exprText) match {
            case Some(v) =>
              (Right(v), Col(alias.getOrElse(exprText), litType(v)))
            case None =>
              val i = colIdx(exprText)
              (Left(i), Col(alias.getOrElse(cols0(i).name), cols0(i).sqlType))
          }
        }
      (picks.map(_._2),
        rows.map(r => picks.map(_._1.fold(r(_), identity)).toArray))
    }
  }

  // ------------------------------------------------------------- text utils

  private def keyword(s: String): Boolean =
    Set("WHERE", "ORDER", "LIMIT", "OFFSET", "GROUP").contains(s.toUpperCase)

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("\"") && t.endsWith("\"")) ||
        (t.startsWith("`") && t.endsWith("`")) ||
        (t.startsWith("[") && t.endsWith("]")))
      t.substring(1, t.length - 1)
    else t
  }

  private def stripParens(s: String): String = {
    var t = s.trim
    while (t.startsWith("(") && matchParen(t, 0) == t.length - 1)
      t = t.substring(1, t.length - 1).trim
    t
  }

  /** Index of the char closing the paren opened at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var inQ = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new SQLSyntaxErrorException(s"unbalanced parens: $s")
  }

  /** First index of `word` at paren-and-quote top level (caseless). */
  private def indexOfTopLevel(s: String, word: String): Option[Int] = {
    val up = s.toUpperCase
    val w = word.toUpperCase
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith(w, i)) return Some(i)
      }
      i += 1
    }
    None
  }

  private def splitTopLevelAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    var depth = 0
    var inQ = false
    val up = s.toUpperCase
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith(" AND ", i)) {
            out += s.substring(start, i)
            start = i + 5
            i += 4
          }
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Literal operand: number, quoted string, or a dialect date form. */
  private def literal(s: String): Option[Any] = {
    val t = s.trim
    litForms.foreach { re =>
      re.findFirstMatchIn(t).filter(_.matched.length == t.length)
        .foreach(m => return Some(m.group(1)))
    }
    if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
      Some(t.substring(1, t.length - 1).replace("''", "'"))
    else if (t.matches("[-+]?\\d+")) Some(t.toLong)
    else if (t.matches("[-+]?\\d*\\.\\d+([eE][-+]?\\d+)?")) Some(t.toDouble)
    else None
  }

  /** NULL-safe three-way compare; None when either side is NULL (SQL:
    * comparisons with NULL are not true). Date strings compare
    * lexicographically — ISO text sorts chronologically, and 'YYYY-MM-DD'
    * vs 'YYYY-MM-DD HH:MM:SS' prefix-compares the way the endpoints'
    * date-vs-datetime promotion does for these gates' day-aligned data. */
  private[mock] def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x, y) => Some(x.toString.compareTo(y.toString))
  }
}

/** Minimal real `java.sql.Driver` for `jdbc:graftmock:<dialect>:<endpoint>`.
  * Registered with DriverManager on class load, like any JDBC driver. */
final class MockDbDriver extends Driver {
  import MockDbDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val parts = url.stripPrefix(Prefix).split(":", 2)
    require(parts.length == 2, s"url must be $Prefix<dialect>:<endpoint>")
    connection(parts(0), parts(1))
  }

  override def getPropertyInfo(url: String, info: Properties)
      : Array[DriverPropertyInfo] = Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new SQLFeatureNotSupportedException()
}

object MockDbDriver {
  val Prefix = "jdbc:graftmock:"
  val DriverClass = "graft.sources.mock.MockDbDriver"

  java.sql.DriverManager.registerDriver(new MockDbDriver)

  /** Reflection proxy implementing `iface`: `handler` for the methods the
    * Spark reader uses, return-type defaults for the rest. */
  private def proxy[T](iface: Class[T])(
      handler: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef])
            : AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          handler.applyOrElse[(String, Array[AnyRef]), AnyRef](
            (m.getName, a), _ => defaultReturn(m, p, a))
        }
      }).asInstanceOf[T]

  private def defaultReturn(m: Method, self: AnyRef, args: Array[AnyRef])
      : AnyRef = m.getName match {
    case "hashCode" => Integer.valueOf(System.identityHashCode(self))
    case "equals" => java.lang.Boolean.valueOf(args.headOption.exists(_ eq self))
    case "toString" => s"MockJdbc(${m.getDeclaringClass.getSimpleName})"
    case _ => m.getReturnType match {
      case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
      case java.lang.Integer.TYPE => Integer.valueOf(0)
      case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
      case java.lang.Short.TYPE => java.lang.Short.valueOf(0.toShort)
      case java.lang.Byte.TYPE => java.lang.Byte.valueOf(0.toByte)
      case java.lang.Double.TYPE => java.lang.Double.valueOf(0d)
      case java.lang.Float.TYPE => java.lang.Float.valueOf(0f)
      case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
      case _ => null // void and object returns
    }
  }

  private def connection(dialect: String, endpoint: String): Connection =
    proxy(classOf[Connection]) {
      case ("prepareStatement", args) if args.nonEmpty =>
        statement(dialect, endpoint, args(0).asInstanceOf[String])
      case ("createStatement", _) => statement(dialect, endpoint, null)
      case ("isValid", _) => java.lang.Boolean.TRUE
      case ("getAutoCommit", _) => java.lang.Boolean.TRUE
      case ("getMetaData", _) => dbMeta(dialect, endpoint)
    }

  private def dbMeta(dialect: String, endpoint: String)
      : java.sql.DatabaseMetaData =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getURL", _) => s"$Prefix$dialect:$endpoint"
      case ("getDatabaseProductName", _) => s"graftmock-$dialect"
      case ("getDriverName", _) => DriverClass
      case ("supportsTransactions", _) => java.lang.Boolean.FALSE
    }

  private def statement(dialect: String, endpoint: String, fixedSql: String)
      : Statement =
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", args) =>
        val sql = if (args.nonEmpty) args(0).asInstanceOf[String] else fixedSql
        val (cols, rows) = MockDb.query(dialect, endpoint, sql)
        resultSet(cols, rows)
      case ("execute", args) =>
        val sql = if (args.nonEmpty) args(0).asInstanceOf[String] else fixedSql
        MockDb.query(dialect, endpoint, sql)
        java.lang.Boolean.TRUE
    }

  private def resultSet(cols: Seq[MockDb.Col], rows: Seq[Array[Any]])
      : ResultSet = {
    var pos = -1
    var lastNull = false
    def cell(i: Int): Any = {
      val v = rows(pos)(i - 1)
      lastNull = v == null
      v
    }
    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        pos += 1
        java.lang.Boolean.valueOf(pos < rows.length)
      case ("getMetaData", _) => rsMeta(cols)
      case ("wasNull", _) => java.lang.Boolean.valueOf(lastNull)
      case ("getObject", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null => null
        case v => v.asInstanceOf[AnyRef]
      }
      case ("getLong", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null => java.lang.Long.valueOf(0L)
        case v: Number => java.lang.Long.valueOf(v.longValue())
        case v => java.lang.Long.valueOf(v.toString.toLong)
      }
      case ("getInt", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null => Integer.valueOf(0)
        case v: Number => Integer.valueOf(v.intValue())
        case v => Integer.valueOf(v.toString.toInt)
      }
      case ("getDouble", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null => java.lang.Double.valueOf(0d)
        case v: Number => java.lang.Double.valueOf(v.doubleValue())
        case v => java.lang.Double.valueOf(v.toString.toDouble)
      }
      case ("getString", args) => cell(args(0).asInstanceOf[Integer]) match {
        case null => null
        case v => v.toString
      }
      case ("getBigDecimal", args) =>
        cell(args(0).asInstanceOf[Integer]) match {
          case null => null
          case v => new java.math.BigDecimal(v.toString)
        }
      case ("isClosed", _) => java.lang.Boolean.FALSE
    }
  }

  private def rsMeta(cols: Seq[MockDb.Col]): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(cols.length)
      case ("getColumnName", args) =>
        cols(args(0).asInstanceOf[Integer] - 1).name
      case ("getColumnLabel", args) =>
        cols(args(0).asInstanceOf[Integer] - 1).name
      case ("getColumnType", args) =>
        Integer.valueOf(cols(args(0).asInstanceOf[Integer] - 1).sqlType)
      case ("getColumnTypeName", args) =>
        cols(args(0).asInstanceOf[Integer] - 1).sqlType match {
          case Types.BIGINT => "BIGINT"
          case Types.DOUBLE => "DOUBLE"
          case _ => "VARCHAR"
        }
      case ("getPrecision", args) =>
        Integer.valueOf(cols(args(0).asInstanceOf[Integer] - 1).sqlType match {
          case Types.BIGINT => 19
          case Types.DOUBLE => 15
          case _ => 255
        })
      case ("getScale", _) => Integer.valueOf(0)
      case ("isSigned", _) => java.lang.Boolean.TRUE
      case ("isNullable", _) =>
        Integer.valueOf(ResultSetMetaData.columnNullable)
    }
}
