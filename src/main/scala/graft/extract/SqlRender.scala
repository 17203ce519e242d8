package graft.extract

/** Dialect SQL rendering for JDBC pushdown mode (SURVEY A16, A5, A11).
  *
  * When a source is a real JDBC endpoint, the ReadPlan is rendered to source
  * SQL exactly as the reference generates it (query_generator.py:369-397,
  * extract_data.py:1048-1073): per-dialect date literals, implicit JOIN_EXPR
  * text after FROM, OFFSET/FETCH pagination. Spark then runs it via
  * `spark.read.jdbc(predicates...)` so each slice/predicate becomes one
  * parallel partition read — the same operator surface as the local path.
  */
object SqlRender {
  sealed trait Dialect
  case object MsSql extends Dialect
  case object Oracle extends Dialect
  case object MySql extends Dialect

  def parse(bdType: String): Dialect = bdType.trim.toLowerCase match {
    case "mssql" | "sqlserver" => MsSql
    case "oracle"              => Oracle
    case "mysql"               => MySql
    case other => sys.error(s"unknown BD_TYPE '$other'")
  }

  /** Per-DB datetime literal (reference extract_data.py:1048-1073):
    * smalldatetime/datetime via CONVERT on SQL Server, TO_DATE/TO_TIMESTAMP
    * on Oracle, plain quoted literal on MySQL. */
  def dateLiteral(d: Dialect, iso: String, dataType: String = ""): String =
    (d, dataType.trim.toLowerCase) match {
      case (MsSql, "smalldatetime") => s"CONVERT(smalldatetime, '$iso', 120)"
      case (MsSql, "sql_datetime")  => s"CONVERT(DATETIME, '$iso', 102)"
      case (MsSql, _)               => s"CAST('$iso' AS DATETIME2(6))"
      case (Oracle, "date")         => s"TO_DATE('$iso', 'YYYY-MM-DD HH24:MI:SS')"
      case (Oracle, _)              => s"TO_TIMESTAMP('$iso', 'YYYY-MM-DD HH24:MI:SS.FF6')"
      case (MySql, _)               => s"'$iso'"
    }

  /** Render a ReadPlan to one SELECT per partition slice — the shape the
    * reference's parallel executor consumes (one query per thread, A6/A12)
    * and exactly Spark's `jdbc(url, table, predicates, props)` contract. */
  def renderSlices(plan: ReadPlan, table: String, joinExpr: String,
      slices: Seq[Slice]): Seq[String] = {
    val base = renderSingle(plan, table, joinExpr)
    plan.partitionColumn match {
      case Some(pc) if slices.nonEmpty =>
        slices.map(s => s"$base${whereWord(plan)}$pc >= ${s.lo} AND $pc < ${s.hi}")
      case _ => Seq(base)
    }
  }

  private def whereWord(plan: ReadPlan): String =
    if (plan.filters.isEmpty) " WHERE " else " AND "

  def renderSingle(plan: ReadPlan, table: String, joinExpr: String): String = {
    val proj = if (plan.projection.isEmpty) "*" else plan.projection.mkString(", ")
    val from = if (joinExpr.trim.isEmpty) table else s"$table $joinExpr"
    val where = if (plan.filters.isEmpty) ""
      else " WHERE " + plan.filters.map(f => s"($f)").mkString(" AND ")
    s"SELECT $proj FROM $from$where"
  }

  /** Keyset pagination page (A11): ORDER BY … OFFSET … FETCH NEXT (SQL
    * Server / Oracle 12c syntax; LIMIT/OFFSET on MySQL). */
  def paginate(d: Dialect, sql: String, orderCol: String, offset: Long,
      fetch: Long): String = d match {
    case MySql => s"$sql ORDER BY $orderCol LIMIT $fetch OFFSET $offset"
    case _ =>
      s"$sql ORDER BY $orderCol OFFSET $offset ROWS FETCH NEXT $fetch ROWS ONLY"
  }
}

/** Column-name utilities from the extraction plane. */
object Columns {

  /** A3 — recover output column names from a SELECT list (for empty-result
    * schema synthesis, reference extract_data.py:489-669): explicit AS alias,
    * implicit trailing alias, `table.column`, else a positional fallback. */
  def outputNames(projection: Seq[String]): Seq[String] =
    projection.zipWithIndex.map { case (raw, i) =>
      val e = raw.trim
      val asMatch = "(?i)\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
        .findFirstMatchIn(e)
      asMatch.map(_.group(1)).getOrElse {
        // implicit alias: last bare identifier after a space, if the prefix
        // is an expression or qualified name
        val parts = graft.dsl.Parser.splitTopLevel(e, ' ')
        if (parts.size > 1 && parts.last.matches("[A-Za-z_][A-Za-z0-9_]*"))
          parts.last
        else if (e.matches("[A-Za-z_][A-Za-z0-9_.]*"))
          e.split("\\.").last
        else s"col_$i" // expression with no alias
      }
    }

  /** A17 — duplicate result columns get _1, _2… suffixes (reference
    * extract_data.py:430-463). */
  def dedupeNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map[String, Int]()
    names.map { n =>
      val k = n.toLowerCase
      seen.get(k) match {
        case None    => seen(k) = 0; n
        case Some(c) => seen(k) = c + 1; s"${n}_${c + 1}"
      }
    }
  }
}
