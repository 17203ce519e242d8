package graft.config

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Loader for the `;`-delimited latin-1 config catalog CSVs (tables.csv /
  * columns.csv / credentials.csv). Reference: extract_data.py:99-207,
  * light_transform.py:579-617 (incl. stray-quote sanitization at :605-617).
  *
  * Config catalogs are tiny (≤ a few thousand rows) so this is plain-Scala
  * driver-side parsing — they parameterize the Spark jobs, they are not data.
  */
object CsvConfigLoader {

  /** Strip stray double quotes (SQL Server identifier-bug workaround,
    * reference extract_data.py:817-892 / orchestrator.py:339-355). */
  def sanitize(s: String): String = s.replace("\"", "").trim

  /** Parse a `;`-delimited CSV (no embedded separators in the reference's
    * config format) into rows of header→value maps. */
  def parse(text: String): Seq[Map[String, String]] = {
    val lines = text.split("\r?\n").toSeq.filter(_.trim.nonEmpty)
    if (lines.isEmpty) return Seq.empty
    val header = lines.head.split(";", -1).map(sanitize)
    lines.tail.map { line =>
      val cells = line.split(";", -1).map(_.trim)
      header.zipAll(cells, "", "").toMap
    }
  }

  def parseFile(path: String, charset: Charset = Charset.forName("ISO-8859-1"))
      : Seq[Map[String, String]] =
    parse(new String(Files.readAllBytes(Paths.get(path)), charset))

  private def flag(s: String): Boolean = s.trim.equalsIgnoreCase("t")
  private def int(s: String, dflt: Int = 0): Int =
    scala.util.Try(s.trim.toDouble.toInt).getOrElse(dflt)

  def tableConfig(row: Map[String, String]): TableConfig = TableConfig(
    columns = sanitize(row.getOrElse("COLUMNS", "")),
    loadType = LoadType.parse(row.getOrElse("LOAD_TYPE", ""),
      row.getOrElse("SOURCE_TABLE_TYPE", "")),
    partitionMode = row.getOrElse("PARTITION_MODE", "").trim,
    partitionColumn = row.getOrElse("PARTITION_COLUMN", "").trim,
    delayIncrementalIni = int(row.getOrElse("DELAY_INCREMENTAL_INI", "")),
    delayIncrementalEnd = int(row.getOrElse("DELAY_INCREMENTAL_END", "")),
    filterColumn = sanitize(row.getOrElse("FILTER_COLUMN", "")),
    filterDataType = row.getOrElse("FILTER_DATA_TYPE", "").trim,
    filterExp = sanitize(row.getOrElse("FILTER_EXP", "")),
    idColumn = sanitize(row.getOrElse("ID_COLUMN", "")),
    joinExpr = sanitize(row.getOrElse("JOIN_EXPR", "")),
    processId = row.getOrElse("PROCESS_ID", "").trim,
    sourceSchema = row.getOrElse("SOURCE_SCHEMA", "").trim,
    sourceTable = row.getOrElse("SOURCE_TABLE", "").trim,
    sourceTableType = row.getOrElse("SOURCE_TABLE_TYPE", "").trim,
    stageTableName = row.getOrElse("STAGE_TABLE_NAME", "").trim,
    status = row.getOrElse("STATUS", "").trim,
    jobExtractMaxCapacity = row.getOrElse("JOB_EXTRACT_MAX_CAPACITY", "").trim)

  def columnMetadata(row: Map[String, String]): ColumnMetadata = ColumnMetadata(
    columnName = row.getOrElse("COLUMN_NAME", "").trim,
    columnId = int(row.getOrElse("COLUMN_ID", "0")),
    isFilterDate = flag(row.getOrElse("IS_FILTER_DATE", "F")),
    isId = flag(row.getOrElse("IS_ID", "F")),
    isOrderBy = flag(row.getOrElse("IS_ORDER_BY", "F")),
    isPartition = flag(row.getOrElse("IS_PARTITION", "F")),
    newDataType = row.getOrElse("NEW_DATA_TYPE", "string").trim,
    tableName = row.getOrElse("TABLE_NAME", "").trim,
    transformation = sanitize(row.getOrElse("TRANSFORMATION", "")))

  def endpointConfig(row: Map[String, String]): EndpointConfig =
    EndpointConfig(
      endpointName = row.getOrElse("ENDPOINT_NAME", "").trim,
      bdType = row.getOrElse("BD_TYPE", "").trim,
      dbPort = int(row.getOrElse("DB_PORT_NUMBER", "0")),
      srcDbName = row.getOrElse("SRC_DB_NAME", "").trim,
      srcServerName = row.getOrElse("SRC_SERVER_NAME", "").trim,
      srcDbUsername = row.getOrElse("SRC_DB_USERNAME", "").trim,
      srcDbSecret = row.getOrElse("SRC_DB_SECRET", "").trim)

  def loadTables(path: String): Seq[TableConfig] =
    parseFile(path).map(tableConfig)

  def loadEndpoints(path: String): Seq[EndpointConfig] =
    parseFile(path).map(endpointConfig)

  def loadColumns(path: String, tableName: String): Seq[ColumnMetadata] =
    parseFile(path).map(columnMetadata)
      .filter(_.tableName.equalsIgnoreCase(tableName))
      .sortBy(_.columnId)
}
