package graft.config

import org.apache.spark.sql.types._

/** Load types the reference supports (tables.csv LOAD_TYPE; empty string is
  * auto-derived from SOURCE_TABLE_TYPE — reference extract_data.py:176-193). */
sealed trait LoadType
object LoadType {
  case object Full extends LoadType
  case object Incremental extends LoadType
  case object TimeRange extends LoadType
  case object BetweenDate extends LoadType
  def parse(s: String, sourceTableType: String): LoadType =
    s.trim.toLowerCase match {
      case "full"         => Full
      case "incremental"  => Incremental
      case "time_range"   => TimeRange
      case "between-date" | "between_date" => BetweenDate
      // legacy auto-derivation: master ⇒ full, transactional ⇒ incremental
      case "" => if (sourceTableType.trim.toLowerCase == "t") Incremental else Full
      case other => sys.error(s"unknown LOAD_TYPE '$other'")
    }
}

/** Run modes for the load-mode state machine (reference
  * utils/extract_data_v2/models/load_mode.py:4-28). */
sealed trait LoadMode
object LoadMode {
  case object Initial   extends LoadMode // full + save watermark
  case object Normal    extends LoadMode // incremental from watermark
  case object Reset     extends LoadMode // delete watermark + full + save
  case object Reprocess extends LoadMode // re-run a past window
  def parse(s: String): LoadMode = s.trim.toLowerCase match {
    case "initial" => Initial
    case "normal" | "" => Normal
    case "reset" => Reset
    case "reprocess" => Reprocess
    case other => sys.error(s"unknown load mode '$other'")
  }
}

/** One configured table — a tables.csv row (reference
  * utils/extract_data_v2/models/table_config.py:6-30). */
final case class TableConfig(
    columns: String,            // projection list (may contain expressions)
    loadType: LoadType,
    partitionMode: String,      // '', auto, min_max, none
    partitionColumn: String,
    delayIncrementalIni: Int,   // months, negative = back from now
    delayIncrementalEnd: Int,
    filterColumn: String,       // template with {0}/{1} placeholders
    filterDataType: String,     // aje_period | aje_date | aje_processperiod | ''
    filterExp: String,          // free-text WHERE conjunct
    idColumn: String,
    joinExpr: String,
    processId: String,
    sourceSchema: String,
    sourceTable: String,
    sourceTableType: String,    // m | t
    stageTableName: String,
    status: String,             // a = active
    jobExtractMaxCapacity: String)

/** One configured output column — a columns.csv row (reference
  * light_transform.py:524-534). */
final case class ColumnMetadata(
    columnName: String,
    columnId: Int,
    isFilterDate: Boolean,  // recency column for dedup-latest
    isId: Boolean,          // merge/dedup key
    isOrderBy: Boolean,     // output sort
    isPartition: Boolean,   // stage partition column
    newDataType: String,    // string|int|double|boolean|timestamp|date|numeric(p,s)
    tableName: String,
    transformation: String) { // fn_transform_* DSL expression
  def sparkType: DataType = SparkTypes.fromConfig(newDataType)
}

/** A JDBC endpoint — credentials.csv row. */
final case class EndpointConfig(
    endpointName: String,
    bdType: String, // mssql | oracle | mysql
    dbPort: Int,
    srcDbName: String,
    srcServerName: String,
    srcDbUsername: String,
    // the SECRET'S NAME, never its value (credentials.csv SRC_DB_SECRET
    // — the reference resolves it through Secrets Manager at connect
    // time, extract_data.py:255; graft through a Credentials.Provider)
    srcDbSecret: String = "")

/** NEW_DATA_TYPE string → Spark DataType (reference _get_spark_type,
  * light_transform.py:1328-1354). */
object SparkTypes {
  private val NumericRe = """(?i)numeric\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  def fromConfig(s: String): DataType = s.trim.toLowerCase match {
    case "string" | ""        => StringType
    case "int" | "integer"    => IntegerType
    case "bigint" | "long"    => LongType
    case "double" | "float"   => DoubleType
    case "boolean"            => BooleanType
    case "timestamp"          => TimestampType
    case "date"               => DateType
    case NumericRe(p, sc)     => DecimalType(p.toInt, sc.toInt)
    case t if t.startsWith("numeric") => DecimalType(18, 2) // default p,s
    case other => sys.error(s"unknown NEW_DATA_TYPE '$other'")
  }
}
