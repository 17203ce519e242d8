package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Config catalog parsing (SURVEY C13, FIXTURES A1): `;`-delimited rows,
  * quote sanitization, flag/type decoding. */
class ConfigSpec extends AnyFunSuite {

  private val tablesCsv =
    """COLUMNS;LOAD_TYPE;PARTITION_MODE;PARTITION_COLUMN;DELAY_INCREMENTAL_INI;DELAY_INCREMENTAL_END;FILTER_COLUMN;FILTER_DATA_TYPE;FILTER_EXP;ID_COLUMN;JOIN_EXPR;PROCESS_ID;SOURCE_SCHEMA;SOURCE_TABLE;SOURCE_TABLE_TYPE;STAGE_TABLE_NAME;STATUS;JOB_EXTRACT_MAX_CAPACITY
      |compania, codocas, "fecmodi";full;auto;;-2;0;;;compania in (select compania from mcompa1f);compania;;G1;dbo;trelcons1f;m;i_relacion_consumo;a;2
      |feccompvta;time_range;min_max;feccompvta;-2;0;feccompvta between {0} and {1};aje_processperiod;;;;G2;dbo;tcovta1f;t;t_documento_venta;a;4"""
      .stripMargin

  private val columnsCsv =
    """COLUMN_NAME;COLUMN_ID;IS_FILTER_DATE;IS_ID;IS_ORDER_BY;IS_PARTITION;NEW_DATA_TYPE;TABLE_NAME;TRANSFORMATION
      |processdate;1;F;F;F;F;timestamp;i_relacion_consumo;fn_transform_Datetime()
      |id_relacion_consumo;2;F;T;T;F;string;i_relacion_consumo;fn_transform_ClearString(id)
      |lastmodifydate;3;T;F;F;F;timestamp;i_relacion_consumo;fn_transform_Datetime(lastmodifydate)
      |monto;4;F;F;F;F;numeric(13,2);i_relacion_consumo;fn_transform_Numeric(monto)
      |otra;1;F;F;F;F;string;otra_tabla;""".stripMargin

  test("tables.csv rows parse with quote sanitization and load-type rules") {
    val rows = CsvConfigLoader.parse(tablesCsv).map(CsvConfigLoader.tableConfig)
    assert(rows.size == 2)
    val m = rows.head
    assert(m.columns == "compania, codocas, fecmodi") // quotes stripped
    assert(m.loadType == LoadType.Full)
    assert(m.filterExp == "compania in (select compania from mcompa1f)")
    val t = rows(1)
    assert(t.loadType == LoadType.TimeRange)
    assert(t.delayIncrementalIni == -2 && t.delayIncrementalEnd == 0)
    assert(t.filterColumn == "feccompvta between {0} and {1}")
    assert(t.filterDataType == "aje_processperiod")
  }

  test("empty LOAD_TYPE derives from SOURCE_TABLE_TYPE (m->full, t->incr)") {
    assert(LoadType.parse("", "m") == LoadType.Full)
    assert(LoadType.parse("", "t") == LoadType.Incremental)
  }

  test("columns.csv filters by table, sorts by COLUMN_ID, decodes flags") {
    val tmp = java.nio.file.Files.createTempFile("cols", ".csv")
    java.nio.file.Files.writeString(tmp, columnsCsv)
    val cols = CsvConfigLoader.loadColumns(tmp.toString, "I_RELACION_CONSUMO")
    assert(cols.map(_.columnName) ==
      Seq("processdate", "id_relacion_consumo", "lastmodifydate", "monto"))
    assert(cols(1).isId && cols(1).isOrderBy && !cols(1).isFilterDate)
    assert(cols(2).isFilterDate)
    assert(cols(3).sparkType == DecimalType(13, 2))
  }

  test("credentials.csv endpoint rows parse") {
    val csv =
      """ENDPOINT_NAME;BD_TYPE;DB_PORT_NUMBER;IS_PRINCIPAL;SRC_DB_NAME;COUNTRIES;SRC_DB_SECRET;SRC_DB_USERNAME;SRC_SERVER_NAME;INSTANCE;ENV
        |EP1;mssql;1433;T;erp;PE;sec;svc;db01;I1;prod""".stripMargin
    val eps = CsvConfigLoader.parse(csv).map(CsvConfigLoader.endpointConfig)
    assert(eps == Seq(EndpointConfig("EP1", "mssql", 1433, "erp", "db01",
      "svc", srcDbSecret = "sec")),
      "SRC_DB_SECRET carries the secret's NAME into the endpoint row")
  }

  test("type mapping covers the reference NEW_DATA_TYPE surface") {
    assert(SparkTypes.fromConfig("string") == StringType)
    assert(SparkTypes.fromConfig("int") == IntegerType)
    assert(SparkTypes.fromConfig("Integer") == IntegerType)
    assert(SparkTypes.fromConfig("double") == DoubleType)
    assert(SparkTypes.fromConfig("float") == DoubleType)
    assert(SparkTypes.fromConfig("boolean") == BooleanType)
    assert(SparkTypes.fromConfig("timestamp") == TimestampType)
    assert(SparkTypes.fromConfig("date") == DateType)
    assert(SparkTypes.fromConfig("numeric(13,2)") == DecimalType(13, 2))
    assert(SparkTypes.fromConfig("numeric") == DecimalType(18, 2))
  }
}
