package graft.config

import org.scalatest.funsuite.AnyFunSuite
import graft.dsl.{Parser, TsqlTranslator}
import graft.transform.TransformationEngine

/** Completeness replay over the REFERENCE'S OWN shipped configuration
  * (read-only at /root/reference/artifacts/configuration/csv): every active
  * table's projection/id/filter fragment must translate, and every one of
  * the ~1800 column transformations must compile to a Column with zero
  * error-degradation — the "a user of the reference could switch" check.
  */
class ReferenceConfigReplaySpec extends AnyFunSuite {
  private val base = "/root/reference/artifacts/configuration/csv"
  private def available = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$base/tables.csv"))

  test("every tables.csv fragment parses and translates") {
    assume(available)
    val tables = CsvConfigLoader.loadTables(s"$base/tables.csv")
    assert(tables.nonEmpty)
    val active = tables.filter(_.status.equalsIgnoreCase("a"))
    assert(active.size >= 50) // 56 shipped active tables
    active.foreach { t =>
      // projection list: splits cleanly and translates item by item
      if (t.columns.nonEmpty && t.columns != "*") {
        val items = TsqlTranslator.translateProjection(t.columns)
        assert(items.nonEmpty, s"${t.sourceTable}: empty projection")
        assert(items.forall(_.trim.nonEmpty))
      }
      if (t.idColumn.nonEmpty) TsqlTranslator.translate(t.idColumn)
      if (t.filterExp.nonEmpty) {
        val f = TsqlTranslator.translate(t.filterExp)
        assert(!f.contains("dbo."), s"${t.sourceTable}: schema prefix left")
      }
      // load-type parses (incl. derived-from-table-type)
      t.loadType
    }
  }

  test("every credentials.csv endpoint parses; secrets arrive as NAMES " +
    "and resolve through a provider, never from the config row") {
    assume(available)
    val eps = CsvConfigLoader.loadEndpoints(s"$base/credentials.csv")
    assert(eps.nonEmpty)
    eps.foreach { ep =>
      assert(ep.endpointName.nonEmpty && ep.srcServerName.nonEmpty)
      assert(Set("mssql", "oracle", "mysql")
        .contains(ep.bdType.trim.toLowerCase), s"${ep.endpointName}")
      assert(ep.srcDbSecret.nonEmpty,
        s"${ep.endpointName}: the reference always names a secret")
      // the secret VALUE is not in the row; a provider resolves by name
      val pw = s"pw-${ep.endpointName}"
      val provider = graft.sources.Credentials.Static(
        Map(ep.srcDbSecret -> Map("password" -> pw)))
      val props = graft.sources.JdbcSource.securedPropsFor(ep, provider)
      assert(props.getProperty("password") == pw)
      assert(props.getProperty("user") == ep.srcDbUsername)
    }
  }

  test("all shipped column transformations compile with zero degradation") {
    assume(available)
    val rows = CsvConfigLoader.parseFile(s"$base/columns.csv")
      .map(CsvConfigLoader.columnMetadata)
    assert(rows.size >= 1500) // 1826 shipped rows
    val byTable = rows.groupBy(_.tableName)
    var totalCols = 0
    byTable.foreach { case (table, meta) =>
      // input columns: every bare token referenced by any transformation
      val inputCols = meta.flatMap(m => tokens(m.transformation)).toSet ++
        meta.map(_.columnName)
      val compiled = TransformationEngine.compile(meta.sortBy(_.columnId),
        inputCols.toSeq)
      assert(compiled.errors.isEmpty,
        s"$table: ${compiled.errors.mkString("; ")}")
      totalCols += meta.size
    }
    info(s"compiled $totalCols transformations across ${byTable.size} tables")
    assert(totalCols >= 1500)
  }

  test("every shipped stage table EXECUTES end-to-end on synthesized raw rows") {
    assume(available)
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val rows = CsvConfigLoader.parseFile(s"$base/columns.csv")
      .map(CsvConfigLoader.columnMetadata)
    val now = Some(java.sql.Timestamp.valueOf("2024-06-25 07:00:00"))
    var executed = 0
    rows.groupBy(_.tableName).foreach { case (table, meta) =>
      val sorted = meta.sortBy(_.columnId)
      val inputCols = (meta.flatMap(m => tokens(m.transformation)) ++
        meta.map(_.columnName)).distinct
      // raw-zone shape: every input column a string; values chosen so both
      // the magic and the parse branches are reachable (value semantics are
      // not asserted — nulls from unparseable inputs are the contract)
      val schema = StructType(inputCols.map(StructField(_, StringType)))
      val data = Seq("785432", "20240105", ""). map(v =>
        Row(inputCols.map(_ => v): _*))
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)
      val out = TransformationEngine.run(raw, sorted, now)
      val got = out.schema.fields.map(f => f.name -> f.dataType).toMap
      sorted.foreach { m =>
        assert(got(m.columnName) == m.sparkType,
          s"$table.${m.columnName}: ${got(m.columnName)} != ${m.sparkType}")
      }
      assert(out.count() >= 1) // forces full evaluation through codegen
      executed += 1
    }
    info(s"executed $executed stage tables end-to-end")
    assert(executed >= 80) // 84 shipped stage tables
  }

  private def tokens(tr: String): Seq[String] = Parser.parse(tr) match {
    case graft.dsl.Token(t) => Seq(t)
    case f: graft.dsl.FnCall => collectTokens(f)
  }
  private def collectTokens(e: graft.dsl.DslExpr): Seq[String] = e match {
    case graft.dsl.Token(t) => Seq(t)
    case graft.dsl.FnCall(_, args) => args.flatMap(collectTokens)
  }
}
