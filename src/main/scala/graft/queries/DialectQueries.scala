package graft.queries

import org.apache.spark.sql.functions._
import graft.extract.{Columns, ReadPlan, SqlRender}
import Q._

/** A16/A17 promoted from unit-only coverage to CORRECTNESS rows: the
  * renderer's generated SQL is EXECUTED against embedded Derby (the live
  * JDBC endpoint available in-process — ANSI enough for the rendered
  * text), and the result plus the per-dialect literal renderings are
  * oracled against DuckDB computing the same rows from the parquet source.
  *
  * Reference twins: dialect date literals `extract_data.py:1048-1073`,
  * OFFSET/FETCH pagination `query_generator.py:369-397`, duplicate-column
  * renaming `extract_data.py:430-463`.
  */
object DialectQueries {

  private val url = "jdbc:derby:memory:a16gate;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Seed Derby with the o_orderkey <= 2000 orders slice (dates as
    * VARCHAR — the raw-zone stringified shape the renderer filters on).
    * Overwrite per call: Verify/Bench may run many queries in one JVM. */
  private def seed(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Unit =
    load(spark, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey").cast("long").as("O_ORDERKEY"),
        col("o_orderdate").cast("date").cast("string").as("O_ORDERDATE"),
        col("o_totalprice").cast("double").as("O_TOTALPRICE"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "a16_orders")
      .option("driver", props.getProperty("driver"))
      .option("createTableColumnTypes", "O_ORDERDATE VARCHAR(10)")
      .mode("overwrite").save()

  val defs: Map[String, Entry] = Map(

    // A16 — dialect rendering ROUNDTRIP: the MySQL date-literal filter and
    // the SQL-Server/Oracle OFFSET-FETCH pagination page run LIVE on
    // Derby through the rendered text (filter evaluated at the source, not
    // in Spark); the SQL-Server and Oracle literal texts ride along as
    // output columns so the oracle pins their exact rendering too.
    "a16_dialect_roundtrip" -> (((spark, dir) => {
      seed(spark, dir)
      val lit95 = SqlRender.dateLiteral(SqlRender.MySql, "1995-01-01")
      val plan = ReadPlan(Seq("o_orderkey", "o_totalprice"),
        Seq(s"o_orderdate >= $lit95"), None, 1, None)
      val sql = SqlRender.renderSingle(plan, "a16_orders", "")
      val filtered = spark.read.jdbc(url, s"($sql) f", props)
      val pageSql = SqlRender.paginate(SqlRender.MsSql,
        "SELECT o_orderkey FROM a16_orders", "o_orderkey", 10, 5)
      val page = spark.read.jdbc(url, s"($pageSql) pg", props)
      val f = filtered.agg(count(expr("1")).as("n"),
        sum(d18(col("O_TOTALPRICE"))).cast("double").as("total"),
        min(col("O_ORDERKEY")).as("kmin"), max(col("O_ORDERKEY")).as("kmax"))
      val p = page.agg(array_join(transform(
        sort_array(collect_list(col("O_ORDERKEY"))), _.cast("string")), ",")
        .as("page_keys"))
      f.crossJoin(p).select(col("n"), col("total"), col("kmin"), col("kmax"),
        col("page_keys"),
        lit(SqlRender.dateLiteral(SqlRender.MsSql, "1995-01-01 00:00:00"))
          .as("lit_mssql"),
        lit(SqlRender.dateLiteral(SqlRender.Oracle, "1995-01-01 00:00:00",
          "date")).as("lit_oracle"),
        lit(lit95).as("lit_mysql"))
    }, Some("""
      WITH f AS (
        SELECT * FROM orders
        WHERE o_orderkey <= 2000
          AND CAST(CAST(o_orderdate AS DATE) AS VARCHAR) >= '1995-01-01'),
      pg AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey <= 2000
        ORDER BY o_orderkey OFFSET 10 LIMIT 5)
      SELECT (SELECT count(*) FROM f) AS n,
             (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                FROM f) AS total,
             (SELECT min(o_orderkey) FROM f) AS kmin,
             (SELECT max(o_orderkey) FROM f) AS kmax,
             (SELECT string_agg(CAST(o_orderkey AS VARCHAR), ','
                                ORDER BY o_orderkey) FROM pg) AS page_keys,
             'CAST(''1995-01-01 00:00:00'' AS DATETIME2(6))' AS lit_mssql,
             'TO_DATE(''1995-01-01 00:00:00'', ''YYYY-MM-DD HH24:MI:SS'')'
               AS lit_oracle,
             '''1995-01-01''' AS lit_mysql"""))),

    // A17 — duplicate-column renaming executed live: the deduped SELECT
    // list (o_orderkey, o_orderkey_1) runs on Derby and both copies come
    // back; the oracle re-derives the same aliasing from the parquet rows.
    "a17_dup_columns" -> (((spark, dir) => {
      seed(spark, dir)
      val names = Columns.dedupeNames(Seq("o_orderkey", "o_orderkey"))
      val dupSql = s"SELECT o_orderkey AS ${names.head}, o_orderkey AS " +
        s"${names(1)} FROM a16_orders WHERE o_orderkey <= 100"
      spark.read.jdbc(url, s"($dupSql) d", props)
        .agg(count(expr("1")).as("n"),
          sum(col(names.head.toUpperCase)).as("sum_a"),
          sum(col(names(1).toUpperCase)).as("sum_b"))
        .withColumn("names", lit(names.mkString(",")))
    }, Some("""
      SELECT count(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_a,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_b,
             'o_orderkey,o_orderkey_1' AS names
      FROM orders WHERE o_orderkey <= 100"""))),
  )
}
