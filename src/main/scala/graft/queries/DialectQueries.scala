package graft.queries

import org.apache.spark.sql.functions._
import graft.extract.{Columns, ReadPlan, Slice, SqlRender}
import graft.sources.mock.{MockDb, MockDbDriver}
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

    // D201 — credential-provider seam (sources.Credentials), the
    // extract_data.py:267-312 Secrets-Manager twin: the password never
    // lives in config — JdbcSource.securedProps resolves it through a
    // provider CHAIN (env miss → properties file hit) at connect time,
    // against a file-backed Derby with BUILTIN authentication actually
    // ENABLED: an unauthenticated read is require()d to fail, the
    // provider-resolved credentials succeed (live roundtrip, oracled),
    // and a missing secret refuses NAMING the secret and every provider
    // consulted.
    "a16_secret_roundtrip" -> (((spark, dir) => {
      import graft.sources.{Credentials, JdbcSource}
      val tmp = Q.scratchDir("secret_gate")
      try {
        val dbDir = tmp.resolve("secdb").toString
        val secUrl = s"jdbc:derby:$dbDir"
        // boot unauthenticated: seed + declare BUILTIN auth (static
        // properties — they arm on the next database boot)
        val boot = java.sql.DriverManager.getConnection(
          s"$secUrl;create=true")
        try {
          val st = boot.createStatement()
          def set(k: String, v: String): Unit = { st.execute(
            s"CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY('$k', '$v')"); () }
          set("derby.connection.requireAuthentication", "true")
          set("derby.authentication.provider", "BUILTIN")
          set("derby.user.graft_user", "s3cr3t-pw")
          st.close()
        } finally boot.close()
        load(spark, dir, "orders").filter(col("o_orderkey") <= 1000)
          .select(col("o_orderkey").cast("long").as("O_ORDERKEY"),
            col("o_totalprice").cast("double").as("O_TOTALPRICE"))
          .write.format("jdbc")
          .option("url", secUrl).option("dbtable", "sec_orders")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .mode("overwrite").save()
        try java.sql.DriverManager.getConnection(s"$secUrl;shutdown=true")
        catch { case _: java.sql.SQLException => () } // 08006 = success
        // auth is LIVE now: an unauthenticated boot must refuse
        val unauthFails = try {
          java.sql.DriverManager.getConnection(secUrl).close(); false
        } catch { case _: java.sql.SQLException => true }
        require(unauthFails,
          "the endpoint must actually enforce authentication")
        // the seam: env provider misses, the properties file resolves
        val secretsFile = tmp.resolve("secrets.properties").toString
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(secretsFile),
          "derby_main.user=graft_user\nderby_main.password=s3cr3t-pw\n")
        val chain = Credentials.Chain(Seq(
          Credentials.Env(), Credentials.PropsFile(secretsFile)))
        // the endpoint row arrives in the reference's credentials.csv
        // shape — SRC_DB_SECRET names the secret, never carries it
        val ep = graft.config.CsvConfigLoader.parse(
          "ENDPOINT_NAME;BD_TYPE;DB_PORT_NUMBER;SRC_DB_NAME;" +
            "SRC_DB_SECRET;SRC_DB_USERNAME;SRC_SERVER_NAME\n" +
            "derby_main;mysql;1527;secdb;derby_main;cfg_user;localhost")
          .map(graft.config.CsvConfigLoader.endpointConfig).head
        require(ep.srcDbSecret == "derby_main",
          "the loader must surface SRC_DB_SECRET")
        val noSecret = try {
          JdbcSource.securedPropsFor(ep.copy(srcDbSecret = ""), chain); ""
        } catch { case e: IllegalArgumentException => e.getMessage }
        require(noSecret.contains("SRC_DB_SECRET"),
          "an endpoint without a declared secret must refuse")
        val props = JdbcSource.securedPropsFor(ep, chain)
        require(props.getProperty("user") == "graft_user",
          "the secret's user field must override the config username")
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        // a missing secret refuses, naming secret + providers
        val refusal = try {
          JdbcSource.securedProps(ep, "absent_secret", chain); ""
        } catch { case m: Credentials.MissingSecret => m.getMessage }
        require(refusal.contains("absent_secret") &&
          refusal.contains("env(") && refusal.contains("file("),
          s"refusal must name the secret and the chain, got: $refusal")
        // the live read with resolved credentials (table under the
        // pre-auth owner's APP schema; BUILTIN auth w/o sqlAuthorization
        // lets any authenticated user read it)
        spark.read.jdbc(secUrl,
          "(SELECT * FROM APP.sec_orders) s", props)
          .agg(count(expr("1")).as("n"),
            sum(d18(col("O_TOTALPRICE"))).cast("double").as("total"),
            min(col("O_ORDERKEY")).as("kmin"),
            max(col("O_ORDERKEY")).as("kmax"))
          .localCheckpoint() // materialize before the scratch dir dies
      } finally {
        try java.sql.DriverManager.getConnection(
          s"jdbc:derby:${tmp.resolve("secdb")};user=graft_user;" +
            "password=s3cr3t-pw;shutdown=true")
        catch { case _: java.sql.SQLException => () }
        graft.sink.StageWriter.deleteRecursively(tmp)
      }
    }, Some("""
      SELECT count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total,
             min(o_orderkey) AS kmin, max(o_orderkey) AS kmax
      FROM orders WHERE o_orderkey <= 1000"""))),

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

    // A16+ — per-dialect EXECUTION gates against emulated endpoints
    // (graft.sources.mock): Derby witnesses the ANSI subset live, but the
    // dialect-SPECIFIC grammar (CONVERT / TO_DATE / LIMIT-vs-OFFSET-FETCH,
    // reference extract_data.py:267-277, 1048-1073) needs an endpoint that
    // ACCEPTS its own dialect and REJECTS the others'. Each gate renders
    // the filter, the pagination page, and the A6 partition slices for one
    // dialect and executes all of it through spark.read.jdbc against the
    // matching mock — the same reader code path a production endpoint
    // exercises (schema probe, column-pruned partition reads).
    "a16_dialect_mssql" -> ((mockGate(SqlRender.MsSql, "mssql",
      "smalldatetime"), Some(mockOracle(
        "CAST(''1995-01-01'' AS DATETIME2(6))",
        "CONVERT(smalldatetime, ''1995-01-01 00:00:00'', 120)")))),
    "a16_dialect_oracle" -> ((mockGate(SqlRender.Oracle, "oracle", "date"),
      Some(mockOracle(
        "TO_TIMESTAMP(''1995-01-01'', ''YYYY-MM-DD HH24:MI:SS.FF6'')",
        "TO_DATE(''1995-01-01 00:00:00'', ''YYYY-MM-DD HH24:MI:SS'')")))),
    "a16_dialect_mysql" -> ((mockGate(SqlRender.MySql, "mysql", ""),
      Some(mockOracle("''1995-01-01''", "''1995-01-01 00:00:00''")))),
  )

  /** One dialect's full execution pass against its emulated endpoint. */
  private def mockGate(d: SqlRender.Dialect, dname: String,
      typedKind: String): Q.QueryFn = (spark, dir) => {
    // Seed the endpoint: the ≤2000-key orders slice as the in-memory
    // remote table (the collect IS the fixture setup, not a query path).
    val rows = load(spark, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey").cast("long"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice").cast("double"))
      .collect()
      .map(r => Array[Any](r.getLong(0), r.getString(1), r.getDouble(2)))
    MockDb.register(dname, "a16_orders", Seq(
      MockDb.Col("O_ORDERKEY", java.sql.Types.BIGINT),
      MockDb.Col("O_ORDERDATE", java.sql.Types.VARCHAR),
      MockDb.Col("O_TOTALPRICE", java.sql.Types.DOUBLE)),
      rows.toIndexedSeq)
    val murl = s"jdbc:graftmock:$dname:$dname"
    val mprops = new java.util.Properties()
    mprops.setProperty("driver", MockDbDriver.DriverClass)
    val litF = SqlRender.dateLiteral(d, "1995-01-01")
    val fsql = SqlRender.renderSingle(
      ReadPlan(Seq("o_orderkey", "o_totalprice"),
        Seq(s"o_orderdate >= $litF"), None, 1, None), "a16_orders", "")
    val filtered = spark.read.jdbc(murl, s"($fsql) f", mprops)
    val psql = SqlRender.paginate(d, "SELECT o_orderkey FROM a16_orders",
      "o_orderkey", 10, 5)
    val page = spark.read.jdbc(murl, s"($psql) pg", mprops)
    // A6 slice form: one rendered query per partition slice, each read
    // through the endpoint (the reference's parallel-executor shape)
    val sliceSqls = SqlRender.renderSlices(
      ReadPlan(Seq("o_orderkey"), Nil, Some("o_orderkey"), 3, None),
      "a16_orders", "", Seq(Slice(1, 700), Slice(700, 1400), Slice(1400, 2001)))
    val sliceCounts = sliceSqls.zipWithIndex.map { case (s, i) =>
      spark.read.jdbc(murl, s"($s) s$i", mprops).count()
    }
    val f = filtered.agg(count(expr("1")).as("n"),
      sum(d18(col("O_TOTALPRICE"))).cast("double").as("total"),
      min(col("O_ORDERKEY")).as("kmin"), max(col("O_ORDERKEY")).as("kmax"))
    val p = page.agg(array_join(transform(
      sort_array(collect_list(col("O_ORDERKEY"))), _.cast("string")), ",")
      .as("page_keys"))
    f.crossJoin(broadcast(p)).select(col("n"), col("total"), col("kmin"),
      col("kmax"), col("page_keys"),
      lit(sliceCounts.map(_.toString).mkString(",")).as("slice_counts"),
      lit(litF).as("lit_filter"),
      lit(SqlRender.dateLiteral(d, "1995-01-01 00:00:00", typedKind))
        .as("lit_typed"))
  }

  /** Shared oracle: rows from parquet; the two literal texts pin the
    * dialect's exact rendering (already ''-escaped by the caller). */
  private def mockOracle(litFilter: String, litTyped: String): String = s"""
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
           (SELECT concat_ws(',',
              count(*) FILTER (WHERE o_orderkey >= 1 AND o_orderkey < 700),
              count(*) FILTER (WHERE o_orderkey >= 700 AND o_orderkey < 1400),
              count(*) FILTER (WHERE o_orderkey >= 1400 AND o_orderkey < 2001))
            FROM orders WHERE o_orderkey <= 2000) AS slice_counts,
           '$litFilter' AS lit_filter,
           '$litTyped' AS lit_typed"""
}
