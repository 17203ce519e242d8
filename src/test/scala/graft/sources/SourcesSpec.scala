package graft.sources

import java.time.{Clock, Instant, LocalDateTime, ZoneId, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.config.EndpointConfig
import graft.extract.{RangeSlicer, ReadPlan, SqlRender}

/** JDBC option building, raw-path templating, catalog registration. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ep = EndpointConfig("EP1", "mssql", 1433, "erp", "db01", "svc")
  private val plan = ReadPlan(Seq("a", "b"), Seq("flg = 'a'"), Some("pk"),
    30, None)

  test("jdbc urls per dialect") {
    assert(JdbcSource.url(ep) ==
      "jdbc:sqlserver://db01:1433;databaseName=erp;encrypt=false")
    assert(JdbcSource.url(ep.copy(bdType = "oracle", dbPort = 1521)) ==
      "jdbc:oracle:thin:@db01:1521/erp")
    assert(JdbcSource.url(ep.copy(bdType = "mysql", dbPort = 3306)) ==
      "jdbc:mysql://db01:3306/erp")
  }

  test("pushdown dbtable subquery and slice predicates") {
    assert(JdbcSource.dbtable(plan, "dbo.t") ==
      "(SELECT a, b FROM dbo.t WHERE (flg = 'a')) AS src")
    val preds = JdbcSource.slicePredicates(plan, RangeSlicer.slices(0, 99, 2))
    assert(preds.toSeq == Seq("pk >= 0 AND pk < 50", "pk >= 50 AND pk < 100"))
  }

  test("partitioned reader carries Spark JDBC partitioning options") {
    val r = JdbcSource.partitionedReader(spark, "jdbc:h2:mem:x", plan,
      "dbo.t", "", 0, 99, JdbcSource.baseProps(ep, "pw"))
    // options are private; assert via the reader's plan-building not failing
    // and the dbtable round-trip
    assert(JdbcSource.dbtable(plan, "dbo.t").contains("SELECT a, b"))
    assert(r != null)
  }

  // ---- live JDBC execution against embedded Derby (ships with Spark) ----
  // Derby is ANSI enough to run the renderer's generated SQL (derived-table
  // subquery, >=/< slice predicates), so the option construction AND the
  // execution path are exercised end-to-end: partitioned read, predicate-
  // sliced read, and pushdown projection/filter inside the dbtable subquery.

  private lazy val derbyUrl = "jdbc:derby:memory:graftdb;create=true"
  private lazy val derbyProps = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p.setProperty("fetchsize", "1000")
    p
  }
  private lazy val derbySeeded: Boolean = {
    // UPPERCASE frame columns: the writer CREATEs quoted identifiers, and
    // Derby folds the renderer's unquoted `pk` to PK — they must agree
    (1 to 100).map(i => (i.toLong, s"v$i", if (i % 10 == 0) "x" else "a"))
      .toDF("PK", "V", "FLG")
      .write.format("jdbc")
      .option("url", derbyUrl).option("dbtable", "t_src")
      .option("driver", derbyProps.getProperty("driver"))
      // Spark's DerbyDialect maps StringType to CLOB, which Derby cannot
      // compare in WHERE — override to VARCHAR for the filter columns
      .option("createTableColumnTypes", "V VARCHAR(64), FLG VARCHAR(8)")
      .mode("overwrite").save()
    true
  }

  test("JDBC integration (Derby): range-partitioned read slices like " +
    "RangeSlicer and pushes projection+filter into the source query") {
    assert(derbySeeded)
    val p = ReadPlan(Seq("pk", "v"), Seq("flg = 'a'"), Some("pk"), 4, None)
    val got = JdbcSource.partitionedReader(spark, derbyUrl, p, "t_src", "",
      1, 100, derbyProps).option("driver", derbyProps.getProperty("driver"))
      .load()
    assert(got.rdd.getNumPartitions == 4) // Spark generated 4 range slices
    assert(got.columns.toSeq == Seq("PK", "V") ||
      got.columns.toSeq == Seq("pk", "v")) // filter pruned, projection pushed
    assert(got.count() == 90) // the 10 flg='x' rows filtered AT THE SOURCE
  }

  test("JDBC integration (Derby): predicate-sliced read covers the range " +
    "exactly once per slice") {
    assert(derbySeeded)
    val p = ReadPlan(Seq("pk", "v", "flg"), Nil, Some("pk"), 4, None)
    val slices = RangeSlicer.slices(1, 100, 4)
    val got = JdbcSource.readWithPredicates(spark, derbyUrl, p, "t_src", "",
      slices, derbyProps)
    assert(got.rdd.getNumPartitions == slices.size)
    assert(got.count() == 100) // exact cover: no gap, no overlap
    assert(got.agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col(got.columns.head))).head.getLong(0)
      == 100)
  }

  test("JDBC integration (Derby): keyset pagination pages are disjoint and " +
    "exhaustive") {
    assert(derbySeeded)
    val base = "SELECT pk, v FROM t_src"
    val pages = Iterator.from(0).map { i =>
      val sql = SqlRender.paginate(SqlRender.MsSql, base, "pk", i * 30L, 30L)
      spark.read.jdbc(derbyUrl, s"($sql) AS pg", derbyProps)
        .collect().map(_.getLong(0)).toSeq
    }.takeWhile(_.nonEmpty).toSeq
    assert(pages.map(_.size) == Seq(30, 30, 30, 10))
    assert(pages.flatten == (1L to 100L))
  }

  test("partition format tokens incl. week and quarter") {
    val ts = LocalDateTime.of(2024, 6, 25, 7, 3, 9)
    assert(PartitionFormat.render(
      "year={YYYY}/month={MM}/day={DD}/h={HH}{MI}{SS} w{WEEK} q{QUARTER}", ts)
      == "year=2024/month=06/day=25/h=070309 w26 q2")
    val clock = Clock.fixed(Instant.parse("2024-06-25T07:00:00Z"),
      ZoneOffset.UTC)
    assert(PartitionFormat.rawPath("/lake/raw", "bi", "erp", "ep1", "t1",
      clock, ZoneId.of("UTC")) ==
      "/lake/raw/bi/erp/ep1/t1/year=2024/month=06/day=25")
  }

  test("catalog registers a partitioned stage table queryable by SQL") {
    val dir = java.nio.file.Files.createTempDirectory("cat").toString
    Seq((1L, "a", "011"), (2L, "b", "012"), (3L, "c", "011"))
      .toDF("id", "v", "id_compania")
      .write.partitionBy("id_compania").parquet(s"$dir/stage_t")
    val db = Catalog.databaseName("bi", "erp", "ep-1", "stage")
    assert(db == "bi_erp_ep_1_stage")
    Catalog.registerStageTable(spark, db, "t1", s"$dir/stage_t",
      Seq("id_compania"))
    val got = spark.sql(s"SELECT id, id_compania FROM $db.t1 ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "011"), (2L, "012"), (3L, "011")))
    // re-register is idempotent
    Catalog.registerStageTable(spark, db, "t1", s"$dir/stage_t",
      Seq("id_compania"))
    assert(spark.sql(s"SELECT count(*) FROM $db.t1").collect()(0).getLong(0) == 3)
  }

  test("catalog re-syncs on schema drift, no-ops when schemas match") {
    val dir = java.nio.file.Files.createTempDirectory("catsync").toString
    val db = Catalog.databaseName("bi", "erp", "ep-2", "stage")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/t2")
    // unregistered table: sync registers fresh, all columns "added"
    val first = Catalog.syncStageTable(spark, db, "t2", s"$dir/t2")
    assert(first.exists(d => d.added == Seq("id", "v") &&
      d.dropped.isEmpty && d.retyped.isEmpty))
    // no drift → no-op
    assert(Catalog.syncStageTable(spark, db, "t2", s"$dir/t2").isEmpty)
    // evolve: add a column, retype another (v string → long)
    Seq((1L, 10L, 1.5), (2L, 20L, 2.5)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(s"$dir/t2")
    val drift = Catalog.syncStageTable(spark, db, "t2", s"$dir/t2")
    assert(drift.exists(d => d.added == Seq("score") &&
      d.dropped.isEmpty && d.retyped == Seq("v")))
    // the re-registered table serves the evolved schema
    val got = spark.sql(s"SELECT id, v, score FROM $db.t2 ORDER BY id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10L, 1.5), (2L, 20L, 2.5)))
    // batched zone sync: already-synced table no-ops, a new one registers
    Seq((9L, "x")).toDF("id", "w").write.parquet(s"$dir/t3")
    val all = Catalog.syncAll(spark, db,
      Seq("t2" -> s"$dir/t2", "t3" -> s"$dir/t3"), batchSize = 1)
    assert(all("t2").isEmpty)
    assert(all("t3").exists(_.added == Seq("id", "w")))
  }
}
