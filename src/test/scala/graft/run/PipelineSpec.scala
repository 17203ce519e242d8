package graft.run

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Clock, Instant, ZoneId, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.config._
import graft.extract.{Columns, ReadPlan, RangeSlicer, SqlRender, Strategies}
import graft.state.InMemoryWatermarkStore

/** End-to-end reference-shaped fixture pipeline (FIXTURES A2/A3, SURVEY §5.4)
  * + rendering/scheduling units. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val clock = Clock.fixed(Instant.parse("2024-06-25T12:00:00Z"),
    ZoneOffset.UTC)
  private val utc = ZoneId.of("UTC")
  private val now = Some(Timestamp.valueOf("2024-06-25 07:00:00"))

  /** FIXTURES A2 — trelcons1f-shaped all-string raw source with magic
    * encodings and a duplicate business key (older + newer row). */
  private def fixtureSource(): String = {
    val rows = Seq(
      // compania, codocas, usuamodi, fecmodi(magic), horamodi, id
      ("011 ", "A01", "JPEREZ", "739062", "070000", "011|A01"),
      ("011 ", "A01", "OLDER ", "739000", "080000", "011|A01"), // dup, older
      ("012 ", "B02", "MLOPEZ", "739061", "123456", "012|B02"),
      ("013 ", "C03", null,     null,     null,     "013|C03"))
      .toDF("compania", "codocas", "usuamodi", "fecmodi", "horamodi", "id")
    val p = Files.createTempDirectory("fix").resolve("src").toString
    rows.write.parquet(p); p
  }

  private val fixtureMeta = Seq(
    ColumnMetadata("processdate", 1, false, false, false, false, "timestamp",
      "i_rel", "fn_transform_Datetime()"),
    ColumnMetadata("id_relacion", 2, false, true, true, false, "string",
      "i_rel", "fn_transform_ClearString(id)"),
    ColumnMetadata("id_compania", 3, false, false, false, true, "string",
      "i_rel", "fn_transform_ClearString(compania)"),
    ColumnMetadata("cod_usuario", 4, false, false, false, false, "string",
      "i_rel", "fn_transform_ClearString(usuamodi, $UNKNOWN)"),
    ColumnMetadata("lastmodifydate", 5, true, false, false, false, "timestamp",
      "i_rel", "fn_transform_DatetimeMagic(fecmodi, horamodi, yyyyMMdd)"))

  private def cfg(lt: LoadType = LoadType.Full) = TableConfig("*", lt, "auto",
    "", 0, 0, "", "", "", "", "", "G1", "dbo", "trelcons1f", "m", "i_rel",
    "a", "1")

  test("A2 master pipeline: extract -> raw(all-string) -> transform -> " +
    "dedup-latest -> partitioned stage") {
    val src = fixtureSource()
    val dir = Files.createTempDirectory("pipe")
    val rawPath = dir.resolve("raw").toString
    val stagePath = dir.resolve("stage").toString

    val extracted = TablePipeline.extract(spark, src, rawPath, cfg(),
      LoadMode.Initial, clock, utc, None)
    assert(extracted == 4)
    // raw zone is all-string
    assert(spark.read.parquet(rawPath).schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))

    val staged = TablePipeline.transform(spark, rawPath, stagePath, cfg(),
      fixtureMeta, now)
    assert(staged == 3) // dup collapsed to latest
    val out = spark.read.parquet(stagePath)
    val byId = out.collect().map(r =>
      r.getAs[String]("id_relacion") -> r).toMap
    // dedup kept the NEWER fecmodi row
    assert(byId("011|A01").getAs[String]("cod_usuario") == "JPEREZ")
    assert(byId("011|A01").getAs[Timestamp]("lastmodifydate") ==
      Timestamp.valueOf("2024-06-25 07:00:00"))
    // magic decode of the second row
    assert(byId("012|B02").getAs[Timestamp]("lastmodifydate") ==
      Timestamp.valueOf("2024-06-24 12:34:56"))
    // null handling: default literal + null timestamp
    assert(byId("013|C03").getAs[String]("cod_usuario") == "UNKNOWN")
    assert(byId("013|C03").getAs[Timestamp]("lastmodifydate") == null)
    // stage is partitioned by id_compania (directory layout)
    assert(Files.exists(java.nio.file.Paths.get(stagePath, "id_compania=011")))
  }

  test("A3 transactional re-run: incremental MERGE updates matched keys") {
    val dir = Files.createTempDirectory("pipe2")
    val stagePath = dir.resolve("stage").toString
    val meta = Seq(
      ColumnMetadata("id_doc", 1, false, true, true, false, "string", "t",
        "fn_transform_ClearString(id)"),
      ColumnMetadata("monto", 2, false, false, false, false, "numeric(13,2)",
        "t", "fn_transform_Numeric(monto)"))
    def writeRaw(rows: Seq[(String, String)], path: String): Unit =
      StageWriter0.write(rows.toDF("id", "monto"), path)
    val raw1 = dir.resolve("raw1").toString
    writeRaw(Seq(("D1", "10.00"), ("D2", "20.00")), raw1)
    TablePipeline.transform(spark, raw1, stagePath,
      cfg(LoadType.Incremental), meta, now)
    val raw2 = dir.resolve("raw2").toString
    writeRaw(Seq(("D2", "25.00"), ("D3", "30.00")), raw2)
    TablePipeline.transform(spark, raw2, stagePath,
      cfg(LoadType.Incremental), meta, now)
    val got = spark.read.parquet(stagePath)
      .collect().map(r => r.getString(0) -> r.getDecimal(1).toString).toMap
    assert(got == Map("D1" -> "10.00", "D2" -> "25.00", "D3" -> "30.00"))
  }

  test("re-running a transform MERGES inherited tags with explicit " +
    "stage tags — an operator's stricter declaration is never " +
    "downgraded by lineage") {
    import graft.sources.AccessTags
    val dir = Files.createTempDirectory("pipetagmerge")
    val stagePath = dir.resolve("stage").toString
    val raw = dir.resolve("raw").toString
    val meta = Seq(
      ColumnMetadata("id_doc", 1, false, true, true, false, "string", "t",
        "fn_transform_ClearString(id)"),
      ColumnMetadata("monto", 2, false, false, false, false, "numeric(13,2)",
        "t", "fn_transform_Numeric(monto)"))
    StageWriter0.write(Seq(("D1", "10.00")).toDF("id", "monto"), raw)
    AccessTags.tagTable(raw, Map("id" -> "id", "monto" -> "meta"))
    try {
      TablePipeline.transform(spark, raw, stagePath, cfg(), meta, now)
      assert(AccessTags.tagsOf(stagePath) == Map(
        "id_doc" -> Set("id"), "monto" -> Set("meta")))
      // the operator declares a STRICTER tag on a stage column
      AccessTags.tagColumns(stagePath, AccessTags.tagsOf(stagePath) +
        ("monto" -> Set("meta", "pii")))
      TablePipeline.transform(spark, raw, stagePath, cfg(), meta, now)
      assert(AccessTags.tagsOf(stagePath)("monto") == Set("meta", "pii"),
        "the explicit 'pii' tag must survive the re-run (union, " +
          s"most-restrictive wins), got ${AccessTags.tagsOf(stagePath)}")
      assert(AccessTags.tagsOf(stagePath)("id_doc") == Set("id"))
    } finally {
      AccessTags.untagTable(raw); AccessTags.untagTable(stagePath)
    }
  }

  test("empty raw input bootstraps typed empty stage (warn-not-fail)") {
    val dir = Files.createTempDirectory("pipe3")
    val raw = dir.resolve("raw").toString
    Seq.empty[(String, String)].toDF("id", "monto").write.parquet(raw)
    val stage = dir.resolve("stage").toString
    val meta = Seq(ColumnMetadata("id_doc", 1, false, true, false, false,
      "string", "t", "fn_transform_ClearString(id)"))
    val n = TablePipeline.transform(spark, raw, stage, cfg(), meta, now)
    assert(n == 0)
    val out = spark.read.parquet(stage)
    assert(out.count() == 0 && out.schema.fieldNames.toSeq == Seq("id_doc"))
  }

  test("watermark INITIAL -> NORMAL -> RESET cycle over a growing source") {
    val store = new InMemoryWatermarkStore
    val dir = Files.createTempDirectory("wm")
    val src = dir.resolve("src").toString
    (1 to 10).map(i => (i.toLong, s"r$i")).toDF("seq", "v").write.parquet(src)
    val c = TableConfig("*", LoadType.Incremental, "auto", "seq", 0, 0, "",
      "", "", "", "", "G1", "dbo", "evt", "t", "s_evt", "a", "1")
    def count(mode: LoadMode): Long =
      Strategies.extract(spark, src, c, mode, clock, utc, Some(store))(_.count())
    assert(count(LoadMode.Initial) == 10)
    assert(store.lastConfirmed("default", "evt", "seq") == Some("10"))
    (1 to 15).map(i => (i.toLong, s"r$i")).toDF("seq", "v")
      .write.mode("overwrite").parquet(src)
    assert(count(LoadMode.Normal) == 5) // only seq > 10
    assert(store.lastConfirmed("default", "evt", "seq") == Some("15"))
    assert(count(LoadMode.Reset) == 15) // watermark cleared, full reload
  }

  test("watermark is rolled back when delivery fails — the batch is NOT " +
    "skipped on the next NORMAL run") {
    val store = new InMemoryWatermarkStore
    val dir = Files.createTempDirectory("wmfail")
    val src = dir.resolve("src").toString
    (1 to 10).map(i => (i.toLong, s"r$i")).toDF("seq", "v").write.parquet(src)
    val c = TableConfig("*", LoadType.Incremental, "auto", "seq", 0, 0, "",
      "", "", "", "", "G1", "dbo", "evt2", "t", "s_evt2", "a", "1")
    assert(Strategies.extract(spark, src, c, LoadMode.Initial, clock, utc,
      Some(store))(_.count()) == 10)
    (1 to 15).map(i => (i.toLong, s"r$i")).toDF("seq", "v")
      .write.mode("overwrite").parquet(src)
    // deliver throws → pending token must roll back, watermark stays at 10
    intercept[RuntimeException] {
      Strategies.extract(spark, src, c, LoadMode.Normal, clock, utc,
        Some(store)) { _ => throw new RuntimeException("write failed") }
    }
    assert(store.lastConfirmed("default", "evt2", "seq") == Some("10"))
    // retry re-extracts the same 5-row batch (nothing silently skipped)
    assert(Strategies.extract(spark, src, c, LoadMode.Normal, clock, utc,
      Some(store))(_.count()) == 5)
    assert(store.lastConfirmed("default", "evt2", "seq") == Some("15"))
  }

  // ---- rendering + naming units (A16, A3, A17, A11) ----
  test("dialect date literals match the reference renderings") {
    import SqlRender._
    assert(dateLiteral(MsSql, "2024-01-02 03:04:05", "smalldatetime") ==
      "CONVERT(smalldatetime, '2024-01-02 03:04:05', 120)")
    assert(dateLiteral(Oracle, "2024-01-02", "date") ==
      "TO_DATE('2024-01-02', 'YYYY-MM-DD HH24:MI:SS')")
    assert(dateLiteral(MySql, "2024-01-02") == "'2024-01-02'")
  }

  test("slice rendering produces one bounded SELECT per partition") {
    val plan = ReadPlan(Seq("a", "b"), Seq("flg = 'a'"), Some("pk"), 30, None)
    val sql = SqlRender.renderSlices(plan, "dbo.t", "", RangeSlicer.slices(0, 99, 2))
    assert(sql == Seq(
      "SELECT a, b FROM dbo.t WHERE (flg = 'a') AND pk >= 0 AND pk < 50",
      "SELECT a, b FROM dbo.t WHERE (flg = 'a') AND pk >= 50 AND pk < 100"))
  }

  test("pagination rendering (keyset, A11)") {
    assert(SqlRender.paginate(SqlRender.MsSql, "SELECT * FROM t", "id", 1000000, 1000000)
      == "SELECT * FROM t ORDER BY id OFFSET 1000000 ROWS FETCH NEXT 1000000 ROWS ONLY")
  }

  test("output-name recovery and duplicate renaming (A3, A17)") {
    assert(Columns.outputNames(Seq(
      "dbo.func(a, b) AS lastmodifydate", "t.compania", "codocas",
      "x + 1 netx", "substring(a, 1, 2)")) ==
      Seq("lastmodifydate", "compania", "codocas", "netx", "col_4"))
    assert(Columns.dedupeNames(Seq("a", "b", "a", "A", "b")) ==
      Seq("a", "b", "a_1", "A_2", "b_1"))
  }

  test("warn tier: 10-50% degraded columns -> WARNING, rows still written") {
    val dir = Files.createTempDirectory("warn")
    val raw = dir.resolve("raw").toString
    Seq(("1", "a"), ("2", "b")).toDF("id", "v").write.parquet(raw)
    val meta = Seq(
      ColumnMetadata("id_doc", 1, false, true, false, false, "string", "t",
        "fn_transform_ClearString(id)"),
      ColumnMetadata("v_ok", 2, false, false, false, false, "string", "t",
        "fn_transform_ClearString(v)"),
      ColumnMetadata("bad1", 3, false, false, false, false, "string", "t",
        "fn_transform_NoSuchFunction(v)"),
      ColumnMetadata("bad2", 4, false, false, false, false, "string", "t",
        "fn_transform_AlsoMissing(v)"))
    val stage = dir.resolve("stage").toString
    val (rows, status) = TablePipeline.transformWithStatus(spark, raw, stage,
      cfg(), meta, now)
    assert(rows == 2 && status == "WARNING") // 2/4 degraded = 50% -> warn tier
    val out = spark.read.parquet(stage)
    assert(out.filter(col("bad1").isNull && col("bad2").isNull).count() == 2)
    assert(out.filter(col("v_ok").isNotNull).count() == 2) // good cols intact
  }

  test("fail tier: >50% degraded columns throws (no silent garbage table)") {
    val dir = Files.createTempDirectory("fail")
    val raw = dir.resolve("raw").toString
    Seq(("1", "a")).toDF("id", "v").write.parquet(raw)
    val meta = Seq(
      ColumnMetadata("id_doc", 1, false, true, false, false, "string", "t",
        "fn_transform_ClearString(id)"),
      ColumnMetadata("bad1", 2, false, false, false, false, "string", "t",
        "fn_transform_NoSuchFunction(v)"),
      ColumnMetadata("bad2", 3, false, false, false, false, "string", "t",
        "fn_transform_AlsoMissing(v)"),
      ColumnMetadata("bad3", 4, false, false, false, false, "string", "t",
        "fn_transform_StillMissing(v)"))
    val e = intercept[RuntimeException] {
      TablePipeline.transformWithStatus(spark, raw,
        dir.resolve("stage").toString, cfg(), meta, now)
    }
    assert(e.getMessage.contains("75.0%"))
  }

  test("clean transform reports SUCCESS; scheduler carries WARNING into " +
    "the run log") {
    val recs = GroupScheduler.runDetailed(Seq(
      ("clean", () => (10L, "SUCCESS")),
      ("degraded", () => (5L, "WARNING")),
      ("broken", () => sys.error("boom"))), maxConcurrency = 2)
    val byName = recs.map(r => r.table -> r).toMap
    assert(byName("clean").status == "SUCCESS")
    assert(byName("degraded").status == "WARNING" &&
      byName("degraded").rows == 5)
    assert(byName("broken").status == "FAILED")
  }

  test("extract runs exactly ONE action: the row count is observed during " +
    "the raw write, never by re-scanning") {
    val dir = Files.createTempDirectory("onepass")
    val src = dir.resolve("src").toString
    (1 to 7).map(i => (i.toLong, s"r$i")).toDF("seq", "v").write.parquet(src)
    val marker = dir.toString
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.analyzed.toString.contains(marker)) { actions.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = TablePipeline.extract(spark, src, dir.resolve("raw").toString,
        cfg(), LoadMode.Initial, clock, utc, None)
      assert(n == 7)
      // listener delivery is async — wait until the count settles
      val deadline = System.nanoTime() + 10L * 1000000000L
      var last = -1
      while (System.nanoTime() < deadline && actions.get() != last) {
        last = actions.get(); Thread.sleep(250)
      }
      assert(actions.get() == 1,
        s"expected exactly one Spark action for extract, saw ${actions.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("group scheduler: bounded parallel, failures recorded not thrown") {
    val recs = GroupScheduler.run(Seq(
      ("t1", () => 10L),
      ("t2", () => sys.error("boom")),
      ("t3", () => 30L)), maxConcurrency = 2)
    val byName = recs.map(r => r.table -> r).toMap
    assert(byName("t1").status == "SUCCESS" && byName("t1").rows == 10)
    assert(byName("t2").status == "FAILED" && byName("t2").error.contains("boom"))
    assert(byName("t3").status == "SUCCESS")
  }
}

/** tiny helper so the A3 test writes raw without picking up StageWriter's
  * swap-dir semantics in a fresh dir */
private object StageWriter0 {
  def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
