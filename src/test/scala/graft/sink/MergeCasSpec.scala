package graft.sink

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The DEFAULT merge path is transactional: StageWriter.mergeInto's
  * claim-sequence CAS under contention, crash recovery via vacuum, and the
  * pipeline entry point (TablePipeline.transform) inheriting the guarantee
  * unconditionally — the Delta-optimistic-concurrency contract the
  * reference gets for free (light_transform.py:1382-1392) at 60 concurrent
  * transforms (group_stack.py:375). */
class MergeCasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cas").resolve("t").toString

  test("four-way mergeInto contention — every writer's rows land, " +
    "sequence advances once per commit") {
    val path = tmp()
    StageWriter.mergeInto(spark, Seq((0, "base")).toDF("k", "v"), path,
      Seq("k"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to 4).map { w =>
        Future {
          StageWriter.mergeInto(spark,
            Seq((w, s"w$w"), (100 + w, s"x$w")).toDF("k", "v"), path,
            Seq("k"), maxRetries = 200, backoffMs = 50)
        }
      }
      Await.result(Future.sequence(fs), 5.minutes)
    } finally pool.shutdown()
    val got = spark.read.parquet(path).as[(Int, String)].collect().toSet
    assert(got == Set((0, "base"), (1, "w1"), (2, "w2"), (3, "w3"),
      (4, "w4"), (101, "x1"), (102, "x2"), (103, "x3"), (104, "x4")),
      "a lost update under contention")
    assert(StageWriter.committedSeq(path) == 5L,
      "bootstrap + four merges = sequence 5")
  }

  test("pipeline entry point: four concurrent incremental transforms into " +
    "one stage table — no lost update without any caller opt-in") {
    import graft.config.{ColumnMetadata, LoadType, TableConfig}
    import graft.run.TablePipeline
    val cfg = TableConfig("*", LoadType.Incremental, "auto", "", 0, 0,
      "", "", "", "k", "", "p1", "dbo", "src", "t", "stage", "a", "1")
    val meta = Seq(
      ColumnMetadata("k", 1, isFilterDate = false, isId = true,
        isOrderBy = false, isPartition = false, newDataType = "integer",
        tableName = "t", transformation = "k"),
      ColumnMetadata("v", 2, isFilterDate = false, isId = false,
        isOrderBy = false, isPartition = false, newDataType = "string",
        tableName = "t", transformation = "v"))
    val root = Files.createTempDirectory("pipe_cas")
    val stage = root.resolve("stage").toString
    // bootstrap so the four racers all take the mergeInto branch
    val raw0 = root.resolve("raw0").toString
    Seq(("0", "base")).toDF("k", "v").write.parquet(raw0)
    TablePipeline.transform(spark, raw0, stage, cfg, meta)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to 4).map { w =>
        val raw = root.resolve(s"raw$w").toString
        Seq((w.toString, s"w$w")).toDF("k", "v").write.parquet(raw)
        Future(TablePipeline.transform(spark, raw, stage, cfg, meta))
      }
      Await.result(Future.sequence(fs), 5.minutes)
    } finally pool.shutdown()
    val got = spark.read.parquet(stage)
      .as[(Int, String)].collect().toSet
    assert(got == Set((0, "base"), (1, "w1"), (2, "w2"), (3, "w3"),
      (4, "w4")), "pipeline transform lost an update under contention")
    // bootstrap goes through overwrite (no sequence), the four racers
    // through the CAS merge — one sequence bump each
    assert(StageWriter.committedSeq(stage) == 4L)
  }

  test("a stranded claim blocks mergers fail-stop; vacuum past retention " +
    "reclaims it and the merge proceeds") {
    val path = tmp()
    StageWriter.mergeInto(spark, Seq((1, "a")).toDF("k", "v"), path, Seq("k"))
    // crashed claimant: claim 2 exists, sequence still 1
    Files.createDirectories(Paths.get(path + ".__claims__"))
    Files.createFile(Paths.get(path + ".__claims__").resolve("2"))
    val e = intercept[StageWriter.ConcurrentMergeException] {
      StageWriter.mergeInto(spark, Seq((2, "b")).toDF("k", "v"), path,
        Seq("k"), maxRetries = 2, backoffMs = 1)
    }
    assert(e.getMessage.contains("vacuum"))
    assert(spark.read.parquet(path).count() == 1, "fail-stop, not data loss")
    StageWriter.vacuum(path, retentionMs = -1) // past retention -> reclaimed
    StageWriter.mergeInto(spark, Seq((2, "b")).toDF("k", "v"), path, Seq("k"))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("vacuum drops history claims (<= committed seq) immediately but " +
    "keeps a fresh in-flight claim inside retention") {
    val path = tmp()
    StageWriter.mergeInto(spark, Seq((1, "a")).toDF("k", "v"), path, Seq("k"))
    StageWriter.mergeInto(spark, Seq((2, "b")).toDF("k", "v"), path, Seq("k"))
    val claims = Paths.get(path + ".__claims__")
    Files.createFile(claims.resolve("3")) // a live merger mid-write
    StageWriter.vacuum(path) // default 168h retention
    val left = Files.list(claims).toArray.map(_.toString.split("/").last).toSet
    assert(left == Set("3"),
      "history reclaimed, live claim kept inside retention")
  }

  test("mergeCdcInto: bootstrap applies upserts only, then tombstones " +
    "delete on the next CAS merge") {
    val path = tmp()
    val first = Seq((1, "a", "U"), (2, "b", "U"), (9, "x", "D"))
      .toDF("k", "v", "op")
    StageWriter.mergeCdcInto(spark, first, path, Seq("k"))
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    val second = Seq((1, "x", "D"), (3, "c", "U")).toDF("k", "v", "op")
    StageWriter.mergeCdcInto(spark, second, path, Seq("k"))
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSet ==
      Set((2, "b"), (3, "c")))
    assert(StageWriter.committedSeq(path) == 2L)
  }
}
