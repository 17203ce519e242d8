package graft.run

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.ScanGuard

/** D185 session enforcement — the ambient scan-budget rail: an unpruned
  * ad-hoc query through the pipeline path refuses NAMING the scan before
  * any task launches; pruned plans and per-table overrides pass; the
  * scheduled transform path refuses the same way and the run log records
  * it. Budgets are root-scoped so suites never interfere. */
class ScanBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("GroupScheduler.submit refuses an unpruned scan naming it; a " +
    "partition-pruned plan passes the same budget; per-table override " +
    "beats the root default; clearUnder disarms") {
    val tmp = Files.createTempDirectory("budget")
    try {
      val p = tmp.resolve("t").toString
      (1 to 20000).map(i => (i.toLong, i % 8, s"pad-$i-x"))
        .toDF("k", "part", "pad")
        .write.partitionBy("part").parquet(p)
      val full = ScanGuard.plannedBytes(spark.read.parquet(p))
      val one = ScanGuard.plannedBytes(
        spark.read.parquet(p).filter(col("part") === 3))
      ScanBudget.setDefaultUnder(tmp.toString, (full + one) / 2)

      val e = intercept[ScanGuard.ScanBudgetExceeded] {
        GroupScheduler.submit(spark.read.parquet(p))(_.count())
      }
      assert(e.getMessage.contains("/t") &&
        e.getMessage.contains("refusing"),
        s"refusal must name the scan: ${e.getMessage}")
      // the pruned plan passes the SAME budget, and actually runs
      assert(GroupScheduler.submit(
        spark.read.parquet(p).filter(col("part") === 3))(_.count()) ==
        2500L)
      // a per-table override admits the full scan while the root
      // default would refuse it
      ScanBudget.setFor(p, full + 1)
      assert(GroupScheduler.submit(spark.read.parquet(p))(_.count()) ==
        20000L)
      ScanBudget.clearUnder(tmp.toString)
      assert(GroupScheduler.submit(spark.read.parquet(p))(_.count()) ==
        20000L, "cleared budgets must disarm the rail")
    } finally graft.sink.StageWriter.deleteRecursively(tmp)
  }

  test("the scheduled transform path refuses under budget and the run " +
    "log records the refusal; a raised budget lets the same job land") {
    val tmp = Files.createTempDirectory("budget2")
    try {
      val raw = tmp.resolve("raw").toString
      val stage = tmp.resolve("stage").toString
      (1 to 5000).map(i => (s"k$i", s"v$i")).toDF("id", "payload")
        .write.parquet(raw)
      val cfg = graft.config.TableConfig("*",
        graft.config.LoadType.Full, "auto", "", 0, 0,
        "", "", "", "", "", "G1", "dbo", "t", "m", "m_t", "a", "1")
      val meta = Seq(
        graft.config.ColumnMetadata("id", 1, false, true, false, false,
          "string", "t", "id"),
        graft.config.ColumnMetadata("payload", 2, false, false, false,
          false, "string", "t", "payload"))
      ScanBudget.setDefaultUnder(tmp.toString, 1L) // nothing passes 1 byte
      val recs = GroupScheduler.runDetailed(Seq(
        ("t", () => TablePipeline.transformWithStatus(
          spark, raw, stage, cfg, meta))), maxConcurrency = 1)
      assert(recs.head.status == "FAILED" &&
        recs.head.error.contains("refusing"),
        s"run log must record the refusal, got ${recs.head}")
      assert(!Files.exists(tmp.resolve("stage")),
        "nothing may be written after a refusal")
      ScanBudget.setDefaultUnder(tmp.toString, 64L * 1024 * 1024)
      val ok = GroupScheduler.runDetailed(Seq(
        ("t", () => TablePipeline.transformWithStatus(
          spark, raw, stage, cfg, meta))), maxConcurrency = 1)
      assert(ok.head.status == "SUCCESS" && ok.head.rows == 5000L)
    } finally {
      ScanBudget.clearUnder(tmp.toString)
      graft.sink.StageWriter.deleteRecursively(tmp)
    }
  }
}
