package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sink.StageWriter

/** D185 — scan guard: multi-scan totals, refusal names offenders,
  * pass returns the planned bytes, non-file plans contribute nothing. */
class ScanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a join plan totals BOTH scans; the refusal message names the " +
    "bigger one first; within budget returns the total") {
    val tmp = java.nio.file.Files.createTempDirectory("guard")
    try {
      val big = tmp.resolve("big").toString
      val small = tmp.resolve("small").toString
      (1 to 20000).map(i => (i.toLong, i % 50)).toDF("k", "v")
        .write.parquet(big)
      (0 to 49).map(i => (i, s"d$i")).toDF("v", "name")
        .write.parquet(small)
      val joined = spark.read.parquet(big)
        .join(spark.read.parquet(small), "v")
      val ss = ScanGuard.scans(joined)
      assert(ss.size == 2)
      val total = ss.map(_.bytes).sum
      assert(ScanGuard.plannedBytes(joined) == total)
      val e = intercept[ScanGuard.ScanBudgetExceeded] {
        ScanGuard.assertBounded(joined, total - 1)
      }
      assert(e.getMessage.contains("big"),
        "the refusal must name the offending scan")
      assert(ScanGuard.assertBounded(joined, total) == total)
      // a pure in-memory plan has no file scans — always within budget
      assert(ScanGuard.plannedBytes(Seq(1, 2).toDF("x")) == 0L)
    } finally StageWriter.deleteRecursively(tmp)
  }

  test("hive-layout partition filters are credited: the guard counts " +
    "only the partitions the physical scan will read") {
    val tmp = java.nio.file.Files.createTempDirectory("guardpart")
    try {
      val p = tmp.resolve("t").toString
      (1 to 10000).map(i => (i.toLong, i % 8, s"pad-$i-padding"))
        .toDF("k", "part", "pad")
        .write.partitionBy("part").parquet(p)
      val full = ScanGuard.plannedBytes(spark.read.parquet(p))
      val one = ScanGuard.plannedBytes(
        spark.read.parquet(p).filter(col("part") === 3))
      assert(one > 0 && one < full / 4,
        s"one of 8 partitions must be credited, got $one of $full")
      // a data-column filter prunes nothing at file granularity
      assert(ScanGuard.plannedBytes(
        spark.read.parquet(p).filter(col("k") > 100)) == full)
      // the credited plan passes a budget the unpruned one refuses
      val budget = (full + one) / 2
      intercept[ScanGuard.ScanBudgetExceeded] {
        ScanGuard.assertBounded(spark.read.parquet(p), budget)
      }
      assert(ScanGuard.assertBounded(
        spark.read.parquet(p).filter(col("part") === 3), budget) == one)
    } finally StageWriter.deleteRecursively(tmp)
  }
}
