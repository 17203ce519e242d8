package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** Hive-partitioned stage layout: a filter on the partition column reaches
  * the scan as a PARTITION filter (directory-level pruning — zero data
  * files of other partitions are even listed into the scan), not a
  * post-scan row filter. */
class PartitionPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : FileSourceScanExec = {
    df.collect() // finalize AQE
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).head
  }

  test("partition-column filter becomes a PartitionFilter and prunes " +
      "directories; a data-column filter does not") {
    val dir = java.nio.file.Files.createTempDirectory("ppart").toString
    val df = (0 until 1000)
      .map(i => (i.toLong, s"t${i % 4}", i * 1.0)).toDF("id", "ptype", "v")
    StageWriter.overwrite(df, s"$dir/t", partitionBy = Seq("ptype"))

    val pruned = spark.read.parquet(s"$dir/t").filter($"ptype" === "t2")
    val scan = scanOf(pruned)
    assert(scan.partitionFilters.exists(_.toString.contains("ptype")),
      s"expected a partition filter, got ${scan.partitionFilters}")
    assert(pruned.count() == 250)
    // only t2's files are touched
    val touched = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(touched.nonEmpty && touched.forall(_.contains("ptype=t2")),
      s"scan touched foreign partitions: ${touched.mkString(",")}")

    // a non-partition filter stays a data filter: all partitions listed
    val unpruned = spark.read.parquet(s"$dir/t").filter($"id" < 10)
    val scan2 = scanOf(unpruned)
    assert(!scan2.partitionFilters.exists(_.toString.contains("ptype")))
    StageWriter.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
