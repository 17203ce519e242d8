package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** Structural plan hygiene for the headline queries — the properties
  * PlanAudit eyeballs, asserted: filters REACH the parquet scan
  * (PushedFilters) and the scan reads only the referenced columns
  * (pruned ReadSchema). A scan that reads every column for a 4-column
  * aggregate is wrong at any scale; at 100 TB it is the whole job. */
class PushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** All file scans in a query's executed plan (walking through AQE). */
  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("q1_pricing: shipdate filter pushed to the scan, schema pruned") {
    val ss = scans("q1_pricing")
    assert(ss.nonEmpty)
    val li = ss.find(_.relation.location.inputFiles.exists(
      _.contains("lineitem"))).get
    assert(li.dataFilters.nonEmpty, "filter must reach the lineitem scan")
    val read = li.requiredSchema.fieldNames.toSet
    assert(read.contains("l_shipdate") && read.contains("l_quantity"))
    // the 11-column table is pruned to just the referenced columns
    assert(read.size <= 6, s"expected pruned ReadSchema, got $read")
  }

  test("q3_topk: every scan carries its filter and a pruned schema") {
    val ss = scans("q3_topk")
    assert(ss.size >= 3)
    ss.foreach { s =>
      assert(s.requiredSchema.fieldNames.length <= 4,
        s"unpruned scan: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
    // the three filtered tables all push their predicates
    assert(ss.count(_.dataFilters.nonEmpty) >= 3)
  }

  test("a1_projection: a 4-column projection reads 4 columns, no filters") {
    val ss = scans("a1_projection")
    assert(ss.nonEmpty)
    assert(ss.head.requiredSchema.fieldNames.length <= 5)
  }

  test("q19_discount: cross-side OR pushes each side's envelope to its scan") {
    val ss = scans("q19_discount")
    val li = ss.find(_.relation.location.inputFiles.exists(
      _.contains("lineitem"))).get
    val p = ss.find(_.relation.location.inputFiles.exists(
      _.contains("part"))).get
    // Catalyst extracts the per-side disjunction from the OR-of-conjuncts
    // that spans the join: quantity envelope → lineitem scan, brand/size
    // envelope → part scan
    assert(li.dataFilters.exists(_.toString.contains("l_quantity")),
      s"quantity envelope missing from lineitem scan: ${li.dataFilters}")
    assert(p.dataFilters.exists(_.toString.contains("p_brand")),
      s"brand envelope missing from part scan: ${p.dataFilters}")
    assert(li.requiredSchema.fieldNames.length <= 4)
    assert(p.requiredSchema.fieldNames.length <= 3)
  }

  test("q_bloom_join: the bloom probe filters the fact scan's row stream") {
    val df = graft.SparkEntry.queries("q_bloom_join")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from optimized plan:\n$plan")
  }

  test("hive-style partition directories are PRUNED, not filtered: a " +
    "partition predicate cuts the files the scan even lists") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("prune").toString
    spark.range(1000)
      .withColumn("p", (col("id") % 10).cast("string"))
      .write.partitionBy("p").parquet(s"$root/t")
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          all(q.plan)
        case other => other.children.flatMap(all)
      })
      all(df.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numFiles").value).sum
    }
    val t = spark.read.parquet(s"$root/t")
    val all = filesRead(t.groupBy("p").count())
    val one = filesRead(t.filter(col("p") === "3").groupBy("p").count())
    assert(all >= 10, s"expected >=10 partition dirs, read $all files")
    assert(one * 5 <= all,
      s"partition filter must prune listed files: $one of $all read")
    graft.sink.StageWriter.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
