package graft.functions

import graft.TestSpark
import graft.llm.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vec_dot expression must be a drop-in for the HOF fold:
  * bit-identical doubles (so every oracle stays valid), matching null
  * semantics, analysis-time type rejection, and it must actually run
  * inside whole-stage codegen. */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(d => ((i * 31 + d * 7) % 17 - 8) / 3.0f))
    }

  test("vec_dot is bit-identical to the HOF fold on 1000 pseudo-random pairs") {
    // spark.range source (NOT a LocalRelation): the projection must run on
    // the executor codegen path, not get constant-folded on the driver
    val df = spark.range(1000)
      .withColumn("x", expr(
        "transform(sequence(0, 63), d -> cast(((id*31 + d*7) % 17 - 8) / 3.0 as float))"))
      .withColumn("y", expr(
        "transform(sequence(0, 63), d -> cast(((id*13 + d*5) % 23 - 11) / 7.0 as float))"))
      .select(
        VectorOps.vecDot(col("x"), col("y")).as("native"),
        Similarity.dotHof(col("x"), col("y")).as("hof"))
    // compare raw bits: "close" is not good enough for oracle parity
    val rows = df.collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics mirror zip_with/aggregate: null array, null element, length skew") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // plain
      (2L, null, Seq(1.0f)), // null array
      (3L, Seq(1.0f, 2.0f), Seq(1.0f)) // length mismatch
    ).toDF("id", "x", "y")
    val withNullElem = df.union(
      Seq((4L, Seq(1.0f), Seq(1.0f))).toDF("id", "x", "y")
        .withColumn("y", array(when(col("id") > 0, lit(null)).cast("float"))))
    val got = withNullElem
      .select(col("id"), VectorOps.vecDot(col("x"), col("y")).as("d"),
        Similarity.dotHof(col("x"), col("y")).as("h"))
      .orderBy("id").collect()
    assert(got.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ==
      Seq(11.0, null, null, null))
    // HOF twin agrees row-for-row
    got.foreach(r => assert(r.isNullAt(1) == r.isNullAt(2)))
  }

  test("array<double> input is rejected at analysis, never silently cast") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(VectorOps.vecDot(col("v"), col("v"))).collect()
    }
    assert(ex.getMessage.contains("vec_dot"))
  }

  test("vec_dot registers for SQL and runs inside WholeStageCodegen") {
    VectorOps.ensureRegistered(spark)
    VectorOps.ensureRegistered(spark) // idempotent
    spark.range(10)
      .withColumn("v", expr(
        "transform(sequence(0, 7), d -> cast(id * d as float))"))
      .createOrReplaceTempView("vops_t")
    val out = spark.sql("SELECT id, vec_dot(v, v) AS d FROM vops_t")
    val hof = spark.table("vops_t")
      .select(col("id"), Similarity.dotHof(col("v"), col("v")).as("d"))
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap ==
      hof.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap)
    // the projection containing vec_dot must sit inside a codegen stage —
    // a CodegenFallback expression would keep it out
    val stages = out.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    }
    assert(stages.exists(_.contains("vec_dot")),
      s"vec_dot not inside WholeStageCodegen:\n${out.queryExecution.executedPlan}")
  }

  test("vec_sqdist is bit-identical to the HOF (x-y)^2 fold and runs " +
    "inside WholeStageCodegen") {
    val df = spark.range(1000)
      .withColumn("x", expr(
        "transform(sequence(0, 7), d -> cast(((id*31 + d*7) % 17 - 8) / 3.0 as double))"))
      .withColumn("y", expr(
        "transform(sequence(0, 7), d -> cast(((id*13 + d*5) % 23 - 11) / 7.0 as double))"))
      .select(
        VectorOps.vecSqDist(col("x"), col("y")).as("native"),
        aggregate(zip_with(col("x"), col("y"), (p, q) => (p - q) * (p - q)),
          lit(0.0), (acc, v) => acc + v).as("hof"))
    val rows = df.collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // codegen check on a native-only projection (the HOF twin column
    // above is CodegenFallback and would veto the shared stage)
    val solo = spark.range(100)
      .withColumn("x", expr(
        "transform(sequence(0, 7), d -> cast(d as double))"))
      .select(VectorOps.vecSqDist(col("x"), col("x")).as("d"))
    solo.collect()
    val stages = solo.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    }
    assert(stages.exists(_.contains("vec_sqdist")),
      s"vec_sqdist not inside WholeStageCodegen")
    // null + length-mismatch semantics mirror the HOF form
    val edge = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 5.0)),
      (2L, null, Seq(1.0)),
      (3L, Seq(1.0), Seq(1.0, 2.0))
    ).toDF("id", "x", "y")
      .select(col("id"), VectorOps.vecSqDist(col("x"), col("y")).as("d"))
      .orderBy("id").collect()
    assert(edge.map(r => if (r.isNullAt(1)) null else r.getDouble(1))
      .toSeq == Seq(13.0, null, null))
  }

  test("extensions entry point injects vec_dot into a fresh session") {
    val s2 = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // newSession shares the extension-injected registry
      val df = s2.sql("SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      assert(df.collect().head.getDouble(0) == 11.0)
    } finally {
      // do NOT stop(): the SparkContext is shared with TestSpark's session
    }
  }
}
