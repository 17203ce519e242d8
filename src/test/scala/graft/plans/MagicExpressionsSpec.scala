package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.magic.Magic

/** Native magic-day expressions: equality with the composed built-ins,
  * codegen path, SQL registration, null/type handling. */
class MagicExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native codec equals composed built-ins over a wide range") {
    MagicFunctions.register(spark)
    val df = spark.range(0, 80000, 97)
      .select((col("id") + Magic.Offset).as("n"))
    val out = df.select(
      MagicFunctions.magic_day_to_date(col("n")).as("native"),
      Magic.magicDayToDate(col("n")).as("composed"))
    assert(out.filter(col("native") =!= col("composed")).count() == 0)
    // roundtrip through the inverse expression
    val rt = out.select(
      MagicFunctions.date_to_magic_day(col("native")).as("back"))
      .agg(min("back"), max("back")).collect()(0)
    val lastStep = ((80000 - 1) / 97) * 97 // highest multiple of 97 below 80000
    assert(rt.getLong(0) == Magic.Offset &&
      rt.getLong(1) == Magic.Offset + lastStep)
  }

  test("SQL-callable after registration; known constants") {
    MagicFunctions.register(spark)
    val got = spark.sql(
      s"SELECT magic_day_to_date(693596L) AS d, " +
        s"date_to_magic_day(DATE'2024-06-25') AS n").collect()(0)
    assert(got.getDate(0).toString == "1900-01-01")
    assert(got.getLong(1) == 739062L)
  }

  test("null propagates; wrong type fails analysis") {
    MagicFunctions.register(spark)
    val r = spark.sql("SELECT magic_day_to_date(CAST(NULL AS BIGINT))")
      .collect()(0)
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT magic_day_to_date('not a number')").collect()
    }
  }

  test("extensions class registers both functions on a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // force shared session init first
    assert(prev != null)
    // getOrCreate returns the existing session (ignoring extensions), so
    // clear the default/active slots to force a NEW SparkSession over the
    // same SparkContext, then restore
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT magic_day_to_date(739062L) AS d").collect()(0)
      assert(got.getDate(0).toString == "2024-06-25")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
