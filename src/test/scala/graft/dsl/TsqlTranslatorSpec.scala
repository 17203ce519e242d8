package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.extract.ReadPlan

/** Translator spec driven by the EXACT config fragments shipped in the
  * reference's tables.csv (cited per test). */
class TsqlTranslatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // raw all-string source shaped like trelcons1f (magic encodings)
  private lazy val src = Seq(
    ("011 ", " A01", "739062", "70000", "10"),
    ("012 ", " B02", "739000", "123456", "25"))
    .toDF("compania", "subgiro", "fecmodi", "horamodi", "codfvtas")

  test("ID_COLUMN fragment: rtrim(ltrim(x)) + '|' + rtrim(ltrim(y)) " +
    "(tables.csv:2)") {
    val t = TsqlTranslator.translate(
      "rtrim(ltrim(compania)) + '|' + rtrim(ltrim(subgiro))")
    assert(t == "concat(rtrim(ltrim(compania)), '|', rtrim(ltrim(subgiro)))")
    val got = src.selectExpr(s"$t as id").as[String].collect().toSeq
    assert(got == Seq("011|A01", "012|B02"))
  }

  test("COLUMNS fragment: dbo.func_cas_todatetime(fecmodi,horamodi) " +
    "lastmodifydate (tables.csv:2)") {
    val cols = TsqlTranslator.translateProjection(
      "dbo.func_cas_todatetime(fecmodi,horamodi) lastmodifydate, compania")
    val got = src.selectExpr(cols: _*)
      .select(date_format(col("lastmodifydate"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect().toSeq
    assert(got == Seq("2024-06-25 07:00:00", "2024-04-24 12:34:56"))
  }

  test("todateint + varchar casts: dbo.func_cas_todateint(f) + '|' + " +
    "cast(x as varchar(20)) (tables.csv mvtasvend row)") {
    val t = TsqlTranslator.translate(
      "dbo.func_cas_todateint(fecmodi) + '|' + cast(codfvtas as varchar(20))")
    val got = src.selectExpr(s"$t as id").as[String].collect().toSeq
    assert(got == Seq("20240625|10", "20240424|25"))
  }

  test("unknown dbo.func fails loudly") {
    intercept[RuntimeException] {
      TsqlTranslator.translate("dbo.func_cas_mystery(x)")
    }
  }

  test("FILTER_EXP IN-subquery via ReadPlan.applySql (tables.csv:2 shape)") {
    val filter = TsqlTranslator.translate(
      "compania in (select compania from dbo.mcompa1f b where b.flgbi = 'a')")
    assert(!filter.contains("dbo."))
    val mcompa = Seq(("011 ", "a"), ("012 ", "x")).toDF("compania", "flgbi")
    val plan = ReadPlan(Seq("trim(compania) as c"), Seq(filter), None, 1, None)
    val got = plan.applySql(spark, src, "trelcons1f",
      Map("mcompa1f" -> mcompa)).as[String].collect().toSeq
    assert(got == Seq("011")) // only flgbi='a' companies survive
  }
}
