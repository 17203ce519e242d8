package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.TestSpark

/** Golden-case specs for the fn_transform_* DSL (SURVEY §2B, §5.1).
  * Boundary values pinned from the reference: magic threshold 100000,
  * offset 693596 (= 1900-01-01), FoxPro byte codes. */
class DslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame, dsl: String,
      typ: String = "string"): Any = {
    val ctx = DslContext(df.columns.toSet,
      graft.config.SparkTypes.fromConfig(typ),
      Some(java.sql.Timestamp.valueOf("2024-06-25 07:00:00")))
    df.select(Transformations.compile(dsl, ctx).cast(
      graft.config.SparkTypes.fromConfig(typ)).as("r")).collect()(0).get(0)
  }

  // ---- parser ----
  test("top-level comma split respects parens and quotes") {
    assert(Parser.splitTopLevel("a, f(b, c), 'x, y', d") ==
      List("a", "f(b, c)", "'x, y'", "d"))
  }
  test("nested fn parse") {
    val e = Parser.parse(
      "fn_transform_Date_to_String(fn_transform_DateMagic(f, yyyyMMdd), yyyyMM)")
    assert(e == FnCall("Date_to_String",
      List(FnCall("DateMagic", List(Token("f"), Token("yyyyMMdd"))),
        Token("yyyyMM"))))
  }

  // ---- ClearString ----
  test("ClearString maps null markers to default literal") {
    val df = Seq("  x  ", "", "  ", "None", "NULL", "null").toDF("c")
    val got = df.select(Transformations.compile(
      "fn_transform_ClearString(c, $D)", DslContext(Set("c"))).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("x", "D", "D", "D", "D", "D"))
  }
  test("ClearString null input without default -> null") {
    val df = Seq[Option[String]](None).toDF("c")
    assert(one(df, "fn_transform_ClearString(c)") == null)
  }

  // ---- magic date boundaries (reference light_transform.py:922-935) ----
  test("DateMagic: 693596 decodes to 1900-01-01") {
    val df = Seq("693596").toDF("c")
    assert(one(df, "fn_transform_DateMagic(c, yyyyMMdd)", "date").toString
      == "1900-01-01")
  }
  test("DateMagic: 100000 is NOT magic (parsed as yyyyMMdd -> null), 100001 IS") {
    val df1 = Seq("100000").toDF("c")
    assert(one(df1, "fn_transform_DateMagic(c, yyyyMMdd, to_null)", "date") == null)
    val df2 = Seq("100001").toDF("c")
    // 100001 - 693596 = -593595 days before 1900-01-01 — decoded, not null
    assert(one(df2, "fn_transform_DateMagic(c, yyyyMMdd, to_null)", "date") != null)
  }
  test("DateMagic: ISO-format string path") {
    val df = Seq("2024-06-25").toDF("c")
    assert(one(df, "fn_transform_DateMagic(c, yyyy-MM-dd)", "date").toString
      == "2024-06-25")
  }
  test("DateMagic roundtrip against scalar inverse") {
    import graft.magic.Magic
    val d = java.time.LocalDate.of(2024, 6, 25)
    val magic = Magic.toMagicDay(d) // 739062 per FIXTURES A2
    assert(magic == 739062L)
    assert(Magic.fromMagicDay(magic) == d)
    val df = Seq(magic.toString).toDF("c")
    assert(one(df, "fn_transform_DateMagic(c, yyyyMMdd)", "date").toString
      == "2024-06-25")
  }

  // ---- magic time / DatetimeMagic ----
  test("DatetimeMagic combines magic day + HHMMSS") {
    val df = Seq(("739062", "70000")).toDF("d", "t") // lpad -> 07:00:00
    assert(one(df, "fn_transform_DatetimeMagic(d, t, yyyyMMdd)",
      "timestamp").toString == "2024-06-25 07:00:00.0")
  }
  test("DatetimeMagic null time -> midnight") {
    val df = Seq(("739062", null: String)).toDF("d", "t")
    assert(one(df, "fn_transform_DatetimeMagic(d, t, yyyyMMdd)",
      "timestamp").toString == "2024-06-25 00:00:00.0")
  }

  // ---- Datetime / clock injection ----
  test("Datetime() uses injected clock") {
    val df = Seq(1).toDF("x")
    assert(one(df, "fn_transform_Datetime()", "timestamp").toString
      == "2024-06-25 07:00:00.0")
  }

  // ---- PeriodMagic ----
  test("PeriodMagic pads month, nulls -> 190001") {
    val df = Seq(("6", "2024"), (null, "2024"), ("6", null))
      .toDF("m", "y")
    val got = df.select(Transformations.compile(
      "fn_transform_PeriodMagic(m, y)", DslContext(Set("m", "y"))).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("202406", "190001", "190001"))
  }

  // ---- ByteMagic (reference light_transform.py:1204-1213) ----
  test("ByteMagic decodes all FoxPro encodings") {
    val df = Seq("T", "F", "0x54", "0x46", "84", "70", "garbage",
      null.asInstanceOf[String]).toDF("c")
    val got = df.select(Transformations.compile(
      "fn_transform_ByteMagic(c, $F)", DslContext(Set("c"))).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("T", "F", "T", "F", "T", "F", "F", "F"))
  }

  // ---- Case rules ----
  test("Case keeps unmatched original; Case_with_default composite AND/OR") {
    val df = Seq(("03", "003"), ("03", "004"), ("09", "003")).toDF("a", "b")
    val comp = df.select(Transformations.compile(
      "fn_transform_Case_with_default(a&b, 03&003->T, $F)",
      DslContext(Set("a", "b"))).as("r")).as[String].collect().toSeq
    assert(comp == Seq("T", "F", "F"))
    val keep = Seq("X").toDF("a")
    assert(one(keep, "fn_transform_Case(a, 01|02->low)") == "X")
  }

  // ---- numeric/int/bool casts ----
  test("Numeric uses configured decimal precision") {
    val df = Seq("123.456").toDF("c")
    assert(one(df, "fn_transform_Numeric(c)", "numeric(13,2)").toString
      == "123.46")
  }

  // ---- error degradation (reference light_transform.py:718-730) ----
  test("unknown function degrades to typed null and is tallied") {
    val meta = Seq(
      graft.config.ColumnMetadata("ok", 1, false, false, false, false,
        "string", "t", "fn_transform_ClearString(c)"),
      graft.config.ColumnMetadata("bad", 2, false, false, false, false,
        "integer", "t", "fn_transform_Bogus(c)"))
    val compiled = graft.transform.TransformationEngine.compile(
      meta, Seq("c"))
    assert(compiled.errors.keySet == Set("bad"))
    val df = Seq("x").toDF("c")
    val out = df.select(compiled.columns: _*).collect()(0)
    assert(out.getAs[String]("ok") == "x")
    assert(out.isNullAt(1))
  }

  test(">50% degraded columns fails the transform") {
    val meta = Seq(
      graft.config.ColumnMetadata("b1", 1, false, false, false, false,
        "string", "t", "fn_transform_Bogus(c)"),
      graft.config.ColumnMetadata("b2", 2, false, false, false, false,
        "string", "t", "fn_transform_Bogus2(c)"),
      graft.config.ColumnMetadata("ok", 3, false, false, false, false,
        "string", "t", ""))
    val df = Seq("x").toDF("c")
    intercept[RuntimeException] {
      graft.transform.TransformationEngine.apply(df, meta)
    }
  }
}
