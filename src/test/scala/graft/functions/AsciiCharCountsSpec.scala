package graft.functions

import org.apache.spark.sql.functions._
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The native single-pass alphabet counter must be COUNT-IDENTICAL to the
  * 27 length-minus-translate passes it replaces — text_entropy's oracle
  * (and charEntropy's fold order) rest on the counts being exact. */
class AsciiCharCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val alphabet = ('a' to 'z').mkString + " "

  private def legacy(t: org.apache.spark.sql.Column) =
    array(alphabet.map(ch =>
      (length(t) - length(translate(t, ch.toString, ""))).cast("long")): _*)

  private def native(t: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftx.Bridge.column(
      AsciiCharCounts(org.apache.spark.sql.graftx.Bridge.expression(
        t.cast(org.apache.spark.sql.types.StringType)), alphabet))

  test("count-identical to length-minus-translate on corpus text") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(lower(col("text")).as("t"))
      .select(legacy(col("t")).as("a"), native(col("t")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("edge cases: empty, unicode multi-byte, tabs, repeated chars") {
    import spark.implicits._
    val df = Seq("", "a", "aa bb  cc", "Σίσυφος 😀 zz", "\t\n x",
      "ÿaÿbÿ ", " " * 50, ('a' to 'z').mkString(" ")).toDF("t")
    val diff = df
      .select(legacy(col("t")).as("a"), native(col("t")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
    // charEntropy end-to-end: new counts, same fold → same doubles
    val e = df.select(graft.llm.TextAnalysis.charEntropy(col("t")).as("e"))
      .collect().map(_.getDouble(0))
    assert(e.forall(v => !v.isNaN && v >= 0.0))
  }

  test("multi-byte UTF-8 bytes never count as ASCII") {
    import spark.implicits._
    // every byte of a multi-byte codepoint is >= 0x80: a string of ONLY
    // multi-byte codepoints must count zero for every alphabet char
    val r = Seq("Σίσυφος😀ÿ").toDF("t")
      .select(native(col("t"))).head().getSeq[Long](0)
    assert(r.forall(_ == 0L))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val e = AsciiCharCounts(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("ab ba x")),
      alphabet)
    val viaEval = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaCodegen = Seq("ab ba x").toDF("t")
      .select(native(col("t"))).head().getSeq[Long](0)
    assert(viaEval == viaCodegen)
    assert(viaEval(0) == 2L && viaEval(1) == 2L && viaEval(23) == 1L &&
      viaEval(26) == 2L)
  }
}
