package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The native count-min bucket row must be BIT-IDENTICAL per hash row to
  * the legacy Column chain
  * `pmod(conv(substring(md5(key), 8i+1, 8), 16, 10), w)` — the CMS
  * oracles replay the exact counters from this derivation. */
class Md5BucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def legacy(key: org.apache.spark.sql.Column, d: Int, w: Int) =
    array((0 until d).map(i =>
      pmod(conv(substring(md5(key.cast(StringType)), i * 8 + 1, 8), 16, 10)
        .cast("long"), lit(w.toLong)).cast("int")): _*)

  test("bit-identical to the legacy chain on corpus keys, all d rows") {
    import spark.implicits._
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val probes = li.select(col("l_partkey").cast("string").as("s"))
      .unionByName(li.select(concat_ws("|", col("l_returnflag"),
        col("l_shipdate").cast("string")).as("s")))
    for ((d, w) <- Seq((4, 2048), (3, 64), (1, 7))) {
      val diff = probes
        .select(legacy(col("s"), d, w).as("a"),
          CountMin.buckets(col("s"), d, w).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0L, s"d=$d w=$w")
    }
  }

  test("edge cases: empty string, unicode, non-string input") {
    import spark.implicits._
    val df = Seq("", "a", "Σίσυφος 😀 tab\t", " ", "0", "ÿ" * 100).toDF("s")
    val bad = df.select(legacy(col("s"), 4, 1024).as("a"),
        CountMin.buckets(col("s"), 4, 1024).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0L)
    val n = Seq(42L, -7L).toDF("v")
      .select(legacy(col("v"), 2, 97).as("a"),
        CountMin.buckets(col("v"), 2, 97).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0L)
    // null key: the whole array nulls out either way for the CONSUMER
    // (legacy produced an array of null elements whose aggregation was
    // equally undefined; no gate sketches null keys) — pin only that the
    // native form is null, never a bogus bucket row
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(CountMin.buckets(col("s"), 4, 1024).as("b")).head()
    assert(nulls.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val e = Md5Buckets(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")),
      4, 2048)
    val viaEval = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    val viaCodegen = Seq("hello world").toDF("s")
      .select(CountMin.buckets(col("s"), 4, 2048)).head()
      .getSeq[Int](0)
    assert(viaEval == viaCodegen)
  }
}
