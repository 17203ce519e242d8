package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** KMV sketch: exact below k, partition-invariant (set semantics), and
  * within the theoretical error envelope above k. */
class KmvDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = graft.llm.Dedup.PortableP
  private def est(df: org.apache.spark.sql.DataFrame, k: Int): Double =
    df.agg(KmvDistinct.kmv(
      graft.llm.Dedup.portableWordHash(col("v")), k, P.toDouble))
      .head().getDouble(0)

  test("fewer than k distinct values -> the sketch IS the exact count") {
    val df = Seq.tabulate(100)(i => i % 17).toDF("v") // 17 distinct, k=64
    assert(est(df, 64) == 17.0)
  }

  test("estimate is invariant to partitioning (mergeable set semantics)") {
    val vals = (1 to 5000).map(_.toLong)
    val a = est(vals.toDF("v").repartition(1), 64)
    val b = est(vals.toDF("v").repartition(13), 64)
    assert(a == b)
  }

  test("estimate lands inside the KMV error envelope") {
    val n = 20000
    val e = est((1 to n).map(_.toLong).toDF("v"), 256)
    val relErr = math.abs(e - n) / n
    assert(relErr < 3.0 / math.sqrt(256), s"est $e relErr $relErr")
  }
}
