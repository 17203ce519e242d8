package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Mergeable KMV sketch state (D120): merge ≡ rebuild, bounded state,
  * estimate consistency with the one-shot aggregator. */
class KmvRollupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8
  private val P = 1000003L

  private def hashed(n: Int, seed: Int) =
    (1 to n).map(i => ("g", ((i.toLong * 2654435761L + seed) % P + P) % P))
      .toDF("g", "h")

  test("merging per-batch states equals the one-shot sketch over the " +
    "union, and the state never exceeds k") {
    val a = hashed(500, 1)
    val b = hashed(300, 77777)
    val oneShot = a.unionByName(b).groupBy("g")
      .agg(KmvDistinct.sketch(col("h"), K).as("st"))
      .select(col("st")).head().getSeq[Long](0)
    val merged = a.groupBy("g").agg(KmvDistinct.sketch(col("h"), K).as("st"))
      .unionByName(
        b.groupBy("g").agg(KmvDistinct.sketch(col("h"), K).as("st")))
      .groupBy("g").agg(KmvDistinct.mergeStates(col("st"), K).as("st"))
      .select(col("st")).head().getSeq[Long](0)
    assert(merged == oneShot)
    assert(merged.length <= K)
  }

  test("estimate over a stored state matches the one-shot KmvDistinct " +
    "estimate") {
    val df = hashed(2000, 5)
    val direct = df.groupBy("g")
      .agg(KmvDistinct.kmv(col("h"), K, P.toDouble).as("e"))
      .head().getDouble(1)
    val viaState = df.groupBy("g")
      .agg(KmvDistinct.sketch(col("h"), K).as("st"))
      .select(KmvDistinct.estimate(col("st"), K, P.toDouble).as("e"))
      .head().getDouble(0)
    assert(math.abs(direct - viaState) < 1e-9)
  }

  test("below k distinct values the state IS the exact distinct set") {
    val df = Seq(("g", 5L), ("g", 3L), ("g", 5L), ("g", 9L)).toDF("g", "h")
    val st = df.groupBy("g").agg(KmvDistinct.sketch(col("h"), K).as("st"))
      .head().getSeq[Long](1)
    assert(st == Seq(3L, 5L, 9L))
  }
}
