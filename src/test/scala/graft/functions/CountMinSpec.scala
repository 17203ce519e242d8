package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Count-min sketch properties: estimates never undercount, are exact in
  * the collision-free regime, and are invariant to partitioning (the merge
  * is element-wise sum, so HOW the data splits cannot change the result). */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 4
  private val w = 64

  private def estimates(keys: Seq[String], parts: Int): Map[String, Long] = {
    val df = keys.toDF("k").repartition(parts)
    val sk = CountMin.sketch(df, col("k"), d, w)
    df.distinct().crossJoin(broadcast(sk))
      .select(col("k"), CountMin.estimate(col("cms"), col("k"), d, w))
      .as[(String, Long)].collect().toMap
  }

  test("estimate >= true count, exact for few distinct keys") {
    val keys = Seq.fill(100)("alpha") ++ Seq.fill(37)("beta") ++ Seq("gamma")
    val est = estimates(keys, 4)
    assert(est("alpha") >= 100 && est("beta") >= 37 && est("gamma") >= 1)
    // 3 keys into 4×64 counters: some row is collision-free for each key
    // with near-certainty under the pinned hashes — assert exactness
    assert(est == Map("alpha" -> 100L, "beta" -> 37L, "gamma" -> 1L))
  }

  test("partitioning-invariant: 1-partition and 8-partition sketches agree") {
    val keys = (1 to 500).map(i => s"k${i % 90}")
    assert(estimates(keys, 1) == estimates(keys, 8))
  }
}
