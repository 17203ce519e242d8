package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r13 — budget-driven cap derivation: bucketCapFor inverts the pair
  * cost exactly on saturated histograms, clamps to the effective cap on
  * sparse ones, refuses impossible budgets; nlistFor reproduces the
  * battery constant under its own budget; and the derived cap's
  * membership is identical to the constant's on real bucketing. */
class ScaleConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairCost / bucketCapFor: exact inversion when a bucket " +
    "saturates, effective-cap clamp when none does, floor and refusal") {
    val saturated = Seq(200L, 150L, 80L, 10L)
    val budget64 = ScaleConfig.pairCost(saturated, 64)
    assert(ScaleConfig.bucketCapFor(saturated, budget64) == 64,
      "a saturated histogram inverts the budget to the exact cap")
    assert(ScaleConfig.bucketCapFor(saturated, budget64 - 1) == 63,
      "one pair under the budget drops the cap by one")
    val sparse = Seq(10L, 7L, 3L)
    assert(ScaleConfig.bucketCapFor(sparse,
      ScaleConfig.pairCost(sparse, 64)) == 10,
      "no bucket reaches the cap: the answer clamps to the largest " +
        "bucket (the EFFECTIVE cap)")
    assert(ScaleConfig.pairCost(sparse, 10) ==
      ScaleConfig.pairCost(sparse, 64),
      "the clamp spends the same budget by construction")
    assert(ScaleConfig.bucketCapFor(Seq(5L, 5L), Long.MaxValue) == 5)
    intercept[IllegalArgumentException] {
      ScaleConfig.bucketCapFor(Seq(100L, 100L), 1L) // cannot even pair
    }
  }

  test("nlistFor: power-of-two grid sizing; the battery constant 16 " +
    "reproduces under the budget it spends at both battery corpus sizes") {
    for (n <- Seq(520L, 2020L)) {
      val budget = (n * n + 15) / 16
      assert(ScaleConfig.nlistFor(n, budget) == 16,
        s"n=$n must derive nlist 16 under its own budget")
    }
    assert(ScaleConfig.nlistFor(1000L, 1000000L) == 2,
      "a budget covering all pairs sits at the floor")
    assert(ScaleConfig.nlistFor(1000000L, 1L << 22) == 262144,
      "n=1e6 with a 4M pair budget needs ~n^2/4M ~ 2^38/2^22 shards " +
        "rounded up to a power of two")
  }

  test("overflow safety: pairCost saturates (order preserved) so huge " +
    "histograms cannot wrap the budget check; nlistFor computes n² in " +
    "BigInt and refuses impractical grids instead of silently " +
    "returning the floor") {
    val huge = Seq.fill(9)(2000000000L)
    assert(ScaleConfig.pairCost(huge, Int.MaxValue) == Long.MaxValue,
      "the wrapped-negative cost would defeat the budget contract")
    assert(ScaleConfig.bucketCapFor(huge, 10000000L) < 2000,
      "a 1e7 budget over 2e9-row buckets must derive a small cap")
    // n = 1e10 rows: Long n*n wraps; BigInt math must still derive
    assert(ScaleConfig.nlistFor(10000000000L,
      (BigInt(10000000000L).pow(2) / 1024).toLong) == 1024)
    intercept[IllegalArgumentException] {
      ScaleConfig.nlistFor(10000000L, 1L) // needs ~1e14 shards
    }
  }

  test("equal pair cost means the identical capped membership on real " +
    "bucketing (the gate's reproduction argument, checked end-to-end)") {
    val planes = Dedup.portablePlanes(10, 8).grouped(5).toSeq
    val vecs = (1L to 300L).map { i =>
      (i, (0 until 8).map(j =>
        math.sin(i * 31 + j * 7).toFloat).toArray)
    }.toDF("id", "v")
    val hist = ScaleConfig.bucketHistogram(vecs, "id", "v", planes)
    val cap = 12
    val derived = ScaleConfig.bucketCapFor(hist,
      ScaleConfig.pairCost(hist, cap))
    assert(ScaleConfig.pairCost(hist, derived) ==
      ScaleConfig.pairCost(hist, cap))
    val a = Similarity.bucketMembership(vecs, "id", "v", planes, cap)
      .select("tbl", "bucket", "id")
      .as[(Int, Int, Long)].collect().toSet
    val b = Similarity.bucketMembership(vecs, "id", "v", planes, derived)
      .select("tbl", "bucket", "id")
      .as[(Int, Int, Long)].collect().toSet
    assert(a == b, "equal cost must mean the identical membership")
  }

  test("cap-LESS entry points derive their own caps (r14 default): " +
    "knnGraph / bucketMembership / semanticDedup called without a cap " +
    "equal generous explicit-cap runs on a corpus no bucket of which " +
    "can exhaust the default budget") {
    val planes = Dedup.portablePlanes(10, 8).grouped(5).toSeq
    val vecs = (1L to 300L).map { i =>
      (i, (0 until 8).map(j =>
        math.sin(i * 31 + j * 7).toFloat).toArray)
    }.toDF("id", "v")
    // derived cap clamps to the largest bucket → identical membership
    val auto = Similarity.bucketMembership(vecs, "id", "v", planes)
      .select("tbl", "bucket", "id").as[(Int, Int, Long)].collect().toSet
    val explicit = Similarity.bucketMembership(vecs, "id", "v", planes,
        bucketCap = 100000)
      .select("tbl", "bucket", "id").as[(Int, Int, Long)].collect().toSet
    assert(auto == explicit,
      "cap-less membership must equal the effectively-uncapped run")
    val gAuto = Similarity.knnGraph(vecs, "id", "v", planes, k = 3)
      .collect().map(_.toSeq).toSet
    val gExp = Similarity.knnGraph(vecs, "id", "v", planes, k = 3,
        bucketCap = 100000)
      .collect().map(_.toSeq).toSet
    assert(gAuto == gExp, "cap-less knnGraph must equal the explicit run")
    // semanticDedup sizes its IVF grid from the corpus count: 300 rows
    // under the 64M default budget needs nlist 2 (the floor)
    val sd = Similarity.semanticDedup(vecs, "id", "v", tau = 0.99)
    assert(sd.select("list_id").distinct().count() <= 2,
      "300 vectors under the default budget must derive the floor grid")
    assert(sd.count() == 300L)
  }
}
