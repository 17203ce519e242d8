package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** KmhSample: the kept set IS the k smallest by (hash, key1, key2) — exact
  * vs a naive sort, exactly partitioning-invariant (set semantics), and
  * complete below k. */
class KmhSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-uniform hash (Knuth multiplicative, kept positive)
  private def mix(i: Long): Long = (i * 2654435761L) & 0x7fffffffffffffL

  private def rows(n: Int): Seq[(Long, Long, Long, Double)] =
    (1 to n).map(i => (mix(i), i.toLong, (i % 7).toLong, i * 1.5))

  private def sampled(n: Int, k: Int, parts: Int): Seq[Double] = {
    val df = rows(n).toDF("h", "k1", "k2", "v").repartition(parts)
    df.agg(KmhSample.sample(col("h"), col("k1"), col("k2"), col("v"), k))
      .head().getSeq[Double](0)
  }

  test("kept values = k smallest by (hash, key1, key2), in sort order") {
    val expect = rows(500).sortBy(r => (r._1, r._2, r._3)).take(64).map(_._4)
    assert(sampled(500, 64, 4) == expect)
  }

  test("exactly partitioning-invariant: 1 vs 8 partitions agree") {
    assert(sampled(1000, 128, 1) == sampled(1000, 128, 8))
  }

  test("below k the sample is the whole input") {
    assert(sampled(50, 64, 4).sorted == (1 to 50).map(_ * 1.5))
  }

  test("hash ties broken by keys — no row dropped") {
    val df = Seq((7L, 1L, 0L, 10.0), (7L, 2L, 0L, 20.0), (7L, 3L, 0L, 30.0))
      .toDF("h", "k1", "k2", "v")
    val got = df.agg(KmhSample.sample(col("h"), col("k1"), col("k2"),
      col("v"), 2)).head().getSeq[Double](0)
    assert(got == Seq(10.0, 20.0))
  }

  test("grouped sampling stays per-group (no cross-group leakage)") {
    val df = rows(300).toDF("h", "k1", "k2", "v")
      .withColumn("g", col("k2") % 2)
    val got = df.groupBy("g")
      .agg(KmhSample.sample(col("h"), col("k1"), col("k2"), col("v"), 32)
        .as("vals"))
      .select(col("g"), size(col("vals")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 32, 1L -> 32))
    val expect0 = rows(300).filter(_._3 % 2 == 0)
      .sortBy(r => (r._1, r._2, r._3)).take(32).map(_._4)
    val got0 = df.filter(col("g") === 0)
      .agg(KmhSample.sample(col("h"), col("k1"), col("k2"), col("v"), 32))
      .head().getSeq[Double](0)
    assert(got0 == expect0)
  }
}
