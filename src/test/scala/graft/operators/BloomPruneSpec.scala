package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bloom-filter semi-join pruning: result ≡ plain join (false positives are
  * removed by the join), the probe actually prunes, and the scalar-subquery
  * SQL form plans the probe into the fact-side filter. */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact = (1L to 10000L).map(k => (k % 997, s"v$k"))
    .toDF("fk", "payload")
  private def dim = (1L to 50L).map(k => (k, s"d$k")).toDF("dk", "name")

  test("prunedJoin equals the plain inner join exactly") {
    val got = BloomPrune.prunedJoin(fact, dim, "fk", "dk")
      .select("fk", "payload", "name")
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() == want.count()) // duplicates preserved too
  }

  test("the bloom probe prunes non-matching fact rows before the join") {
    val bloom = BloomPrune.buildBloom(dim, "dk", 1000L, 80000L)
    val kept = fact.filter(BloomPrune.mightContain(lit(bloom), col("fk")))
      .count()
    val matches = fact.join(dim, col("fk") === col("dk")).count()
    // all true matches survive; FP rate with 100 bits/key is ~0, so the
    // pruned set is far below the full fact
    assert(kept >= matches)
    assert(kept < fact.count() / 2,
      s"bloom kept $kept of ${fact.count()} — not pruning")
  }

  test("scalar-subquery SQL form: bloom built and probed in one plan") {
    BloomPrune.register(spark)
    fact.createOrReplaceTempView("bp_fact")
    dim.createOrReplaceTempView("bp_dim")
    val df = spark.sql("""
      SELECT count(*) AS n FROM bp_fact
      WHERE graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(dk), CAST(1000 AS BIGINT),
                  CAST(80000 AS BIGINT)) FROM bp_dim),
        xxhash64(fk))""")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"probe missing from plan:\n$plan")
    // ~510 true-match rows (50 keys × ~10.03 rows/key), FPs ≈ 0
    val n = df.head().getLong(0)
    assert(n >= 500 && n < 1000, s"unexpected pruned count $n")
  }
}
