package graft.llm

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Proves ngramJaccardPairs' plan shape: with broadcast disabled (the
  * big-corpus regime), the two gram-side join branches are identical
  * subtrees, so Spark materializes the gram arrays and their shuffle ONCE
  * and the second branch is a ReusedExchange. */
class ExchangeReuseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gram exchange is computed once and reused across both joins") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val pairs = docs.select(col("doc_id").as("id1"))
        .join(docs.select(col("doc_id").as("id2")),
          col("id2") === col("id1") + 1)
      val df = Dedup.ngramJaccardPairs(docs, pairs, "doc_id", "text", n = 3)
      // collect() (not .write) so THIS QueryExecution's adaptive plan is the
      // one that executes — a write spawns its own QueryExecution and the
      // inspected plan would never finalize
      df.collect()
      def reused(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case _: ReusedExchangeExec => 1
          case _ => 0
        }
        // query-stage wrappers hide their subtree from `children`
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case other => other.children
        }
        self + kids.map(reused).sum
      }
      assert(reused(df.queryExecution.executedPlan) >= 1,
        "expected the gram-side exchange to be reused")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
