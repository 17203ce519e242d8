package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Executed-plan proofs for the curation operators' scale claims (the
  * D100–D102 scaladocs): the source-cap window really is one source-keyed
  * exchange, the token-budget SELECTION carries no global row window, and
  * boilerplate stripping joins its common-segment set by broadcast. */
class CurationPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def count(p: SparkPlan)(f: PartialFunction[SparkPlan, Int]): Int = {
    val self = f.applyOrElse(p, (_: SparkPlan) => 0)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(count(_)(f)).sum
  }
  private def executed(name: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan
  }

  test("llm_source_caps: one source-keyed exchange + the output sort") {
    val p = executed("llm_source_caps")
    assert(count(p) { case _: ShuffleExchangeExec => 1 } == 2)
  }

  test("llm_token_budget selection has NO global row window — only the " +
    "boundary-group window and the output sort shuffle") {
    val p = executed("llm_token_budget")
    assert(count(p) { case _: ShuffleExchangeExec => 1 } <= 3)
    // single-partition exchanges are allowed only for the bounded
    // score-domain walk, never for the doc rows: no sort-merge join or
    // cartesian anywhere in the selection
    assert(count(p) { case _: SortMergeJoinExec => 1 } == 0)
    assert(count(p) { case _: CartesianProductExec => 1 } == 0)
  }

  test("q_join_guard: offender set broadcasts, no cartesian/SMJ blowup") {
    val p = executed("q_join_guard")
    assert(count(p) { case _: BroadcastExchangeExec => 1 } >= 1)
    assert(count(p) { case _: CartesianProductExec => 1 } == 0)
  }

  test("llm_strip_boilerplate joins the common-segment set by broadcast") {
    val p = executed("llm_strip_boilerplate")
    assert(count(p) { case _: BroadcastExchangeExec => 1 } >= 1)
    assert(count(p) { case _: SortMergeJoinExec => 1 } == 0)
    assert(count(p) { case _: CartesianProductExec => 1 } == 0)
  }
}
