package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Funnel semantics on a hand-built event log: greedy first-qualifying
  * anchors, per-step windows enforced relative to the PREVIOUS anchor,
  * monotone step counts, and the single-exchange plan shape. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600L // toy "nanoseconds": seconds are fine for longs

  private def events(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts")

  private def anchorsOf(df: org.apache.spark.sql.DataFrame) =
    Funnel.anchors(df, "user_id", "event_type", "ts", "view",
      Seq(("click", 10 * H), ("purchase", 10 * H)))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("full chain, broken chain, and out-of-window steps") {
    val a = anchorsOf(events(
      // u1 completes all three inside the windows
      (1L, "view", 100 * H), (1L, "click", 105 * H), (1L, "purchase", 112 * H),
      // u2 clicks too late (window is [t1, t1+10h))
      (2L, "view", 100 * H), (2L, "click", 110 * H), (2L, "purchase", 111 * H),
      // u3 purchases BEFORE clicking — ordered funnel must not count it
      (3L, "view", 100 * H), (3L, "purchase", 101 * H), (3L, "click", 102 * H),
      // u4 never views — excluded entirely
      (4L, "click", 100 * H), (4L, "purchase", 101 * H)))
    assert(a(1L) == (Some(100 * H), Some(105 * H), Some(112 * H)))
    assert(a(2L) == (Some(100 * H), None, None))
    // u3: click at 102 anchors step 2; purchase at 101 precedes it
    assert(a(3L) == (Some(100 * H), Some(102 * H), None))
    assert(!a.contains(4L))
  }

  test("greedy anchor: FIRST view anchors the chain, not the best view") {
    // the early view's window misses the click; a later view would catch it
    val a = anchorsOf(events(
      (1L, "view", 0 * H), (1L, "view", 90 * H), (1L, "click", 95 * H)))
    assert(a(1L) == (Some(0L), None, None))
  }

  test("counts are monotone non-increasing across steps") {
    val df = events(
      (1L, "view", 0), (1L, "click", H), (1L, "purchase", 2 * H),
      (2L, "view", 0), (2L, "click", H),
      (3L, "view", 0))
    val got = Funnel.counts(df, "user_id", "event_type", "ts", "view",
      Seq(("click", 10 * H), ("purchase", 10 * H)))
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 2L, 1L)))
  }

  test("plan shuffles the events ONCE (chained windows share the exchange)") {
    val df = events((1L, "view", 0), (1L, "click", H), (1L, "purchase", 2 * H))
    val out = Funnel.counts(df, "user_id", "event_type", "ts", "view",
      Seq(("click", 10 * H), ("purchase", 10 * H)))
    out.collect()
    val root = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        all(q.plan)
      case other => other.children.flatMap(all)
    })
    // one user_id hash exchange feeds the stacked windows AND the per-user
    // rollup (it reuses the partitioning); the only other exchange is the
    // SinglePartition rollup of 3 partial counts (bytes, not data)
    val hashExchanges = all(root).collect { case s: ShuffleExchangeLike => s }
      .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashExchanges.size == 1,
      s"expected one hash exchange, got ${hashExchanges.size}:\n$root")
  }
}
