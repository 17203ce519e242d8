package graft.llm

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Executed-plan shape proofs for the scale claims the operator scaladocs
  * make: the zero-shuffle per-row ops really add no exchange to a scan,
  * the capped inverted index runs window + both aggregations off ONE
  * term-keyed exchange, and BM25 prunes the corpus through a broadcast
  * join (never shuffling the query side). Counting happens on the
  * EXECUTED adaptive plan — claims about plans are worthless if made
  * about the unoptimized logical tree. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def count(p: SparkPlan)(f: PartialFunction[SparkPlan, Int]): Int = {
    val self = f.applyOrElse(p, (_: SparkPlan) => 0)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(count(_)(f)).sum
  }
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan) {
      case _: ShuffleExchangeExec => 1
    }
  }
  private def broadcasts(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan) {
      case _: BroadcastExchangeExec => 1
    }
  }
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("per-row text ops add ZERO exchanges to a scan") {
    assert(shuffles(docs.select(
      TextAnalysis.charEntropy(col("text")).as("e"))) == 0)
    assert(shuffles(TextAnalysis.cdcChunks(docs, "doc_id", "text")) == 0)
  }

  test("jl projection is broadcast-only: zero shuffles") {
    val df = Similarity.jlProject(emb, "vec_id", "embedding",
      dim = 64, outDim = 8)
    assert(shuffles(df) == 0)
    assert(broadcasts(df) == 1) // the sign matrix rides as a plan literal
  }

  test("inverted index reuses ONE term-keyed exchange for window + aggs") {
    // df-count agg, row_number window, and collect_list agg all hash on
    // the term column: one real exchange, the rest reused
    val df = TextAnalysis.invertedIndex(docs, "doc_id", "text", 4)
    assert(shuffles(df) == 2) // distinct + the shared term exchange
  }

  test("bm25 prunes the corpus via broadcast joins — no corpus-keyed " +
    "shuffle join; every post-scan exchange is hit-set- or scalar-sized") {
    val df = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("hash", "join")), k = 5)
    assert(broadcasts(df) >= 3) // vocab prune, dfreq, qterms, stats
    // tf agg (pruned), dfreq (vocab-sized), score agg, rank window,
    // scalar stats agg
    assert(shuffles(df) <= 5)
  }

  test("adaptive join executes its chosen strategy: broadcast hints the " +
    "dim side, capped runs the bounded JoinGuard windows") {
    import graft.operators.AdaptiveJoin
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").as("k"))
    val (bj, bp) = AdaptiveJoin.join(orders, cust, "k")
    assert(bp.strategy == "broadcast")
    assert(broadcasts(bj) == 1) // the hint reached the physical plan
    val (cj, cp) = AdaptiveJoin.join(
      docs.select(col("source"), col("doc_id")),
      docs.select(col("source"), col("doc_id").as("b")), "source",
      capEach = 2, leftTiebreak = Seq(col("doc_id")),
      rightTiebreak = Seq(col("b")),
      broadcastRows = 10, maxProduct = 100)
    assert(cp.strategy == "capped")
    cj.collect()
    // the guard's two rank windows (one per side) are in the executed plan
    val windows = count(cj.queryExecution.executedPlan) {
      case _: org.apache.spark.sql.execution.window.WindowExec => 1
    }
    assert(windows == 2)
  }

  private def windowExecs(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan) {
      case _: org.apache.spark.sql.execution.window.WindowExec => 1
    }
  }
  private def cartesians(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    count(df.queryExecution.executedPlan) {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1
      case _: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => 1
    }
  }

  test("heap top-k is one aggregation exchange — NO window, no full sort") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val df = orders.groupBy("o_orderpriority")
      .agg(graft.functions.TopK.topk(col("o_orderkey"),
        col("o_totalprice"), 3).as("top"))
    assert(windowExecs(df) == 0) // the window-rank form this replaces
    assert(shuffles(df) == 1)    // partial -> final agg only
  }

  test("containment join is equi-join only: no cartesian/nested-loop " +
    "anywhere in the executed plan") {
    val df = Dedup.containmentPairs(docs, "doc_id", "text",
      width = 3, threshold = 0.8)
    assert(cartesians(df) == 0)
  }

  test("co-occurrence projection pairs through the group-keyed equi-join " +
    "— no cartesian") {
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val df = graft.operators.Cooccur.project(li, "l_orderkey", "l_partkey",
      capPerGroup = 8)
    assert(cartesians(df) == 0)
  }

  test("scene cuts: frame hashing adds no exchange; the lag window is " +
    "the single media-keyed shuffle") {
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs),
      frameBytes = 64, stride = 1)
    val df = Multimodal.sceneCuts(Multimodal.framePhash(frames),
      threshold = 36)
    assert(shuffles(df) == 1)
    assert(windowExecs(df) == 1)
  }

  test("ivf-pq query: the ADC scan joins codes against a BROADCAST " +
    "distance table and the refine step point-reads the corpus through a " +
    "broadcast shortlist — the corpus-sized sides never exchange on the " +
    "join keys") {
    val q = emb.filter(col("vec_id") < 4)
    val (cents, cb, codes) = Similarity.ivfPqBuild(emb, "vec_id",
      "embedding", dim = 64, nlist = 8, m = 8, ncodes = 16)
    val df = Similarity.ivfPqQuery(q, cents, cb, codes, emb, "vec_id",
      "embedding", dim = 64, k = 5, nprobe = 2, m = 8, rerank = 4)
    // dtab (ADC) + shortlist (refine) + queries (refine) + the two
    // centroid probes on the build/query sides are all broadcast
    assert(broadcasts(df) >= 3)
    // remaining exchanges are candidate- or query-sized: the ADC groupBy,
    // the two rank windows, and the build's encode groupBy — never a
    // codes- or corpus-keyed join shuffle. Pin the ceiling so a dropped
    // hint (codes or corpus shuffling on the join key) fails this test.
    assert(shuffles(df) <= 6)
  }
}
