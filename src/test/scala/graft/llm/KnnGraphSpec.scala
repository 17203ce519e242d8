package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D202 — bounded kNN graph: the cap bound holds under pathological
  * skew (never all-pairs), clustered data wires within clusters, edges
  * are deterministic and self-free. */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tables: Seq[Seq[Seq[Double]]] =
    Dedup.portablePlanes(10, 8).grouped(5).toSeq // 2 tables, 32 buckets

  test("skew in anger: 2000 IDENTICAL vectors fall in one bucket per " +
    "table, and the candidate count stays at the cap bound — uncapped " +
    "would be ~4M pairs") {
    val same = spark.range(0, 2000).select(col("id"),
      typedLit(Seq.fill(8)(1.0f)).as("v"))
    val cap = 16
    val n = Similarity.knnCandidates(same, "id", "v", tables, cap).count()
    // both tables bucket every vector identically, and the cap keeps
    // the SAME 16 smallest ids in each — the pair sets coincide
    assert(n == cap.toLong * (cap - 1),
      s"expected ${cap * (cap - 1)} capped pairs, got $n (all-pairs " +
        "would be 3,998,000)")
  }

  test("orthogonal clusters wire within themselves; ranks 1..k, no " +
    "self edges, deterministic across partitionings") {
    // 3 orthogonal clusters of 20, slight per-member perturbation on a
    // non-cluster axis so cosines are distinct but cluster-dominant
    val rows = for {
      c <- 0 until 3; i <- 0 until 20
    } yield {
      val v = Array.fill(8)(0.0f)
      v(c) = 1.0f
      v(4 + c) = 0.001f * i
      (c * 20L + i, v.toSeq)
    }
    val df = rows.toDF("id", "v")
    val g = Similarity.knnGraph(df, "id", "v", tables, k = 3,
      bucketCap = 64)
    val edges = g.select("src_id", "dst_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(edges.forall { case (s, d, _) => s != d }, "no self edges")
    assert(edges.forall { case (s, d, _) => s / 20 == d / 20 },
      "orthogonal clusters must only wire within themselves " +
        "(cross-cluster cosine is ~0, within is ~1)")
    assert(edges.groupBy(_._1).values.forall(es =>
      es.map(_._3).sorted == (1 to es.size).toSeq), "dense ranks 1..k")
    val g2 = Similarity.knnGraph(df.repartition(7), "id", "v", tables,
      k = 3, bucketCap = 64)
    assert(g2.collect().toSet == g.collect().toSet,
      "the graph is a function of the data, not the partitioning")
  }

  test("NN-Descent round: recall is monotone (current edges stay in " +
    "candidates), candidates are neighbor-bounded, ranks stay dense") {
    // two clusters whose LSH graph starts with POOR wiring: tiny caps
    // leave nodes under-connected; one refinement round recovers
    // within-cluster edges through neighbors-of-neighbors
    val rows = for { c <- 0 until 2; i <- 0 until 25 } yield {
      val v = Array.fill(8)(0.0f); v(c) = 1.0f
      v(4 + c) = 0.002f * i
      (c * 25L + i, v.toSeq)
    }
    val df = rows.toDF("id", "v")
    val base = Similarity.knnGraph(df, "id", "v", tables, k = 3,
      bucketCap = 4)
    val refined = Similarity.nnDescentRound(base, df, "id", "v", k = 3)
    def pairs(g: org.apache.spark.sql.DataFrame) =
      g.select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    // monotone per-node best cosine: every node's new rank-1 cosine is
    // >= its old one (old edges are candidates)
    val old1 = base.filter(col("rank") === 1)
      .select("src_id", "cosine4").as[(Long, Double)].collect().toMap
    val new1 = refined.filter(col("rank") === 1)
      .select("src_id", "cosine4").as[(Long, Double)].collect().toMap
    assert(old1.forall { case (s, c) => new1.get(s).exists(_ >= c) },
      "rank-1 cosine must never degrade")
    // refinement never invents cross-cluster edges here (cosine ~0
    // loses to within-cluster ~1 on every candidate list)
    assert(pairs(refined).forall { case (s, d) => s / 25 == d / 25 })
    assert(refined.groupBy("src_id").count()
      .filter(col("count") > 3).isEmpty, "k edges per node at most")
  }

  test("NN-Descent convergence: per-round rank-wise cosine monotone, " +
    "an already-converged graph is a one-round no-op fixed point, and " +
    "converge equals the manual round unroll") {
    val rows = for { c <- 0 until 2; i <- 0 until 25 } yield {
      val v = Array.fill(8)(0.0f); v(c) = 1.0f
      v(4 + c) = 0.002f * i
      (c * 25L + i, v.toSeq)
    }
    val df = rows.toDF("id", "v")
    val base = Similarity.knnGraph(df, "id", "v", tables, k = 3,
      bucketCap = 4).localCheckpoint()
    // manual unroll with per-round rank-wise monotonicity (the SOUND
    // invariant — recall vs brute force can regress on cosine4 ties,
    // the r10 advice finding)
    def viol(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Long =
      a.select(col("src_id"), col("rank"), col("cosine4").as("c0"))
        .join(b.select(col("src_id"), col("rank"),
          col("cosine4").as("c1")), Seq("src_id", "rank"))
        .filter(col("c1") < col("c0")).count()
    var cur = base
    for (_ <- 1 to 3) {
      val next = Similarity.nnDescentRound(cur, df, "id", "v", k = 3)
        .localCheckpoint()
      assert(viol(cur, next) == 0L, "each round must be rank-wise monotone")
      cur = next
    }
    val (conv, rounds) = Similarity.nnDescentConverge(base, df, "id",
      "v", k = 3, maxRounds = 3)
    assert(rounds >= 1 && rounds <= 3)
    assert(conv.collect().toSet == cur.collect().toSet,
      "converge must equal the manual 3-round unroll (fixed point " +
        "makes extra rounds no-ops)")
    // feeding the converged graph back in: one confirming round, no edits
    val (again, r2) = Similarity.nnDescentConverge(
      conv.localCheckpoint(), df, "id", "v", k = 3, maxRounds = 3)
    assert(r2 == 1, s"an already-converged graph stops after the one " +
      s"confirming round, got $r2")
    assert(again.collect().toSet == conv.collect().toSet,
      "the fixed point is a no-op")
  }

  test("incremental maintenance equals the full rebuild; a batch in a " +
    "FULL bucket changes nothing (cap admission is by id)") {
    val mk = (id: Long, c: Int) => {
      val v = Array.fill(8)(0.0f); v(c) = 1.0f
      v(4 + (c % 4)) = 0.001f * (id % 17); (id, v.toSeq)
    }
    val corpus = ((0 until 30).map(i => mk(i.toLong, i % 2))).toDF("id", "v")
    val batch = ((30 until 40).map(i => mk(i.toLong, i % 2))).toDF("id", "v")
    val old = Similarity.knnGraph(corpus, "id", "v", tables, k = 3,
      bucketCap = 64)
    val incr = Similarity.knnGraphIncrement(corpus, batch, old, "id",
      "v", tables, k = 3, bucketCap = 64)
    val full = Similarity.knnGraph(corpus.unionByName(batch), "id", "v",
      tables, k = 3, bucketCap = 64)
    assert(incr.collect().toSet == full.collect().toSet,
      "increment must equal the full rebuild")
    // cap-full case: cap 8 < 15 members per cluster bucket — batch ids
    // (largest) are NOT admitted, so the old graph carries unchanged
    val incr8 = Similarity.knnGraphIncrement(corpus, batch,
      Similarity.knnGraph(corpus, "id", "v", tables, k = 3, bucketCap = 8),
      "id", "v", tables, k = 3, bucketCap = 8)
    val full8 = Similarity.knnGraph(corpus.unionByName(batch), "id", "v",
      tables, k = 3, bucketCap = 8)
    assert(incr8.collect().toSet == full8.collect().toSet,
      "full buckets: increment still equals the rebuild")
    // shared-bucketing identity (the sim_knn_graph_incr gate's fixture
    // shortcut): an id-PREFIX sub-corpus's graph equals the union
    // membership filtered to those ids — cap admission by smallest id
    // means growing ids never displace an admitted member. Pin at a
    // SMALL cap so batch members genuinely contend for slots.
    val memb = Similarity.bucketMembership(corpus.unionByName(batch),
      "id", "v", tables, bucketCap = 8)
    val viaShared = Similarity.knnGraphFromMembership(
      memb.filter(col("id") < 30), k = 3)
    val direct = Similarity.knnGraph(corpus, "id", "v", tables, k = 3,
      bucketCap = 8)
    assert(viaShared.collect().toSet == direct.collect().toSet,
      "prefix-filtered union membership must reproduce the corpus graph")
  }
}
