package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D213 — cluster-balanced diversity sampling: the quota caps dominant
  * clusters, rare clusters keep everything, ranks are dense in the
  * portable-hash order, and the sample is a function of the data, not
  * the partitioning. */
class ClusterBalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two orthogonal clusters, interleaved ids so Lloyd's first-k-ids
  // init seeds one centroid in each: EVEN ids (30) on axis 0, ODD ids
  // (5) on axis 1
  private def corpus() = {
    val rows =
      (0 until 30).map { i =>
        val v = Array.fill(8)(0.0f); v(0) = 1.0f; v(4) = 0.001f * i
        (i * 2L, v.toSeq)
      } ++ (0 until 5).map { i =>
        val v = Array.fill(8)(0.0f); v(1) = 1.0f; v(5) = 0.001f * i
        (i * 2L + 1, v.toSeq)
      }
    rows.toDF("id", "v")
  }

  test("dominant cluster caps at the quota, the rare cluster keeps all " +
    "its members, ranks are dense") {
    val df = corpus()
    val s = Similarity.clusterBalancedSample(df, "id", "v", k = 2,
      iters = 2, perCluster = 10)
    val byCluster = s.groupBy("cid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(byCluster.values.toSeq.sorted == Seq(5L, 10L),
      s"expected sizes 5 (kept whole) and 10 (capped), got $byCluster")
    // members keep their cluster's geometry: sampled even ids are the
    // axis-0 cluster, odd the axis-1 one
    val rows = s.select("id", "cid").as[(Long, Long)].collect()
    assert(rows.groupBy(_._2).values.forall(g =>
      g.map(_._1 % 2).distinct.size == 1),
      "a sampled cluster must not mix the two orthogonal groups")
    val ranks = s.select("cid", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).values
    assert(ranks.forall(g => g.map(_._2).sorted.toSeq ==
      (1 to g.size).toSeq), "ranks dense 1..n per cluster")
  }

  test("incremental maintenance under pinned centroids equals the " +
    "from-scratch rebuild; a batch landing in ONE cluster leaves the " +
    "other cluster's rows untouched") {
    val df = corpus()
    val cents = Similarity.kmeansCentroids(df, "id", "v", k = 2,
      iters = 2).localCheckpoint()
    val old = Similarity.clusterBalancedFromCentroids(df, "id", "v",
      cents, perCluster = 8).localCheckpoint()
    // batch: 6 new members of the EVEN (axis-0) cluster only
    val batch = (100 until 106).map { i =>
      val v = Array.fill(8)(0.0f); v(0) = 1.0f; v(4) = 0.003f * i
      (i * 2L, v.toSeq)
    }.toDF("id", "v")
    val incr = Similarity.clusterBalancedIncrement(old, batch, "id",
      "v", cents, perCluster = 8)
    val full = Similarity.clusterBalancedFromCentroids(
      df.unionByName(batch), "id", "v", cents, perCluster = 8)
    assert(incr.collect().toSet == full.collect().toSet,
      "increment must equal the rebuild under the same centroids")
    // the odd (axis-1) cluster received nothing: its rows carry over
    val oddOld = old.filter(col("id") % 2 === 1).collect().toSet
    val oddNew = incr.filter(col("id") % 2 === 1).collect().toSet
    assert(oddOld == oddNew, "an unaffected cluster must not re-rank")
  }

  test("the sample is deterministic across partitionings") {
    val df = corpus()
    val a = Similarity.clusterBalancedSample(df, "id", "v", k = 2,
      iters = 2, perCluster = 7).collect().toSet
    val b = Similarity.clusterBalancedSample(df.repartition(13), "id",
      "v", k = 2, iters = 2, perCluster = 7).collect().toSet
    assert(a == b, "the sample is a function of the data")
  }

  test("two-stage quota equals the single-window form under a " +
    "90%-dominant cluster — the heap pre-filter changes the plan, " +
    "never the sample") {
    // 180 even ids on axis 0 (the dominant mode), 20 odd ids on axis 1
    val rows =
      (0 until 180).map { i =>
        val v = Array.fill(8)(0.0f); v(0) = 1.0f; v(4) = 0.0001f * i
        (i * 2L, v.toSeq)
      } ++ (0 until 20).map { i =>
        val v = Array.fill(8)(0.0f); v(1) = 1.0f; v(5) = 0.0001f * i
        (i * 2L + 1, v.toSeq)
      }
    val df = rows.toDF("id", "v").repartition(7)
    val cents = Similarity.kmeansCentroids(df, "id", "v", k = 2,
      iters = 2).localCheckpoint()
    val got = Similarity.clusterBalancedFromCentroids(df, "id", "v",
      cents, perCluster = 12)
      .select("id", "cid", "rank").as[(Long, Long, Int)].collect()
    // the single-window REPLAY, computed independently: assignment by
    // parity (the clusters are orthogonal), rank by the same portable
    // hash order — rank r is the r-th smallest (hash, id) per cluster
    val expect = rows.map(_._1).toDF("id")
      .withColumn("grp", col("id") % 2)
      .withColumn("h", Dedup.portableWordHash(col("id")))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).values.flatMap { g =>
        g.sortBy(r => (r._3, r._1)).take(12).zipWithIndex
          .map { case ((id, grp, _), i) => (id, grp, i + 1) }
      }.toSet
    // cid labels are kmeans-internal; compare per-parity (id, rank) sets
    def keyed(s: Iterable[(Long, Long, Int)]) =
      s.groupBy(_._1 % 2).view
        .mapValues(_.map(r => (r._1, r._3)).toSet).toMap
    assert(keyed(got.toSeq) == keyed(expect),
      "two-stage quota must reproduce the exact window sample")
    assert(got.count(_._1 % 2 == 0) == 12 && got.count(_._1 % 2 == 1) == 12,
      "both clusters cap at the quota here")
  }
}
