package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Privacy.kAnonymize / Splits.byGroupHash /
  * Similarity.nearestCentroidClassify boundary behavior. */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kAnonymize keeps groups of exactly k and drops k-1 groups; " +
    "null QI values form their own releasable group") {
    val df = Seq(
      ("a", "x", 1L), ("a", "x", 2L), ("a", "x", 3L), // n=3 = k
      ("b", "y", 4L), ("b", "y", 5L),                 // n=2 < k
      (null, "z", 6L), (null, "z", 7L), (null, "z", 8L) // null QI, n=3
    ).toDF("lang", "src", "id")
    val out = Privacy.kAnonymize(df, Seq("lang", "src"), 3)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 6L, 7L, 8L))
    val rep = Privacy.kAnonymityReport(df, Seq("lang", "src"), 3)
      .select("src", "n", "released").as[(String, Long, Long)]
      .collect().sortBy(_._1)
    assert(rep.toSeq == Seq(("x", 3L, 1L), ("y", 2L, 0L), ("z", 3L, 1L)))
  }

  test("lDiversity: a k-passing HOMOGENEOUS group is suppressed, a " +
    "diverse one releases, NULL sensitive values diversify nothing") {
    val df = Seq(
      ("a", "s1", 1L), ("a", "s2", 2L), ("a", "s1", 3L), // n=3, 2 distinct
      ("b", "s1", 4L), ("b", "s1", 5L), ("b", "s1", 6L), // n=3, HOMOGENEOUS
      ("c", null, 7L), ("c", null, 8L), ("c", "s9", 9L)  // nulls don't count
    ).toDF("qi", "sens", "id")
    val rep = Privacy.lDiversityReport(df, Seq("qi"), "sens", k = 3, l = 2)
      .select("qi", "n", "n_sensitive", "released")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == Seq(("a", 3L, 2L, 1L), ("b", 3L, 1L, 0L),
      ("c", 3L, 1L, 0L)),
      s"k-anonymity passes all three; only 'a' is l-diverse — got " +
        rep.mkString(", "))
    val kept = Privacy.suppressLowDiversity(df, Seq("qi"), "sens", 3, 2)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L))
  }

  test("release semi-joins size-gate: a wide (near-key) QI set takes " +
    "the shuffle fallback, a bounded one broadcasts — results identical") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def usedBroadcast(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect() // finalize AQE
      // descend through AQE wrappers: QueryStageExec hides its plan
      // from the children traversal
      def find(p: SparkPlan): Boolean = p match {
        case _: BroadcastHashJoinExec => true
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: QueryStageExec => find(q.plan)
        case other => other.children.exists(find)
      }
      find(df.queryExecution.executedPlan)
    }
    // near-key QI: every row its own group — the build side is
    // table-sized; force the fallback by shrinking the threshold
    val wide = (0L until 5000L).map(i => (i, s"u$i", i % 3))
      .toDF("id", "qi_key", "sens")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val expected = (0L until 5000L).toSeq
    spark.conf.set(key, "1KB")
    try {
      val q = Privacy.kAnonymize(wide, Seq("qi_key"), 1)
      assert(!usedBroadcast(q), "past the threshold the release must " +
        "degrade to a shuffle semi-join, never a driver-side build")
      assert(q.select("id").as[Long].collect().sorted.toSeq == expected)
    } finally spark.conf.set(key, prev)
    // bounded QI under the default threshold: AQE converts to broadcast
    val q2 = Privacy.kAnonymize(wide.withColumn("qi_key",
      col("id") % 4), Seq("qi_key"), 1)
    assert(usedBroadcast(q2),
      "a bounded group table must still earn the broadcast plan")
    assert(q2.select("id").as[Long].collect().sorted.toSeq == expected)
    // the l-diversity release shares the gate
    val q3 = Privacy.suppressLowDiversity(wide, Seq("qi_key"), "sens",
      k = 1, l = 1)
    assert(q3.count() == 5000L)
  }

  test("kAnonymize rejects empty QI and k < 1") {
    val df = Seq(("a", 1L)).toDF("lang", "id")
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Nil, 3))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("lang"), 0))
  }

  test("byGroupHash: every row assigned, no group spans two splits, " +
    "assignment is partitioning-independent") {
    val docs = (0L until 400L).map(i => (i, s"g${i % 57}"))
      .toDF("id", "grp")
    val s1 = Splits.byGroupHash(docs.repartition(7), col("grp"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s1.filter(col("split").isNull).count() == 0)
    val spans = s1.groupBy("grp")
      .agg(count_distinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(spans == 0, "a group straddled the split boundary")
    val a1 = s1.select("id", "split").as[(Long, String)].collect().toMap
    val a2 = Splits.byGroupHash(docs.repartition(1), col("grp"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a1 == a2, "split assignment depended on partitioning")
    // all three splits actually occur at this group count
    assert(s1.select("split").distinct().count() == 3)
  }

  test("byGroupHash rejects percents not summing to 100") {
    val df = Seq((1L, "g")).toDF("id", "grp")
    intercept[IllegalArgumentException](
      Splits.byGroupHash(df, col("grp"), Seq("train" -> 90, "val" -> 5)))
  }

  test("mineTriplets: hard positive = least-similar same-label, hard " +
    "negative = most-similar different-label; lone-label anchor gets a " +
    "null positive and an inactive flag") {
    def v(x: Float, y: Float) = Array(x, y)
    val df = Seq(
      (1L, v(1f, 0f), 0),      // anchor
      (2L, v(1f, 0.1f), 0),    // near same-label
      (3L, v(0.4f, 1f), 0),    // far same-label → hard positive
      (4L, v(1f, 0.2f), 1),    // near diff-label → hard negative
      (5L, v(0f, 1f), 1),      // far diff-label
      (9L, v(1f, 1f), 7)       // lone label anchor
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.mineTriplets(
        df.filter(col("vec_id").isin(1L, 9L)), df,
        "vec_id", "embedding", "label", margin = 0.2)
      .select("anchor_id", "pos_id", "neg_id", "active")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // anchor 1: pos = 3 (farthest same-label), neg = 4 (closest
    // diff-label), and cos(1,3) - cos(1,4) < 0.2 → active.
    // anchor 9: no same-label peer → pos null, inactive; its hard
    // negative is 3 (cos((1,1),(0.4,1)) ≈ 0.92 beats every other).
    assert(out == Seq((1L, 3L, 4L, 1L), (9L, -1L, 3L, 0L)))
  }

  test("nearestCentroidClassify: orthogonal clusters classify perfectly; " +
    "confusion is diagonal") {
    // axis-aligned clusters with small same-axis jitter: centroids stay
    // on-axis, every member's cosine to its own centroid ≈ 1
    val rows = (for {
      lab <- 0 until 3
      i <- 0 until 5
    } yield {
      val v = Array.fill(6)(0.0f)
      v(lab) = 1.0f + 0.1f * i
      (lab.toLong * 10 + i, v, lab)
    }).toSeq
    val df = rows.toDF("vec_id", "embedding", "label")
    val conf = Similarity
      .nearestCentroidClassify(df, "vec_id", "embedding", "label")
      .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(conf.toSeq == Seq((0, 0, 5L), (1, 1, 5L), (2, 2, 5L)))
  }
}
