package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** D223 — distribution-matched sampling: per-bucket quotas bind,
  * short buckets keep everything, unquota'd buckets contribute nothing,
  * and the two-stage plan equals the exact window under a dominant
  * bucket. */
class MatchedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // bucket 0: 180 rows (dominant), bucket 1: 4 rows, bucket 2: 16 rows
  private def corpus() =
    ((1L to 180L).map(i => (i, 0L)) ++
      (201L to 204L).map(i => (i, 1L)) ++
      (301L to 316L).map(i => (i, 2L))).toDF("id", "b")

  test("quotas bind per bucket; a short bucket keeps everything; an " +
    "unquota'd bucket contributes nothing") {
    val s = Splits.matchedSample(corpus(), "id", col("b"),
      Map(0L -> 10L, 1L -> 10L))
    val sizes = s.groupBy("bucket").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 10L, 1L -> 4L),
      s"bucket 0 caps at 10, bucket 1 keeps all 4, bucket 2 absent " +
        s"(got $sizes)")
    val ranks = s.filter(col("bucket") === 0L)
      .select("rank").as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 10), "ranks dense 1..quota")
  }

  test("the two-stage heap plan equals the exact window form under a " +
    "90%-dominant bucket, and is partitioning-invariant") {
    val df = corpus()
    val expect = df
      .withColumn("h", Dedup.portableWordHash(col("id")))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).flatMap { case (b, g) =>
        val q = Map(0L -> 12L, 1L -> 2L, 2L -> 5L).get(b)
        q.toSeq.flatMap { k =>
          g.sortBy(r => (r._3, r._1)).take(k.toInt).zipWithIndex
            .map { case ((id, bb, _), i) => (id, bb, i + 1) }
        }
      }.toSet
    val got = Splits.matchedSample(df.repartition(7), "id", col("b"),
        Map(0L -> 12L, 1L -> 2L, 2L -> 5L))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expect, "two-stage quota must equal the exact window")
    val again = Splits.matchedSample(df.repartition(13), "id", col("b"),
        Map(0L -> 12L, 1L -> 2L, 2L -> 5L))
      .as[(Long, Long, Int)].collect().toSet
    assert(again == got, "the sample is a function of the data")
  }

  test("a NON-INTEGRAL id column takes the exact-window fallback " +
    "instead of a lossy long cast (which nulls string ids and " +
    "corrupts the hash order silently)") {
    val df = (1L to 40L).map(i => (s"doc_$i", i % 2))
      .toDF("id", "b")
    val got = Splits.matchedSample(df.repartition(5), "id", col("b"),
        Map(0L -> 6L, 1L -> 6L))
      .as[(String, Long, Int)].collect().toSet
    // replay: per bucket, quota smallest by (portable hash of the
    // STRING id, id)
    val expect = df.withColumn("h", Dedup.portableWordHash(col("id")))
      .as[(String, Long, Long)].collect()
      .groupBy(_._2).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (r._3, r._1)).take(6).zipWithIndex
          .map { case ((id, bb, _), i) => (id, bb, i + 1) }
      }.toSet
    assert(got == expect,
      "string ids must sample by their own hash order, never null")
    assert(got.size == 12 && got.forall(_._1.startsWith("doc_")))
  }
}
